"""Shared Flax building blocks (NHWC, TPU-layout).

These are fresh implementations of the primitives the reference builds from
torch (src/nn_util.py, src/unet_simple.py:27-189, src/unet_adm.py:66-393),
designed for XLA/TPU:

  * NHWC everywhere — XLA's TPU conv layout; converters transpose torch NCHW.
  * GroupNorm runs in fp32 regardless of activation dtype (the reference's
    GroupNorm32, nn_util.py:17-20) and groups contiguous channels like torch.
  * Attention softmax accumulates in fp32 (mirrors the fp32-stable tricks in
    unet_adm.py:361 and edm_networks.py:124-139); the contraction itself uses
    the MXU via einsum with preferred_element_type.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0) -> jnp.ndarray:
    """Sinusoidal embedding, DDPM convention: concat(sin, cos).

    Matches reference unet_simple.get_timestep_embedding (src/unet_simple.py:6-24):
    frequencies exp(-log(1e4) * i / (half-1)).
    """
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) / (half - 1) * jnp.arange(half, dtype=jnp.float32))
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def adm_timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0) -> jnp.ndarray:
    """ADM/guided-diffusion convention: concat(cos, sin), freqs over half
    (src/nn_util.py:103-121)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def swish(x: jnp.ndarray) -> jnp.ndarray:
    from ..utils.ablate import ablated
    if ablated("swish"):   # perf itemization only (utils/ablate.py)
        return x
    return x * jax.nn.sigmoid(x)


class GroupNorm(nn.Module):
    """GroupNorm over NHWC with contiguous channel groups, computed in fp32.

    The optional film_scale/film_shift/act/quant arguments fuse the
    surrounding ResBlock epilogue — FiLM (y*(1+scale)+shift, reference
    unet_adm.py:223), SiLU, and int8 activation quantization — into the
    norm via ops/groupnorm_pallas.py: on TPU the whole chain runs as two
    HBM passes instead of ~5-6 (round-4 itemization measured GroupNorm at
    ~half the flagship NLC step). quant=True returns (xq int8, a_scale);
    the consumer conv takes the pair via ops/quant.routed_conv."""
    num_groups: int = 32
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray, film_scale=None, film_shift=None,
                 act: Optional[str] = None, quant: bool = False):
        orig_dtype = x.dtype
        c = x.shape[-1]
        g = min(self.num_groups, c)
        assert c % g == 0, f"channels {c} not divisible by groups {g}"
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        from ..utils.ablate import ablated
        if ablated("norm"):   # perf itemization only (utils/ablate.py)
            y = x.astype(jnp.float32) * scale + bias
            if film_scale is not None:
                y = y * (1.0 + film_scale[:, None, None, :])
            if film_shift is not None:
                y = y + film_shift[:, None, None, :]
            y = y.astype(orig_dtype)
            return swish(y) if act == "silu" else y
        if (film_scale is not None or film_shift is not None
                or act is not None or quant) and x.ndim == 4:
            from ..ops.groupnorm_pallas import fused_groupnorm_act
            fs = (film_scale.astype(jnp.float32)
                  if film_scale is not None else None)
            fh = (film_shift.astype(jnp.float32)
                  if film_shift is not None else None)
            return fused_groupnorm_act(x, scale, bias, num_groups=g,
                                       eps=self.eps, film_scale=fs,
                                       film_shift=fh, act=act, quant=quant)
        shape = x.shape[:-1] + (g, c // g)
        red_axes = tuple(range(1, x.ndim - 1)) + (x.ndim,)
        # statistics always in fp32; full fp32 math with a cast back:
        # measured FASTER than bf16-math normalization on v5e (XLA fuses
        # the casts into the surrounding convs; bf16 rounding ops cost more
        # than the saved bandwidth)
        xg32 = x.reshape(shape).astype(jnp.float32)
        mean = xg32.mean(axis=red_axes, keepdims=True)
        var = xg32.var(axis=red_axes, keepdims=True)
        xn = (xg32 - mean) * jax.lax.rsqrt(var + self.eps)
        return (xn.reshape(x.shape) * scale + bias).astype(orig_dtype)


class Conv3x3(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32
    zero_init: bool = False

    @nn.compact
    def __call__(self, x):
        init = nn.initializers.zeros_init() if self.zero_init else nn.initializers.lecun_normal()
        return nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                       kernel_init=init, name="conv")(x)


def nearest_upsample_2x(x: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class Upsample(nn.Module):
    """Nearest 2x upsample + optional 3x3 conv (reference unet_simple.py:36-52)."""
    with_conv: bool = True
    dtype: jnp.dtype = jnp.float32
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        x = nearest_upsample_2x(x)
        if self.with_conv:
            from ..ops.quant import make_conv
            x = make_conv(self.quant, x.shape[-1], 3, padding="SAME",
                          dtype=self.dtype, name="conv")(x)
        return x


class Downsample(nn.Module):
    """Stride-2 3x3 conv with the DDIM asymmetric (right/bottom) zero pad
    (reference unet_simple.py:55-74), or 2x2 avg-pool without conv."""
    with_conv: bool = True
    dtype: jnp.dtype = jnp.float32
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        if self.with_conv:
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            from ..ops.quant import make_conv
            x = make_conv(self.quant, x.shape[-1], 3, strides=(2, 2),
                          padding="VALID", dtype=self.dtype, name="conv")(x)
        else:
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        return x


def attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
              scale: Optional[float] = None) -> jnp.ndarray:
    """Multi-head attention core over (B, H, N, D) with fp32 softmax.

    On TPU this dispatches to the Pallas fused kernel (ops.attention): the
    (N, N) softmax weights live only in VMEM instead of round-tripping HBM
    between the two matmuls. Elsewhere (CPU tests) it uses the XLA einsum
    path — both produce identical results (covered by tests).
    """
    from ..utils.ablate import ablated
    if ablated("attn"):   # perf itemization only (utils/ablate.py)
        return v
    from ..ops.attention import fused_attention
    return fused_attention(q, k, v, scale)


class SpatialSelfAttention(nn.Module):
    """Single-head spatial self-attention block with conv projections
    (reference unet_simple.AttnBlock, src/unet_simple.py:137-189).

    norm -> 1x1 q/k/v convs -> softmax((q k)/sqrt(c)) -> 1x1 out conv -> +x.
    """
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        hn = GroupNorm(name="norm")(x)
        q = nn.Conv(c, (1, 1), dtype=self.dtype, name="q")(hn)
        k = nn.Conv(c, (1, 1), dtype=self.dtype, name="k")(hn)
        v = nn.Conv(c, (1, 1), dtype=self.dtype, name="v")(hn)
        q = q.reshape(b, 1, h * w, c)
        k = k.reshape(b, 1, h * w, c)
        v = v.reshape(b, 1, h * w, c)
        o = attention(q, k, v, scale=int(c) ** -0.5).reshape(b, h, w, c)
        o = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(o)
        return x + o
