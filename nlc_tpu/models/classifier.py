"""EncoderUNetModel — the ADM classifier (noisy-image classifier used for
classifier guidance).

Parity with reference src/unet_adm.py:816-1027 (EncoderUNetModel) and
AttentionPool2d (:22-51): the ADM UNet encoder half + one of four pooling
heads (adaptive avg-pool, CLIP-style attention pool with a learned mean token
and positional embedding, spatial MLP over per-stage mean features, and
spatial_v2 with a normalization bottleneck). Built by create_classifier
(src/script_util.py:273-311) — mirrored in models.factory.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .adm_unet import ADMResBlock, ADMAttention, ADMDownsample
from .layers import GroupNorm, adm_timestep_embedding, attention, swish


class AttentionPool2d(nn.Module):
    num_head_channels: int
    output_dim: int

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        t = h * w
        flat = x.reshape(b, t, c)
        flat = jnp.concatenate([flat.mean(axis=1, keepdims=True), flat], axis=1)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(c ** -0.5), (t + 1, c))
        flat = flat + pos[None]
        qkv = nn.Dense(3 * c, name="qkv_proj")(flat)      # new-order layout
        heads = c // self.num_head_channels
        q, k, v = jnp.split(qkv, 3, axis=-1)
        ch = c // heads
        q = q.reshape(b, t + 1, heads, ch).transpose(0, 2, 1, 3)
        k = k.reshape(b, t + 1, heads, ch).transpose(0, 2, 1, 3)
        v = v.reshape(b, t + 1, heads, ch).transpose(0, 2, 1, 3)
        o = attention(q, k, v, scale=float(ch) ** -0.5)
        o = o.transpose(0, 2, 1, 3).reshape(b, t + 1, c)
        o = nn.Dense(self.output_dim, name="c_proj")(o)
        return o[:, 0]


@dataclass(frozen=True)
class EncoderUNetConfig:
    image_size: int = 64
    in_channels: int = 3
    model_channels: int = 128
    out_channels: int = 1000
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = (2, 4, 8)
    dropout: float = 0.0
    channel_mult: Tuple[float, ...] = (1, 2, 3, 4)
    num_head_channels: int = 64
    use_scale_shift_norm: bool = True
    resblock_updown: bool = True
    pool: str = "attention"       # adaptive | attention | spatial | spatial_v2


class EncoderUNetModel(nn.Module):
    config: EncoderUNetConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t, deterministic: bool = True):
        cfg = self.config
        emb = adm_timestep_embedding(t, cfg.model_channels)
        emb = nn.Dense(cfg.model_channels * 4, dtype=self.dtype,
                       name="time_embed_0")(emb)
        emb = nn.Dense(cfg.model_channels * 4, dtype=self.dtype,
                       name="time_embed_2")(swish(emb))
        emb = emb.astype(self.dtype)

        def res(name, **kw):
            return ADMResBlock(dropout=cfg.dropout,
                               use_scale_shift_norm=cfg.use_scale_shift_norm,
                               dtype=self.dtype, name=name, **kw)

        h = nn.Conv(int(cfg.channel_mult[0] * cfg.model_channels), (3, 3),
                    padding=1, dtype=self.dtype, name="input_conv")(
            x.astype(self.dtype))
        results = []

        def pool_feat(hh):
            if cfg.pool.startswith("spatial"):
                results.append(hh.mean(axis=(1, 2)))

        pool_feat(h)
        ds = 1
        ch = int(cfg.channel_mult[0] * cfg.model_channels)
        bi = 0
        for level, mult in enumerate(cfg.channel_mult):
            for _ in range(cfg.num_res_blocks):
                ch = int(mult * cfg.model_channels)
                h = res(f"block_{bi}", out_channels=ch)(h, emb, deterministic)
                if ds in cfg.attention_resolutions:
                    h = ADMAttention(num_head_channels=cfg.num_head_channels,
                                     dtype=self.dtype, name=f"attn_{bi}")(h)
                pool_feat(h)
                bi += 1
            if level != len(cfg.channel_mult) - 1:
                if cfg.resblock_updown:
                    h = res(f"down_{level}", out_channels=ch, down=True)(
                        h, emb, deterministic)
                else:
                    h = ADMDownsample(dtype=self.dtype, name=f"down_{level}")(h)
                pool_feat(h)
                ds *= 2
        h = res("middle_0")(h, emb, deterministic)
        h = ADMAttention(num_head_channels=cfg.num_head_channels,
                         dtype=self.dtype, name="middle_1")(h)
        h = res("middle_2")(h, emb, deterministic)
        pool_feat(h)

        if cfg.pool == "adaptive":
            h = swish(GroupNorm(eps=1e-5, name="out_norm")(h))
            h = h.mean(axis=(1, 2), keepdims=True)
            h = nn.Conv(cfg.out_channels, (1, 1), dtype=self.dtype,
                        kernel_init=nn.initializers.zeros_init(),
                        name="out_conv")(h)
            return h.reshape(h.shape[0], -1)
        if cfg.pool == "attention":
            h = swish(GroupNorm(eps=1e-5, name="out_norm")(h))
            return AttentionPool2d(cfg.num_head_channels, cfg.out_channels,
                                   name="out_pool")(h)
        feats = jnp.concatenate(results, axis=-1)
        h = nn.Dense(2048, name="out_fc1")(feats)
        if cfg.pool == "spatial_v2":
            # GroupNorm over a flat feature vector
            h = GroupNorm(eps=1e-5, name="out_norm")(h[:, None, None, :])[:, 0, 0]
            h = swish(h)
        else:
            h = nn.relu(h)
        return nn.Dense(cfg.out_channels, name="out_fc2")(h)


def classifier_grad_fn(model: EncoderUNetModel, variables, scale: float = 1.0):
    """Classifier-guidance gradient: d log p(y|x,t) / dx (the standard use of
    the ADM classifier)."""
    def grad_fn(x, t, y):
        def logp(xx):
            logits = model.apply(variables, xx, t)
            logprobs = jax.nn.log_softmax(logits, axis=-1)
            return logprobs[jnp.arange(xx.shape[0]), y].sum()
        return jax.grad(logp)(x) * scale

    return grad_fn
