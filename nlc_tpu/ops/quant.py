"""Int8 quantized convolution path for the sampling UNets.

The 5x throughput north-star exceeds the chip's bf16 ceiling at 'pred'-loop
FLOPs (docs/BENCHMARKS.md roofline: ~208 TF/s needed vs ~131 TF/s measured),
so the remaining compute lever is the MXU's higher int8 rate. This module
provides W8A8 convolution:

  * weights: per-output-channel symmetric int8 (absmax / 127), quantized
    from the SAME param tree the bf16 path uses — converted torch
    checkpoints work unchanged; quantization happens inside the jitted
    program and XLA hoists it out of the sampling scan (loop-invariant).
  * activations: dynamic per-tensor symmetric int8, computed per call.
  * accumulation: int32 on the MXU, dequantized into the requested dtype
    with the fused (act_scale * per-channel weight_scale) epilogue.

Backends (select via backend=):
  'conv'    lax.conv_general_dilated on int8 operands -> int32.
  'taps'    KxK conv decomposed into K*K shifted 1x1 convs, each an int8
            (B*H*W, Cin) @ (Cin, Cout) matmul accumulated in int32 — for
            hardware/compiler combos where the int8 MXU rate is only
            reachable through dot, not conv. Caveat: the K*K-term int32
            accumulation chain round-trips the (N,OH,OW,Cout) buffer
            through HBM per tap, which measured HBM-bound on v5e.
  'im2col'  patches concatenated along Cin -> ONE int8
            (B*OH*OW, K*K*Cin) @ (K*K*Cin, Cout) matmul. Materializes the
            patch matrix in HBM (int8, so K*K bytes/elem) but accumulates
            entirely inside the MXU — one output write instead of K*K
            read-modify-writes.
  'pallas'  fused VMEM kernel (quant_pallas.py) for stride-1 SAME 3x3.

All backends run the same integer arithmetic and are bit-identical when the
surrounding float quantize/dequantize steps compile identically (eager, or
interpret mode — asserted in tests). Inside a larger jitted program XLA may
rewrite those float steps differently per fusion context (e.g. x/scale as
x * (1/scale)), flipping round() boundary cases, so whole-model outputs
across backends agree to quantization noise rather than bitwise.

The reference has no quantized path (pure fp16/fp32 torch,
src/fp16_util.py); this is a TPU-native performance extension, opt-in via
model config, validated for quality against the bf16 path (tests +
docs/BENCHMARKS.md trajectory/FID studies).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def quantize_symmetric(x: jnp.ndarray, axis=None,
                       eps: float = 1e-12) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric absmax int8 quantization. Returns (q, scale) with
    x ~= q * scale. `axis`: reduction axes for the absmax (None = per-tensor;
    for HWIO conv kernels use (0,1,2) -> per-output-channel scales)."""
    amax = jnp.max(jnp.abs(x), axis=axis, keepdims=axis is not None)
    scale = jnp.maximum(amax, eps) / 127.0
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _dequant_epilogue(acc_i32, a_scale, w_scale, bias, out_dtype):
    # a_scale: scalar (per-tensor) or (N,1,1,1) (per-sample, from the fused
    # GroupNorm+SiLU+quantize epilogue — ops/groupnorm_pallas.py)
    y = acc_i32.astype(jnp.float32) * (a_scale * w_scale.reshape(1, 1, 1, -1))
    if bias is not None:
        y = y + bias.reshape(1, 1, 1, -1).astype(jnp.float32)
    return y.astype(out_dtype)


def int8_conv(x: jnp.ndarray, kernel: jnp.ndarray, bias: Optional[jnp.ndarray],
              strides: Sequence[int] = (1, 1), padding="SAME",
              backend: str = "taps", out_dtype=jnp.bfloat16,
              prequant: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None
              ) -> jnp.ndarray:
    """W8A8 NHWC convolution with fp kernel input (quantized here so the
    caller's param tree stays identical to the bf16 path).

    prequant=(xq, a_scale): the activation is already int8 (the producer
    fused quantization into its epilogue — ops/groupnorm_pallas.py);
    a_scale is scalar or per-sample (N,). `x` is ignored then.
    """
    wq, w_scale = quantize_symmetric(kernel.astype(jnp.float32), axis=(0, 1, 2))
    if prequant is not None:
        xq, a_scale = prequant
        a_scale = (a_scale.reshape(-1, 1, 1, 1)
                   if getattr(a_scale, "ndim", 0) else a_scale)
    else:
        from ..utils.ablate import ablated
        if ablated("dyn_ascale"):   # perf itemization only (utils/ablate.py):
            # pins the activation scale, removing the per-call absmax reduce —
            # measures the headroom of static (calibrated) activation scales
            a_scale = jnp.float32(0.05)
        else:
            a_scale = jnp.max(jnp.abs(x)).astype(jnp.float32) / 127.0
            a_scale = jnp.maximum(a_scale, 1e-12)
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / a_scale),
                      -127, 127).astype(jnp.int8)
    w_scale = w_scale.reshape(-1)

    if backend == "conv":
        acc = jax.lax.conv_general_dilated(
            xq, wq, tuple(strides), padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        return _dequant_epilogue(acc, a_scale, w_scale, bias, out_dtype)

    if backend == "taps":
        return _taps_conv(xq, wq, a_scale, w_scale, bias, strides, padding,
                          out_dtype)

    if backend == "im2col":
        return _im2col_conv(xq, wq, a_scale, w_scale, bias, strides, padding,
                            out_dtype)

    if backend == "pallas":
        # fused VMEM kernel for the stride-1 SAME 3x3 hot shapes; everything
        # else (stride-2 down convs, 1x1 skips) takes the taps path, as do
        # non-TPU backends (Mosaic kernels only lower on TPU — models
        # configured with quant_backend="pallas" still run on CPU meshes)
        from .quant_pallas import int8_conv3x3_pallas, pallas_conv_applicable
        on_tpu = jax.default_backend() == "tpu"
        if on_tpu and pallas_conv_applicable(xq.shape, wq.shape, strides,
                                             padding,
                                             jnp.dtype(out_dtype).itemsize):
            # (N, Cout) fused dequant scales: per-sample a_scale (from a
            # fused-quantize producer) or a broadcast scalar
            fused = jnp.broadcast_to(
                (a_scale * w_scale).astype(jnp.float32).reshape(-1, wq.shape[-1]),
                (xq.shape[0], wq.shape[-1]))
            b = (bias if bias is not None
                 else jnp.zeros((wq.shape[-1],))).astype(jnp.float32)
            return int8_conv3x3_pallas(xq, wq, fused, b, out_dtype=out_dtype)
        return _taps_conv(xq, wq, a_scale, w_scale, bias, strides, padding,
                          out_dtype)
    raise ValueError(f"unknown int8 conv backend: {backend}")


def _conv_geometry(xq, wq, strides, padding):
    n, h, w, cin = xq.shape
    kh, kw, _, cout = wq.shape
    sy, sx = strides
    if isinstance(padding, str) and padding == "SAME":
        oh = -(-h // sy)
        ow = -(-w // sx)
        pad_h = max((oh - 1) * sy + kh - h, 0)
        pad_w = max((ow - 1) * sx + kw - w, 0)
        pt, pl = pad_h // 2, pad_w // 2
        pb, pr = pad_h - pt, pad_w - pl
    elif isinstance(padding, str):  # VALID
        oh = (h - kh) // sy + 1
        ow = (w - kw) // sx + 1
        pt = pl = pb = pr = 0
    else:  # explicit [(pt, pb), (pl, pr)]
        (pt, pb), (pl, pr) = padding
        oh = (h + pt + pb - kh) // sy + 1
        ow = (w + pl + pr - kw) // sx + 1
    return oh, ow, (pt, pb), (pl, pr)


def _im2col_conv(xq, wq, a_scale, w_scale, bias, strides, padding, out_dtype):
    """KxK conv as ONE int8 matmul: the K*K shifted views are concatenated
    along the channel axis into a (N*OH*OW, K*K*Cin) patch matrix, and the
    kernel is reshaped to (K*K*Cin, Cout). The MXU accumulates all K*K*Cin
    products in int32 internally, so — unlike 'taps' — the int32 output is
    written to HBM exactly once; the cost is materializing the int8 patch
    matrix (K*K bytes per input element)."""
    n, h, w, cin = xq.shape
    kh, kw, _, cout = wq.shape
    sy, sx = strides
    oh, ow, (pt, pb), (pl, pr) = _conv_geometry(xq, wq, strides, padding)
    xp = jnp.pad(xq, ((0, 0), (pt, pb), (pl, pr), (0, 0)))
    cols = []
    for dy in range(kh):
        for dx in range(kw):
            cols.append(jax.lax.slice(
                xp, (0, dy, dx, 0),
                (n, dy + (oh - 1) * sy + 1, dx + (ow - 1) * sx + 1, cin),
                (1, sy, sx, 1)))
    patches = jnp.concatenate(cols, axis=-1).reshape(n * oh * ow, kh * kw * cin)
    acc = jax.lax.dot_general(
        patches, wq.reshape(kh * kw * cin, cout),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).reshape(n, oh, ow, cout)
    return _dequant_epilogue(acc, a_scale, w_scale, bias, out_dtype)


def _taps_conv(xq, wq, a_scale, w_scale, bias, strides, padding, out_dtype):
    """KxK conv as K*K shifted 1x1 convs, each an int8 matmul on the MXU.

    For tap (dy, dx): out[n, y, x, :] += x[n, y*s+dy-py, x*s+dx-px, :] @
    w[dy, dx]. With SAME padding we pad once, then every tap is a strided
    slice followed by a (B*H*W, Cin) @ (Cin, Cout) dot — MXU-shaped, int32
    accumulation, no im2col materialization in HBM (XLA fuses the slices).
    """
    n, h, w, cin = xq.shape
    kh, kw, _, cout = wq.shape
    sy, sx = strides
    oh, ow, (pt, pb), (pl, pr) = _conv_geometry(xq, wq, strides, padding)
    xp = jnp.pad(xq, ((0, 0), (pt, pb), (pl, pr), (0, 0)))

    acc = jnp.zeros((n, oh, ow, cout), jnp.int32)
    for dy in range(kh):
        for dx in range(kw):
            sl = jax.lax.slice(
                xp, (0, dy, dx, 0),
                (n, dy + (oh - 1) * sy + 1, dx + (ow - 1) * sx + 1, cin),
                (1, sy, sx, 1))
            tap = jax.lax.dot_general(
                sl.reshape(n * oh * ow, cin), wq[dy, dx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            acc = acc + tap.reshape(n, oh, ow, cout)
    return _dequant_epilogue(acc, a_scale, w_scale, bias, out_dtype)


def make_conv(quant, features, kernel_size, *, name, dtype,
              strides=(1, 1), padding="SAME", kernel_init=None):
    """nn.Conv or the W8A8 QuantConv drop-in (identical {kernel, bias}
    param layout, so converted torch checkpoints load on either path).
    `quant` is the int8 backend name (module docstring) or None for
    bf16/fp32. The single dispatch point for every model family — keep
    backend-routing changes here, not at call sites."""
    ks = ((kernel_size, kernel_size) if isinstance(kernel_size, int)
          else tuple(kernel_size))
    kw = dict(strides=tuple(strides), padding=padding, dtype=dtype, name=name)
    if kernel_init is not None:
        kw["kernel_init"] = kernel_init
    if quant:
        return QuantConv(features, ks, backend=quant, **kw)
    return nn.Conv(features, ks, **kw)


class QuantConv(nn.Module):
    """Drop-in replacement for nn.Conv (NHWC, HWIO params named kernel/bias —
    converted torch checkpoints load unchanged) running the W8A8 path.

    quant=None falls through to nn.Conv so models can thread one flag.

    backend accepts an optional spatial threshold suffix, e.g. 'conv@64':
    inputs with H below the threshold (and all 1x1 convs) run the plain
    bf16 conv instead. backend='auto' applies the measured per-shape
    policy: XLA int8 conv for >=64^2 stride-1 3x3, the fused Pallas kernel
    for <=32^2 stride-1 3x3, bf16 for 1x1/strided (memory-bound).
    Motivation in docs/BENCHMARKS.md round-2 conv microbenchmarks."""
    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: object = "SAME"
    use_bias: bool = True
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()
    dtype: jnp.dtype = jnp.bfloat16
    backend: str = "taps"

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        cin = (x[0] if isinstance(x, tuple) else x).shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (kh, kw, cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32) if self.use_bias else None
        return routed_conv(x, kernel, bias, self.strides, self.padding,
                           self.backend, self.dtype)


def resolve_backend(backend, h, kh, kw, strides):
    """The W8A8 per-shape routing policy: returns the effective int8
    backend name for this conv shape, or None for the plain bf16 path.
    Shared by routed_conv and the models' fused-quantize decision (a
    producer may only emit int8 when its consumer conv will run int8)."""
    if not backend:
        return None
    min_res = 0
    if "@" in backend:
        backend, min_res = backend.split("@")
        min_res = int(min_res)
    if backend == "auto":
        # measured per-shape policy (docs/BENCHMARKS.md round-2 conv
        # microbenchmarks): XLA's int8 conv wins at >=64^2 3x3 (201 vs
        # 155 TF/s bf16 at the top shape); the fused Pallas kernel wins
        # at <=32^2 3x3 (65/58 vs 57/51); 1x1 and strided convs are
        # memory-bound and stay bf16.
        if (kh, kw) != (3, 3) or tuple(strides) != (1, 1):
            return None
        return "conv" if h >= 64 else "pallas"
    # under a threshold'd backend 1x1 convs always stay bf16: they are
    # memory-bound at every measured shape, so the activation-quantize
    # pass is pure overhead (256^2 512->256: int8 61 vs bf16 100 TF/s)
    if min_res and (h < min_res or (kh, kw) == (1, 1)):
        return None
    return backend


def routed_conv(x, kernel, bias, strides, padding, backend, dtype):
    """The W8A8 backend-routing policy shared by every model family
    (QuantConv and song_unet.EDMConv): resolve 'auto' / '@threshold'
    suffixes per the measured per-shape policy and run either the plain
    conv or the int8 path.

    x may be a prequantized (xq int8, a_scale) pair from a producer that
    fused quantization into its epilogue (groupnorm_pallas); the producer
    must have checked resolve_backend for this shape first."""
    kh, kw = kernel.shape[0], kernel.shape[1]
    pad = padding
    if isinstance(pad, int):
        pad = [(pad, pad), (pad, pad)]
    prequant = None
    if isinstance(x, tuple):
        prequant = x
        x = prequant[0]
    eff = resolve_backend(backend, x.shape[1], kh, kw, strides)
    if eff is None:
        assert prequant is None, (
            "producer emitted int8 for a conv the routing policy runs in "
            "bf16 — keep the fused-quantize decision in sync via "
            "resolve_backend")
        y = jax.lax.conv_general_dilated(
            x.astype(dtype), kernel.astype(dtype),
            tuple(strides), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        if bias is not None:
            y = y + bias.reshape(1, 1, 1, -1).astype(jnp.float32)
        return y.astype(dtype)
    return int8_conv(x, kernel, bias, strides, pad,
                     backend=eff, out_dtype=dtype, prequant=prequant)
