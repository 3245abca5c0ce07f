"""Fused Pallas int8 3x3 convolution for the quantized sampling path.

Why a hand kernel: the 'taps' backend (ops/quant.py) decomposes a 3x3 conv
into 9 shifted int8 matmuls, which re-reads the input slab from HBM once per
tap — ~9x the memory traffic of a direct conv. At the flagship's hot shapes
(256^2 x 256ch) that makes taps HBM-bound well below the chip's int8 MXU
rate. This kernel makes the int8 path compute-bound: each (TH+2, W+2, C)
input slab is DMA'd from HBM into VMEM ONCE, and the 9 taps become 9 MXU
int8 dot_generals reading the slab at VMEM bandwidth, accumulating int32,
with the dequant epilogue fused before the bf16 writeback.

Scope: stride-1 SAME 3x3 NHWC convs (the UNet hot op). Other shapes fall
back to the 'taps'/'conv' backends in ops/quant.py. Integer arithmetic is
identical to those backends, so outputs are bit-identical — asserted in
tests/test_quant_pallas.py via interpret mode.

The reference has no analogue (pure torch/cudnn, src/fp16_util.py is its
only precision machinery); this is TPU-native performance work.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv_kernel(x_hbm, w_ref, scale_ref, bias_ref, out_ref, slab, sem,
                 *, th, w_out, cin, tc):
    n = pl.program_id(0)
    ht = pl.program_id(1)

    # one HBM->VMEM copy of the (TH+2, W+2, C) halo slab for this tile
    # (re-copied per output-channel tile; DMA bytes are negligible next to
    # the tile's ~2*9*cin*tc*th*w MXU flops)
    dma = pltpu.make_async_copy(
        x_hbm.at[n, pl.ds(ht * th, th + 2)], slab, sem)
    dma.start()
    dma.wait()

    acc = jnp.zeros((th, w_out, tc), jnp.int32)
    for dy in range(3):
        for dx in range(3):
            window = slab[dy:dy + th, dx:dx + w_out, :]
            acc = acc + jax.lax.dot_general(
                window, w_ref[dy, dx],
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)

    # scale_ref holds ALL batch rows (N, tc): a (1, tc) block would need a
    # sublane-dim block of 1 over an N-row array, which TPU lowering rejects
    # (second-to-minor block dims must be 8-divisible or whole); the full
    # (N, tc) block is tiny and indexed per-sample here instead
    y = acc.astype(jnp.float32) * scale_ref[n][None, None, :]
    y = y + bias_ref[0][None, None, :]
    out_ref[0] = y.astype(out_ref.dtype)


def _padded_width(w):
    """Mosaic HBM->VMEM copy shapes must align to the (8, 128) tiling on
    the two minor dims: the W+2 halo width padded up to a multiple of 8.
    Single source of truth for both the VMEM budget and the kernel's
    scratch/pad shapes."""
    return w + 2 + (-(w + 2) % 8)


def _pick_tiles(h, w, c, cout, itemsize_out=2, budget=12 * 1024 * 1024):
    """The TPU compiler's scoped-vmem stack limit is ~16 MB (measured: the
    untiled 256² kernel was rejected at 18.13M). Jointly pick the row tile
    and an output-channel tile so the per-cell working set — int32
    accumulator, fp32 dequant, double-buffered output block, weights, halo
    slab — stays safely under. Channel tiles must be lane-legal: a
    multiple of 128 or the full cout (Pallas block-shape rule)."""
    wp = _padded_width(w)
    th_cands = [h] if h <= 16 else [t for t in (32, 16, 8) if h % t == 0]
    if not th_cands:
        raise ValueError(
            f"int8_conv3x3_pallas needs H <= 16 or H divisible by 8, got "
            f"H={h} (gate such shapes out with pallas_conv_applicable)")
    tc_cands = [t for t in (cout, 512, 256, 128) if t <= cout
                and cout % t == 0 and (t == cout or t % 128 == 0)]
    for th in th_cands:
        slab = (th + 2) * wp * c
        for tc in tc_cands:
            work = (slab + th * w * tc * 4 * 2    # acc int32 + fp32 dequant
                    + th * w * tc * itemsize_out * 2  # double-buffered out
                    + 9 * c * tc * 2)             # weight block (pipelined)
            if work <= budget:
                return th, tc
    # No tiling fits the scoped-vmem budget: raise instead of returning the
    # smallest candidate, which would pass the gate and then blow the ~16 MB
    # compiler limit at lowering time (ADVICE r2). pallas_conv_applicable
    # catches this so int8_conv routes such shapes to the taps backend.
    raise ValueError(
        f"int8_conv3x3_pallas: no (row, channel) tiling of "
        f"H={h},W={w},C={c},Cout={cout} fits the {budget/2**20:.0f}MB "
        f"scoped-vmem budget")


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def int8_conv3x3_pallas(xq, wq, scale, bias, out_dtype=jnp.bfloat16,
                        interpret=False):
    """xq: (N, H, W, C) int8. wq: (3, 3, C, Cout) int8. scale: (Cout,) or
    (N, Cout) f32 — the fused a_scale * w_scale dequant factor (per-sample
    rows when the activation scale came from a fused-quantize producer).
    bias: (Cout,) f32 (zeros if none). Returns (N, H, W, Cout). Stride 1,
    SAME."""
    n, h, w, c = xq.shape
    cout = wq.shape[-1]
    th, tc = _pick_tiles(h, w, c, cout, jnp.dtype(out_dtype).itemsize)
    th_env = int(os.environ.get("NLC_PALLAS_TH", "0"))  # tuning override
    if th_env and h > 16 and h % th_env == 0:
        th = th_env
    assert h % th == 0, (h, th)

    # extra right columns beyond the +1 halo are zeros; the kernel's
    # windows never read past dx + w
    wp = _padded_width(w)
    xp = jnp.pad(xq, ((0, 0), (1, 1), (1, wp - w - 1), (0, 0)))

    grid = (n, h // th, cout // tc)
    return pl.pallas_call(
        functools.partial(_conv_kernel, th=th, w_out=w, cin=c, tc=tc),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),            # x stays in HBM
            pl.BlockSpec((3, 3, c, tc), lambda i, j, k: (0, 0, 0, k)),
            pl.BlockSpec((n, tc), lambda i, j, k: (0, k)),
            pl.BlockSpec((1, tc), lambda i, j, k: (0, k)),
        ],
        out_specs=pl.BlockSpec((1, th, w, tc),
                               lambda i, j, k: (i, j, 0, k)),
        out_shape=jax.ShapeDtypeStruct((n, h, w, cout), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 2, wp, c), jnp.int8),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, wq, jnp.broadcast_to(scale.reshape(-1, cout), (n, cout)),
      bias.reshape(1, cout))


def pallas_conv_applicable(x_shape, kernel_shape, strides, padding,
                           itemsize_out=2) -> bool:
    """stride-1 SAME 3x3 with a tileable H (the UNet hot-op shape) whose
    working set admits a VMEM-budget tiling (`_pick_tiles` succeeds)."""
    kh, kw = kernel_shape[:2]
    if (kh, kw) != (3, 3) or tuple(strides) != (1, 1):
        return False
    if not (padding == "SAME" or padding == [(1, 1), (1, 1)]
            or padding == ((1, 1), (1, 1))):
        return False
    h, w, c = x_shape[1], x_shape[2], x_shape[3]
    if not (h <= 16 or h % 16 == 0):
        return False
    try:
        _pick_tiles(h, w, c, kernel_shape[-1], itemsize_out)
    except ValueError:
        return False
    return True
