"""Persist-in-VMEM fusion of the GroupNorm(+FiLM)+SiLU chain with its
consumer 3x3 conv (the round-4 adjudication's one untried layout —
docs/BENCHMARKS.md "The residual norm bucket, adjudicated").

Reference chain (src/unet_adm.py ResBlock in_layers/out_layers:
GroupNorm -> [FiLM] -> SiLU -> conv3x3, stride 1, 'same' zero padding):
under XLA the normalized activation is materialized to HBM between the
fused norm chain and the conv library call. This kernel never materializes
it: per (sample, row-tile) grid step it

  1. DMAs the tile's rows PLUS the 1-row halo from HBM into VMEM,
  2. applies the folded normalize+FiLM+SiLU affine (per-(n,c) a, b from
     the shared stats pass in ops/groupnorm_pallas.py) into a
     width-padded VMEM scratch,
  3. accumulates the 3x3 conv as 9 MXU matmuls over flat offsets of the
     padded scratch — with the scratch width W+2 and the tile flattened
     to ((th+2)*(W+2), C), every conv tap (ky, kx) is ONE contiguous
     row-slice starting at ky*(W+2)+kx, so no per-tap shifts or edge
     fix-ups are needed (the two pad columns produce ~0.8% garbage rows
     that are simply not written out),
  4. adds the conv bias and writes the (th, W, Cout) output block.

HBM traffic per site: read x (stats) + read x (fused) + write out —
versus XLA's read x (stats) + read x + write y + read y + write out.
Forward-only (the sampling loop never differentiates these sites).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .groupnorm_pallas import (_affine_coeffs, _finalize, _silu,
                               _stats_pallas, _stats_reference)


def _norm_conv_kernel(x_hbm, a_ref, b_ref, w_ref, bias_ref, out_ref,
                      xs, zs, sem, *, th, n_tiles, act):
    """Grid (N, H // th). x_hbm: full (N, H, W, C) in ANY/HBM.
    xs: (th+2, W, C) raw-row scratch; zs: (th+2, W, 3C) — the normalized
    tile's three column shifts channel-concatenated (see step 2 below);
    w_ref: (9*C, Cout); out block (1, th, W, Cout)."""
    n = pl.program_id(0)
    j = pl.program_id(1)
    w_pix = xs.shape[1]
    c = xs.shape[2]
    cout = out_ref.shape[3]

    # --- 1. halo DMA: static-shape cases, emitted only when reachable
    # (missing edge rows are the conv's 'same' zero padding)
    if n_tiles == 1:
        xs[0] = jnp.zeros_like(xs[0])
        xs[th + 1] = jnp.zeros_like(xs[0])
        cp = pltpu.make_async_copy(x_hbm.at[n, pl.ds(0, th)],
                                   xs.at[pl.ds(1, th)], sem)
        cp.start()
        cp.wait()
    else:
        @pl.when(j == 0)
        def _first():
            xs[0] = jnp.zeros_like(xs[0])
            cp = pltpu.make_async_copy(x_hbm.at[n, pl.ds(0, th + 1)],
                                       xs.at[pl.ds(1, th + 1)], sem)
            cp.start()
            cp.wait()

        @pl.when(j == n_tiles - 1)
        def _last():
            xs[th + 1] = jnp.zeros_like(xs[0])
            cp = pltpu.make_async_copy(x_hbm.at[n, pl.ds(j * th - 1, th + 1)],
                                       xs.at[pl.ds(0, th + 1)], sem)
            cp.start()
            cp.wait()

        if n_tiles > 2:
            @pl.when(jnp.logical_and(j != 0, j != n_tiles - 1))
            def _interior():
                cp = pltpu.make_async_copy(
                    x_hbm.at[n, pl.ds(j * th - 1, th + 2)],
                    xs.at[pl.ds(0, th + 2)], sem)
                cp.start()
                cp.wait()

    # --- 2. folded normalize+FiLM+SiLU, written as a channel-concat of
    # the three column shifts (kx = -1, 0, +1) so every conv tap below is
    # a SUBLANE-ALIGNED contiguous matmul slice. The v1 layout
    # (width-padded flatten, 9 taps at row offsets ky*(W+2)+kx) measured
    # 69 TF/s at 256^2x256 vs XLA conv's 138 — Mosaic pays a shift before
    # every unaligned-slice matmul (measurements/r5/normconv_probe.jsonl).
    z = xs[...].astype(jnp.float32) * a_ref[n][None, None, :] \
        + b_ref[n][None, None, :]
    if act == "silu":
        z = _silu(z)
    # image-boundary halo rows are 'same' zero padding of the CONV INPUT:
    # they must be zero post-activation (silu(a*0+b) != 0). Masked select
    # (not .at[].set(): scatter has no Mosaic lowering)
    rows = jax.lax.broadcasted_iota(jnp.int32, (th + 2, 1, 1), 0)
    if n_tiles == 1:
        kill = (rows == 0) | (rows == th + 1)
    else:
        kill = ((rows == 0) & (j == 0)) | \
               ((rows == th + 1) & (j == n_tiles - 1))
    z = jnp.where(kill, 0.0, z)
    zb16 = z.astype(zs.dtype)
    zero_col = jnp.zeros((th + 2, 1, c), zs.dtype)
    zs[:, :, 0:c] = jnp.concatenate([zero_col, zb16[:, :w_pix - 1]], axis=1)
    zs[:, :, c:2 * c] = zb16
    zs[:, :, 2 * c:3 * c] = jnp.concatenate([zb16[:, 1:], zero_col], axis=1)

    # --- 3. conv3x3 as 3 aligned matmuls (K = 3C) over the row taps
    zf = zs[...].reshape((th + 2) * w_pix, 3 * c)
    m = th * w_pix
    acc = jnp.zeros((m, cout), jnp.float32)
    for ky in range(3):
        tap = zf[ky * w_pix:ky * w_pix + m, :]
        wk = w_ref[ky * 3 * c:(ky + 1) * 3 * c, :]
        acc = acc + jnp.dot(tap, wk, preferred_element_type=jnp.float32)
    acc = acc + bias_ref[0][None, :]
    out_ref[0] = acc.reshape(th, w_pix, cout).astype(out_ref.dtype)


def _row_tile_conv(h: int, w: int, c: int, cout: int) -> int:
    """Pick th so scratch + accumulator + weights stay well inside VMEM
    (~16 MB; the groupnorm kernel's chip-measured 2 MB block lesson applies
    to the pipelined in/out blocks, scratch is exempt but bounded here)."""
    for th in (16, 8, 4):
        if h % th != 0:
            continue
        zs = (th + 2) * w * 3 * c * 2
        xs = (th + 2) * w * c * 2
        acc = th * w * cout * 4
        wgt = 9 * c * cout * 2
        out2 = 2 * th * w * cout * 2
        if zs + xs + acc + wgt + out2 < 12 * 1024 * 1024:
            return th
    return 0


def fused_norm_conv_applicable(shape, num_groups: int, cout: int) -> bool:
    n, h, w, c = shape
    if c % 128 != 0 or cout % 128 != 0 or c % num_groups != 0:
        return False
    return _row_tile_conv(h, w, c, cout) > 0


def fused_groupnorm_silu_conv(x: jnp.ndarray, gamma: jnp.ndarray,
                              beta: jnp.ndarray, w: jnp.ndarray,
                              bias: Optional[jnp.ndarray], *,
                              num_groups: int = 32, eps: float = 1e-5,
                              film_scale: Optional[jnp.ndarray] = None,
                              film_shift: Optional[jnp.ndarray] = None,
                              act: Optional[str] = "silu",
                              interpret: bool = False) -> jnp.ndarray:
    """y = conv3x3(act(GroupNorm(x) * (1+film_scale) + film_shift)) without
    materializing the normalized tensor to HBM. w: HWIO (3, 3, C, Cout);
    output (N, H, W, Cout) in x.dtype. Forward-only."""
    n, h, wid, c = x.shape
    assert w.shape[:3] == (3, 3, c), w.shape
    cout = w.shape[3]
    g = min(num_groups, c)
    th = _row_tile_conv(h, wid, c, cout)
    assert th > 0, f"no VMEM-feasible row tile for {x.shape} -> {cout}"
    # the fused pallas_call below has no non-TPU lowering; fail loudly
    # rather than routing stats through the CPU oracle and then crashing
    assert interpret or jax.default_backend() == "tpu", \
        "fused_groupnorm_silu_conv runs on TPU only (pass interpret=True " \
        "elsewhere); use reference_groupnorm_silu_conv for the XLA path"

    if interpret or jax.default_backend() == "tpu":
        s, m2, _, _ = _stats_pallas(x, interpret=interpret)
    else:
        s, m2, _, _ = _stats_reference(x, g)
    mean, rstd = _finalize(s, m2, g, h * wid * (c // g), eps)
    a, b = _affine_coeffs(mean, rstd, gamma, beta, film_scale, film_shift, c)

    w_flat = w.reshape(9 * c, cout).astype(jnp.bfloat16)
    bias2 = (bias if bias is not None
             else jnp.zeros((cout,), jnp.float32)).reshape(1, cout)
    bias2 = bias2.astype(jnp.float32)

    kernel = functools.partial(_norm_conv_kernel, th=th, n_tiles=h // th,
                               act=act)
    return pl.pallas_call(
        kernel,
        grid=(n, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((n, c), lambda i, j: (0, 0)),
            pl.BlockSpec((n, c), lambda i, j: (0, 0)),
            pl.BlockSpec((9 * c, cout), lambda i, j: (0, 0)),
            pl.BlockSpec((1, cout), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, th, wid, cout), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h, wid, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 2, wid, c), jnp.bfloat16),
            pltpu.VMEM((th + 2, wid, 3 * c), jnp.bfloat16),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(x.astype(jnp.bfloat16), a, b, w_flat, bias2)


def reference_groupnorm_silu_conv(x, gamma, beta, w, bias, *, num_groups=32,
                                  eps=1e-5, film_scale=None, film_shift=None,
                                  act="silu"):
    """XLA oracle with identical math (fp32 norm island, bf16 conv)."""
    n, h, wid, c = x.shape
    g = min(num_groups, c)
    xf = x.astype(jnp.float32)
    s, m2, _, _ = _stats_reference(x, g)
    mean, rstd = _finalize(s, m2, g, h * wid * (c // g), eps)
    a, b = _affine_coeffs(mean, rstd, gamma, beta, film_scale, film_shift, c)
    z = xf * a[:, None, None, :] + b[:, None, None, :]
    if act == "silu":
        z = _silu(z)
    y = jax.lax.conv_general_dilated(
        z.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    if bias is not None:
        y = y + bias[None, None, None, :]
    return y.astype(x.dtype)
