"""Fused GroupNorm(+FiLM)+SiLU(+int8 quantize) for the sampling UNets.

Round-4 itemization (benchmarks/stepparts.py) measured GroupNorm statistics
and normalization at ~half the flagship NLC step (205 -> 100 ms/step with
norms ablated): the reference-faithful fp32 GroupNorm islands
(src/nn_util.py:17-20, models/layers.py GroupNorm) cost ~5 full HBM passes
per site under XLA — mean reduce, var reduce (sequential, since
var = E[(x-mean)^2] needs the mean), normalize+swish, then on the int8 path
an activation-absmax reduce and a quantize pass. This module collapses the
chain to 2 reads + 1 write:

  pass 1 (stats):  ONE read of x producing per-channel sum / M2 / min /
                   max, where M2 = sum((x - mean)^2) is kept two-pass
                   WITHIN each VMEM tile (the tile is already resident, so
                   the second sweep is free VPU work) and tiles combine via
                   Chan's parallel-variance update — no E[x^2] - mean^2
                   cancellation anywhere. Group mean/var finalize exactly
                   from the per-channel (sum, M2) on the tiny (N, C) result.
  pass 2 (apply):  ONE read computing y = act(x * a + b) with the whole
                   normalize+affine+FiLM folded into per-(n,c) a, b; when
                   quantizing, y is written as int8 (halving write bytes)
                   using a scale derived EXACTLY from the per-channel
                   ranges — z ranges per channel are affine images of the
                   x ranges, and max|silu| over an interval is attained at
                   an endpoint or at the fixed interior minimum -0.27846 —
                   so no absmax pass over the data is ever needed.

The backward pass is XLA autodiff of the reference formulation via
custom_vjp (sampling never differentiates these; training paths get exact
gradients without Pallas backward kernels).

The reference has no analogue (torch GroupNorm + separate SiLU; no quantized
path). Numerics: statistics accumulate in fp32 with two-pass (mean-centred)
M2 per tile + Chan combine, matching jnp.var's two-pass accuracy — the
naive sumsq/n - mean^2 form drifted the 50-step preset goldens past
tolerance (3% of elements > 0.01) and was replaced.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

SILU_MIN = 0.27846455  # |min silu| attained at z = -1.27846


# ---------------------------------------------------------------------------
# reference (XLA) implementation — CPU path, backward, and test oracle
# ---------------------------------------------------------------------------

def _stats_reference(x: jnp.ndarray, num_groups: int):
    n, h, w, c = x.shape
    xf = x.astype(jnp.float32)
    s = xf.sum(axis=(1, 2))                     # (N, C)
    mu = s / (h * w)
    d = xf - mu[:, None, None, :]
    m2 = (d * d).sum(axis=(1, 2))               # two-pass, like jnp.var
    mn = xf.min(axis=(1, 2))
    mx = xf.max(axis=(1, 2))
    return s, m2, mn, mx


def _finalize(s, m2, num_groups, count, eps):
    """Per-channel (sum, M2) -> per-group mean/rstd (fp32), exactly:
    sum((x-gmean)^2) = sum_c [M2_c + n_c*(mean_c - gmean)^2]."""
    n, c = s.shape
    g = num_groups
    cg = c // g
    count_c = count // cg                       # per-channel count (H*W)
    sg = s.reshape(n, g, cg)
    m2g = m2.reshape(n, g, cg)
    mean_c = sg / count_c
    mean = sg.sum(axis=-1) / count              # (N, G)
    dev = mean_c - mean[..., None]
    m2_tot = m2g.sum(axis=-1) + count_c * (dev * dev).sum(axis=-1)
    var = jnp.maximum(m2_tot / count, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    return mean, rstd                           # (N, G)


def _affine_coeffs(mean, rstd, gamma, beta, film_scale, film_shift, c):
    """Fold normalize + affine + FiLM into per-(n,c) a, b: y = x*a + b."""
    n, g = mean.shape
    cg = c // g
    mean_c = jnp.repeat(mean, cg, axis=1)       # (N, C)
    rstd_c = jnp.repeat(rstd, cg, axis=1)
    # FiLM scales the full affine output (reference unet_adm.py:223:
    # out_norm(h) * (1 + scale) + shift), so beta is scaled too
    fs = (1.0 + film_scale) if film_scale is not None else 1.0
    gamma_eff = gamma[None, :] * fs
    beta_eff = beta[None, :] * fs + (film_shift if film_shift is not None
                                     else 0.0)
    a = gamma_eff * rstd_c
    b = beta_eff - mean_c * a
    return a.astype(jnp.float32), b.astype(jnp.float32)


def _silu_interval_absmax(z_lo, z_hi):
    """Exact max|silu(z)| over [z_lo, z_hi] (elementwise): attained at an
    endpoint or at the interior minimum z=-1.27846 when it's inside."""
    cand = jnp.maximum(jnp.abs(_silu(z_lo)), jnp.abs(_silu(z_hi)))
    interior = (z_lo <= -1.27846) & (z_hi >= -1.27846)
    return jnp.where(interior, jnp.maximum(cand, SILU_MIN), cand)


def _silu(z):
    return z * jax.nn.sigmoid(z)


def _quant_scale_from_ranges(a, b, mn, mx, act: Optional[str]):
    """Per-sample int8 scale from per-channel x ranges: z = a*x + b maps
    [mn, mx] to an interval per (n, c); the activation's absmax over that
    interval is closed-form."""
    z0 = a * mn + b
    z1 = a * mx + b
    z_lo = jnp.minimum(z0, z1)
    z_hi = jnp.maximum(z0, z1)
    if act == "silu":
        am = _silu_interval_absmax(z_lo, z_hi)
    else:
        am = jnp.maximum(jnp.abs(z_lo), jnp.abs(z_hi))
    a_scale = am.max(axis=1) / 127.0            # (N,)
    return jnp.maximum(a_scale, 1e-12)


def _apply_reference(x, a, b, act, qscale):
    z = x.astype(jnp.float32) * a[:, None, None, :] + b[:, None, None, :]
    y = _silu(z) if act == "silu" else z
    if qscale is None:
        return y
    q = jnp.clip(jnp.round(y / qscale.reshape(-1, 1, 1, 1)), -127, 127)
    return q.astype(jnp.int8)


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------

def _stats_kernel(x_ref, sums_ref, rng_ref):
    ht = pl.program_id(1)
    xf = x_ref[0].astype(jnp.float32)           # (th, W, C)
    n_t = float(xf.shape[0] * xf.shape[1])      # static per-channel count
    s = xf.sum(axis=(0, 1))
    mu = s / n_t
    d = xf - mu[None, None, :]                  # tile is in VMEM: the second
    m2 = (d * d).sum(axis=(0, 1))               # sweep costs no HBM traffic
    mn = xf.min(axis=(0, 1))
    mx = xf.max(axis=(0, 1))

    @pl.when(ht == 0)
    def _init():
        sums_ref[0] = jnp.stack([s, m2])        # (2, C)
        rng_ref[0] = jnp.stack([mn, mx])

    @pl.when(ht != 0)
    def _acc():
        # Chan's parallel-variance combine across row tiles
        cur = sums_ref[0]
        n_a = ht.astype(jnp.float32) * n_t
        delta = cur[0] / n_a - mu
        m2_new = cur[1] + m2 + delta * delta * (n_a * n_t / (n_a + n_t))
        sums_ref[0] = jnp.stack([cur[0] + s, m2_new])
        curr = rng_ref[0]
        rng_ref[0] = jnp.stack([jnp.minimum(curr[0], mn),
                                jnp.maximum(curr[1], mx)])


def _apply_kernel(x_ref, a_ref, b_ref, q_ref, out_ref, *, act):
    # a/b/q refs hold ALL batch rows ((N, C) / (N, 1)): per-row (1, C)
    # blocks would need a sublane-dim block of 1 over an N-row array, which
    # TPU lowering rejects (second-to-minor block dims must be 8-divisible
    # or whole); the full blocks are tiny and indexed per-sample here
    i = pl.program_id(0)
    z = x_ref[0].astype(jnp.float32) * a_ref[i][None, None, :] \
        + b_ref[i][None, None, :]
    y = _silu(z) if act == "silu" else z
    if out_ref.dtype == jnp.int8:
        q = jnp.clip(jnp.round(y / q_ref[i, 0]), -127, 127)
        out_ref[0] = q.astype(jnp.int8)
    else:
        out_ref[0] = y.astype(out_ref.dtype)


def _row_tile(h: int, w: int, c: int, budget=2 * 1024 * 1024) -> int:
    """Largest row tile whose (th, W, C) bf16 block stays under the budget.
    The kernel body materializes ~4x the block in fp32 temporaries (cast +
    centred deviations) on top of Pallas's double-buffered in/out blocks:
    chip-measured, 4MB blocks crash the v5e compile (tpu_compile_helper
    exit 1) while <=2MB blocks compile and validate (logs/r4/fusedprobe)."""
    for th in (h, 64, 32, 16, 8):
        if th <= h and h % th == 0 and th * w * c * 2 <= budget:
            return th
    return 0


def pallas_groupnorm_applicable(shape, num_groups: int) -> bool:
    n, h, w, c = shape
    if c % 128 != 0 or c % num_groups != 0:
        return False
    return _row_tile(h, w, c) > 0


def _stats_pallas(x, interpret=False):
    n, h, w, c = x.shape
    th = _row_tile(h, w, c)
    grid = (n, h // th)
    sums, rng = pl.pallas_call(
        _stats_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((1, th, w, c), lambda i, j: (i, j, 0, 0))],
        out_specs=[pl.BlockSpec((1, 2, c), lambda i, j: (i, 0, 0)),
                   pl.BlockSpec((1, 2, c), lambda i, j: (i, 0, 0))],
        out_shape=[jax.ShapeDtypeStruct((n, 2, c), jnp.float32),
                   jax.ShapeDtypeStruct((n, 2, c), jnp.float32)],
        interpret=interpret,
    )(x)
    return sums[:, 0], sums[:, 1], rng[:, 0], rng[:, 1]


def _apply_pallas(x, a, b, qscale, act, out_dtype, interpret=False):
    n, h, w, c = x.shape
    th = _row_tile(h, w, c)
    grid = (n, h // th)
    q = (qscale if qscale is not None
         else jnp.ones((n,), jnp.float32)).reshape(n, 1).astype(jnp.float32)
    return pl.pallas_call(
        functools.partial(_apply_kernel, act=act),
        grid=grid,
        in_specs=[pl.BlockSpec((1, th, w, c), lambda i, j: (i, j, 0, 0)),
                  pl.BlockSpec((n, c), lambda i, j: (0, 0)),
                  pl.BlockSpec((n, c), lambda i, j: (0, 0)),
                  pl.BlockSpec((n, 1), lambda i, j: (0, 0))],
        out_specs=pl.BlockSpec((1, th, w, c), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), out_dtype),
        interpret=interpret,
    )(x, a, b, q)


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------

def _fused_impl(x, gamma, beta, film_scale, film_shift, num_groups, eps,
                act, quant, use_pallas, interpret):
    n, h, w, c = x.shape
    count = h * w * (c // num_groups)
    if use_pallas:
        s, m2, mn, mx = _stats_pallas(x, interpret=interpret)
    else:
        s, m2, mn, mx = _stats_reference(x, num_groups)
    mean, rstd = _finalize(s, m2, num_groups, count, eps)
    a, b = _affine_coeffs(mean, rstd, gamma, beta, film_scale, film_shift, c)
    qscale = _quant_scale_from_ranges(a, b, mn, mx, act) if quant else None
    out_dtype = jnp.int8 if quant else x.dtype
    if use_pallas:
        y = _apply_pallas(x, a, b, qscale, act, out_dtype, interpret=interpret)
    else:
        y = _apply_reference(x, a, b, act, qscale)
        y = y.astype(out_dtype) if not quant else y
    return (y, qscale) if quant else y


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(5, 6, 7, 8, 9, 10))
def _fused_vjp(x, gamma, beta, film_scale, film_shift, num_groups, eps,
               act, quant, use_pallas, interpret):
    return _fused_impl(x, gamma, beta, film_scale, film_shift, num_groups,
                       eps, act, quant, use_pallas, interpret)


def _fused_fwd(x, gamma, beta, film_scale, film_shift, num_groups, eps,
               act, quant, use_pallas, interpret):
    out = _fused_impl(x, gamma, beta, film_scale, film_shift, num_groups,
                      eps, act, quant, use_pallas, interpret)
    return out, (x, gamma, beta, film_scale, film_shift)


def _fused_bwd(num_groups, eps, act, quant, use_pallas, interpret, res, g):
    assert not quant, "the quantized fused norm is inference-only"
    x, gamma, beta, film_scale, film_shift = res

    def ref(x_, gamma_, beta_, fs_, fh_):
        return _fused_impl(x_, gamma_, beta_, fs_, fh_, num_groups, eps,
                           act, False, False, False)

    _, vjp = jax.vjp(ref, x, gamma, beta, film_scale, film_shift)
    return vjp(g)


_fused_vjp.defvjp(_fused_fwd, _fused_bwd)


def fused_groupnorm_act(x: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray,
                        *, num_groups: int = 32, eps: float = 1e-5,
                        film_scale: Optional[jnp.ndarray] = None,
                        film_shift: Optional[jnp.ndarray] = None,
                        act: Optional[str] = "silu", quant: bool = False,
                        interpret: bool = False):
    """GroupNorm (contiguous channel groups, fp32 statistics) + optional
    per-(n,c) FiLM (y_norm * (1+film_scale) + film_shift) + optional SiLU,
    optionally emitting int8 with a per-sample dynamic scale.

    Returns y (x.dtype) — or (y_int8, a_scale (N,) fp32) when quant=True.
    On TPU the compute runs as two Pallas passes (module docstring); other
    backends use the identical-math XLA reference. Gradients (non-quant)
    are XLA autodiff of the reference formulation.
    """
    n, h, w, c = x.shape
    g = min(num_groups, c)
    assert c % g == 0, f"channels {c} not divisible by groups {g}"
    # Chip-measured gating (benchmarks/measurements/r4/stepparts.jsonl):
    # the Pallas pair wins only when it also folds the quantize chain
    # (int8 flagship 205.1 -> 182.7 ms/step); on bf16 XLA already fuses
    # normalize+FiLM+SiLU into the stats epilogue and the kernel's extra
    # min/max work is a net loss (214 -> 219.6 ms/step). NLC_FUSED_NORM
    # =1/0 forces it on/off for experiments.
    import os
    force = os.environ.get("NLC_FUSED_NORM")
    want = (quant or interpret) if force is None else force == "1"
    use_pallas = want and (jax.default_backend() == "tpu" or interpret) and \
        pallas_groupnorm_applicable(x.shape, g)
    return _fused_vjp(x, gamma, beta, film_scale, film_shift, g, eps,
                      act, quant, use_pallas, interpret)
