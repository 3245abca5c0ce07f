"""Sampling engines: the NLC denoising loop and the projection loop as
single jitted lax.scan programs.

Behavior parity (reference src/experiments.py + image_sample.py):
  denoise_loop          experiments.py:328-397
  get_denoise_vector    experiments.py:399-460 (fused into the scan body)
  projection_loop       image_sample.py:430-519 (the live, 4-rate variant)
  clip fns              experiments.py:186-207 (none / clamp / dynamic)
  noise init            experiments.py:263-271,322-326

TPU-first redesign vs the reference's per-step Python loop:
  * One lax.scan per sampling run — zero host round-trips; the sigma-head
    correction, sigma->t interp table lookups, UNet forward, clipping,
    constraint projection and the x_{t-1} update all fuse into one XLA
    program per step.
  * Shape-stable carries: sigma_t / sigma_prev always (B,1,1,1); t always
    (B,). The reference's scalar->tensor shape polymorphism becomes static.
  * Per-step style switching (sigma_pred_threshold), refine gating, the
    new_eta final-step swap and the free_const_steps window are precomputed
    host-side into per-step arrays consumed by lax.cond — the expensive
    encode+sigma-head branch only executes on steps that need it.
  * NaN early-break (experiments.py:389) and the projection stop_condition
    (image_sample.py:514) become carry flags that freeze the state; best-x0
    tracking (experiments.py:371-381) is a jnp.where update.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..sched.samplers import Sampler, pred_xprev, pred_xstart, get_eps_logvar, ge_pred_xstart
from ..utils.norms import normalize, vector_norm
from ..utils.rng import per_sample_step_noise


# --------------------------------------------------------------------------
# configuration
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class ModelBundle:
    """The three callables the engine needs (the reference's L5->L3 model
    contract, SURVEY.md §1): eps forward, encoder feature tap, sigma head.
    forward_and_encode (one fused pass) additionally enables the 'pred_fast'
    style."""
    forward: Callable[[Any, jnp.ndarray, jnp.ndarray], jnp.ndarray]
    encode: Callable[[Any, jnp.ndarray, jnp.ndarray], jnp.ndarray]
    sigma: Callable[[Any, jnp.ndarray], jnp.ndarray]
    learn_epsvar: bool = False
    forward_and_encode: Optional[Callable] = None


@dataclass(frozen=True)
class DenoiseConfig:
    # 'base' | 'pred' | 'pred_partial' (reference styles), plus 'pred_fast':
    # a TPU-first extension running ONE fused forward_and_encode per step —
    # eps comes from the same pass that feeds the sigma head, and only the
    # noise-level estimate sigma_hat is corrected (~1.6x fewer UNet FLOPs per
    # step than 'pred'; quality sits between 'base' and 'pred').
    style: str = "base"
    norm_eps: bool = False
    refine_prior_sigma: bool = False
    sigma_pred_threshold: float = 1000.0
    new_eta: Optional[float] = None
    clip_fn: str = "none"             # 'none' | 'clamp' | 'dynamic'
    return_best: bool = True
    free_const_steps: int = -1
    norm_max: float = 1.0             # whole-dataset max ||x||/sqrt(dim)
    norm_min: float = 0.0
    time_shift: float = 0.0
    return_log: bool = False
    # projection-loop extras (image_sample.py:430-519)
    sigma_estimate_rate: Tuple[float, ...] = (1.0, 0.0, 0.0, 0.0)
    recal_sigma_prev: bool = False
    stop_condition: float = 0.0
    max_T: Optional[int] = None
    # Inference eps-eval microbatching (reference experiments.py:436-450:
    # `microbatch = max(len(xt)//chunk_size, 1)` splits ONLY the full eps
    # forward into chunk_size pieces; the encode+sigma-head stays full
    # batch). TPU redesign: a lax.map over statically-shaped chunks inside
    # the jitted step — peak eps-forward activation memory drops ~chunk_size
    # x at the cost of serializing the chunks. Default 1 (off): on TPU the
    # batch-size flag is the natural memory knob and large fused batches are
    # what the MXU wants; the parameter exists for HBM-constrained configs
    # (reference engine default is 2 but every reference CLI passes 1).
    # Deviation: batch must divide by chunk_size (static shapes) — the
    # reference tolerates ragged last chunks; we fall back to one full pass.
    chunk_size: int = 1


def set_norm_maxmin(data_shape: Sequence[int], norm_min: Optional[float],
                    norm_max: Optional[float]) -> Tuple[float, float]:
    """norm_{min,max} flags are whole-vector norms; the engine uses the
    per-sqrt(dim) versions (reference experiments.py:176-184)."""
    dim = int(np.prod(data_shape))
    nmin = 0.0 if norm_min is None else norm_min / math.sqrt(dim)
    nmax = 1.0 if norm_max is None else norm_max / math.sqrt(dim)
    return nmin, nmax


def make_clip_fn(name: str) -> Callable[[jnp.ndarray], jnp.ndarray]:
    if name == "clamp":
        return lambda x: jnp.clip(x, -1.0, 1.0)
    if name == "dynamic":
        def _dynamic(x, ratio=0.99, max_value=100.0):
            b = x.shape[0]
            flat = x.reshape(b, -1)
            s = jnp.quantile(jnp.abs(flat), ratio, axis=1)
            s = jnp.clip(s, 1.0, max_value)[:, None]
            flat = jnp.clip(flat, -s, s) / s
            return flat.reshape(x.shape)
        return _dynamic
    return lambda x: x


def init_noise(sampler: Sampler, seeds: jnp.ndarray, sample_shape: Sequence[int],
               norm_init_noise: bool = False) -> jnp.ndarray:
    """x_T = z_T / sqrt(alpha_bar(sigma_0)) with per-sample-seed z_T."""
    z = per_sample_step_noise(seeds, jnp.asarray(0), tuple(sample_shape), stream=1000003)
    if norm_init_noise:
        z = normalize(z)
    sigma0 = sampler.sampling_sigmas[0]
    return z * jnp.sqrt(sigma0 ** 2 + 1.0)


# --------------------------------------------------------------------------
# shared step pieces
# --------------------------------------------------------------------------

def _bcast(v: jnp.ndarray, batch: int) -> jnp.ndarray:
    """Broadcast a scalar or (B,...)-shaped sigma to (B,1,1,1)."""
    v = jnp.asarray(v, jnp.float32)
    if v.ndim == 0:
        return jnp.full((batch, 1, 1, 1), v)
    return v.reshape(batch, 1, 1, 1)


def _refine_sigma(sampler: Sampler, cfg: DenoiseConfig, xt, sigma_t, sigma_prev, t):
    """Prior sigma clamp to the data-manifold distance band
    (reference experiments.py:401-417)."""
    norm_x = vector_norm(xt, keepdims=True) / math.sqrt(float(np.prod(xt.shape[1:])))
    min_dist = jnp.clip(norm_x - cfg.norm_max, min=0.0)
    max_dist = norm_x + cfg.norm_min
    sigma_t = jnp.clip(sigma_t, min_dist, max_dist)
    t_new = sampler.schedule.get_t_from_sigma(
        sigma_t.reshape(-1), sampler.grid.continuous_t).astype(jnp.float32)
    t_new = jnp.where(t_new.min() > 0, t_new - cfg.time_shift, t_new)
    return sigma_t, sigma_prev, t_new


def _nlc_correct(sampler: Sampler, bundle: ModelBundle, cfg: DenoiseConfig,
                 sigma_vars, params, xt, sigma_t, sigma_prev, t, t_max: float):
    """The noise-level correction: encode -> sigma head -> corrected
    (sigma_t, sigma_prev, t) (reference experiments.py:420-431)."""
    abar = 1.0 / (sigma_t ** 2 + 1.0)
    zt = xt * jnp.sqrt(abar)
    feat = bundle.encode(params, zt, t)
    residual = bundle.sigma(sigma_vars, feat)
    dist_hat = sigma_t * (1.0 + residual)
    dist_prev_hat = dist_hat * (sigma_prev / jnp.where(sigma_t == 0, 1.0, sigma_t))
    t_new = sampler.schedule.get_t_from_sigma(
        dist_hat.reshape(-1), sampler.grid.continuous_t).astype(jnp.float32)
    t_new = jnp.clip(t_new, 0.0, t_max)
    sigma_t = dist_hat
    if cfg.style == "pred":
        sigma_prev = dist_prev_hat
    return sigma_t, sigma_prev, t_new


def _forward_eps(sampler: Sampler, bundle: ModelBundle, cfg: DenoiseConfig,
                 params, xt, sigma_t, t):
    """Full UNet forward at the (possibly corrected) noise level; split the
    learned-variance channels; epsilon normalization; per-step logvar
    (reference experiments.py:436-459)."""
    abar = 1.0 / (sigma_t ** 2 + 1.0)
    zt = xt * jnp.sqrt(abar)
    n_chunks = max(int(getattr(cfg, "chunk_size", 1)), 1)
    b = zt.shape[0]
    if n_chunks > 1 and b % n_chunks == 0:
        # eps-eval microbatching (see DenoiseConfig.chunk_size): serialize
        # the forward over chunk_size statically-shaped slices via lax.map
        zc = zt.reshape(n_chunks, b // n_chunks, *zt.shape[1:])
        tc = t.reshape(n_chunks, b // n_chunks)
        eps_c = jax.lax.map(lambda a: bundle.forward(params, a[0], a[1]),
                            (zc, tc))
        eps_out = eps_c.reshape(b, *eps_c.shape[2:])
    else:
        eps_out = bundle.forward(params, zt, t)
    if bundle.learn_epsvar:
        c = eps_out.shape[-1] // 2
        eps_mean, learned_logvar = eps_out[..., :c], eps_out[..., c:]
    else:
        eps_mean, learned_logvar = eps_out, None
    if cfg.norm_eps:
        eps_mean = normalize(eps_mean)
    return eps_mean, learned_logvar


# --------------------------------------------------------------------------
# denoise loop (fixed grid)
# --------------------------------------------------------------------------

def denoise_loop(sampler: Sampler, bundle: ModelBundle, cfg: DenoiseConfig,
                 params, sigma_vars, xT: jnp.ndarray, seeds: jnp.ndarray,
                 constrain_fn: Optional[Callable] = None,
                 constrain_loss: Optional[Callable] = None):
    """NLC sampling over the precomputed grid. Returns (final, logs).

    final is best_x0 when cfg.return_best and a constraint loss is given,
    else the last x0 (reference experiments.py:392-395).
    """
    t_grid = np.asarray(sampler.timesteps)
    sig_grid = np.asarray(sampler.sampling_sigmas)
    n_steps = len(t_grid) - 1
    t_max = float(sampler.schedule.num_train_timesteps)

    has_pred = "pred" in cfg.style
    use_pred = np.asarray([(has_pred and tg <= cfg.sigma_pred_threshold)
                           for tg in t_grid[:-1]])
    use_refine = np.asarray([(cfg.refine_prior_sigma and tg <= cfg.sigma_pred_threshold)
                             for tg in t_grid[:-1]])
    eta_arr = np.full(n_steps, sampler.eta, np.float32)
    if cfg.new_eta is not None:
        eta_arr[sampler.num_inference_steps - 1:] = cfg.new_eta
    apply_const = np.asarray([(cfg.free_const_steps <= 0 or i <= cfg.free_const_steps)
                              for i in range(n_steps)]) & (constrain_fn is not None)

    xs = {
        "ind": jnp.arange(n_steps),
        "t": jnp.asarray(t_grid[:-1], jnp.float32),
        "sigma_t": jnp.asarray(sig_grid[:-1], jnp.float32),
        "sigma_prev": jnp.asarray(sig_grid[1:], jnp.float32),
        "use_pred": jnp.asarray(use_pred),
        "use_refine": jnp.asarray(use_refine),
        "eta": jnp.asarray(eta_arr),
        "apply_const": jnp.asarray(apply_const),
    }

    batch = xT.shape[0]
    clip = make_clip_fn(cfg.clip_fn)
    sample_shape = xT.shape[1:]

    def step(carry, x):
        xt, x0_last, best_x0, best_val, dead, ge_state = carry
        sigma_t = _bcast(x["sigma_t"], batch)
        sigma_prev = _bcast(x["sigma_prev"], batch)
        t = jnp.full((batch,), x["t"], jnp.float32)

        sigma_t, sigma_prev, t = jax.lax.cond(
            x["use_refine"],
            lambda args: _refine_sigma(sampler, cfg, *args),
            lambda args: args[1:],
            (xt, sigma_t, sigma_prev, t),
        )
        t = jnp.clip(t, 0.0, t_max)

        if cfg.style == "pred_fast":
            # one fused pass: eps and the sigma-head feature share the UNet
            assert bundle.forward_and_encode is not None, \
                "pred_fast needs bundle.forward_and_encode"
            abar = 1.0 / (sigma_t ** 2 + 1.0)
            out, feat = bundle.forward_and_encode(params, xt * jnp.sqrt(abar), t)
            residual = bundle.sigma(sigma_vars, feat)
            dist_hat = sigma_t * (1.0 + residual)
            sigma_t = jnp.where(x["use_pred"], dist_hat, sigma_t)
            if bundle.learn_epsvar:
                c = out.shape[-1] // 2
                eps, learned_logvar = out[..., :c], out[..., c:]
            else:
                eps, learned_logvar = out, None
            if cfg.norm_eps:
                eps = normalize(eps)
        else:
            sigma_t, sigma_prev, t = jax.lax.cond(
                x["use_pred"],
                lambda args: _nlc_correct(sampler, bundle, cfg, sigma_vars, params,
                                          *args, t_max=t_max),
                lambda args: args[1:],
                (xt, sigma_t, sigma_prev, t),
            )
            eps, learned_logvar = _forward_eps(sampler, bundle, cfg, params, xt,
                                               sigma_t, t)
        logvar = get_eps_logvar(sigma_t, sigma_prev, sampler.sampler_var,
                                sampler.grid.min_var_coef, learned_logvar)

        if sampler.name == "ge":
            x0_hat = ge_pred_xstart(sampler, xt, eps, sigma_t, ge_state)
        else:
            x0_hat = pred_xstart(xt, eps, sigma_t)
        x0_hat = clip(x0_hat)
        if constrain_fn is not None:
            x0 = jnp.where(x["apply_const"], constrain_fn(x0_hat), x0_hat)
        else:
            x0 = x0_hat

        noise = per_sample_step_noise(seeds, x["ind"], sample_shape)
        out = pred_xprev(sampler, x0, eps, sigma_t, sigma_prev, xt, logvar, noise,
                         eta=x["eta"], ge_state=ge_state if sampler.name == "ge" else None)
        if sampler.name == "ge":
            x_next, ge_state = out
        else:
            x_next = out

        if constrain_loss is not None:
            const = jnp.mean(constrain_loss(jnp.clip(x0, -1.0, 1.0)))
            better = (const < best_val) & ~dead
            best_x0 = jnp.where(better, x0, best_x0)
            best_val = jnp.where(better, const, best_val)
        else:
            best_x0 = jnp.where(dead, best_x0, x0)
            const = jnp.asarray(0.0)

        is_nan = jnp.isnan(x_next).any()
        xt_next = jnp.where(dead | is_nan, xt, x_next)
        x0_last = jnp.where(dead, x0_last, x0)
        dead = dead | is_nan

        log = {}
        if cfg.return_log:
            log = {"z": xt_next * jnp.sqrt(1.0 / (sigma_prev ** 2 + 1.0)),
                   "eps": eps, "x0_prec": x0_hat, "x0_postc": x0,
                   "const": const, "sigma": sigma_t[:, 0, 0, 0]}
        return (xt_next, x0_last, best_x0, best_val, dead, ge_state), log

    # eps-momentum state only exists for the GE sampler (saves an image-sized
    # carry buffer for every other sampler)
    ge0 = ({"eps_prev": jnp.zeros_like(xT), "i": jnp.asarray(0)}
           if sampler.name == "ge" else {})
    carry0 = (xT, xT, xT, jnp.asarray(1e4, jnp.float32), jnp.asarray(False), ge0)
    (xt, x0_last, best_x0, best_val, dead, _), logs = jax.lax.scan(step, carry0, xs)

    final = best_x0 if cfg.return_best else x0_last
    return final, logs


# --------------------------------------------------------------------------
# projection loop (sigma estimated on the fly; image_sample.py:430-519)
# --------------------------------------------------------------------------

def projection_loop(sampler: Sampler, bundle: ModelBundle, cfg: DenoiseConfig,
                    params, sigma_vars, xT: jnp.ndarray, seeds: jnp.ndarray,
                    constrain_fn: Optional[Callable] = None,
                    constrain_loss: Optional[Callable] = None):
    """Arbitrary-length sampling where the next sigma is a blend of
    [grid sigma_prev, corrected sigma_prev, norm-ratio decay, manifold
    distance] weighted by cfg.sigma_estimate_rate."""
    sig_grid = np.asarray(sampler.sampling_sigmas, np.float64)
    t_len = len(sig_grid)
    n_inf = len(np.asarray(sampler.timesteps))
    max_T = cfg.max_T if cfg.max_T is not None else t_len - 1
    t_max = float(sampler.schedule.num_train_timesteps)
    batch = xT.shape[0]
    dim = float(np.prod(xT.shape[1:]))
    sample_shape = xT.shape[1:]
    clip = make_clip_fn(cfg.clip_fn)
    rate = cfg.sigma_estimate_rate
    costheta = 0.99

    # per-step grid values, padded past the end with the final entry
    idx = np.minimum(np.arange(max_T) + 1, t_len - 1)
    sig_prev_orig = sig_grid[idx]
    sig_ratio = sig_grid[idx] / np.maximum(sig_grid[np.minimum(np.arange(max_T), t_len - 1)], 1e-20)
    eta_arr = np.full(max_T, sampler.eta, np.float32)
    if cfg.new_eta is not None:
        eta_arr[n_inf - 1:] = cfg.new_eta

    xs = {
        "ind": jnp.arange(max_T),
        "sig_prev_orig": jnp.asarray(sig_prev_orig, jnp.float32),
        "sig_ratio": jnp.asarray(sig_ratio, jnp.float32),
        "eta": jnp.asarray(eta_arr),
    }

    has_pred = "pred" in cfg.style

    def step(carry, x):
        xt, x0_last, sigma_t, t, last_norm, best_x0, best_val, dead = carry
        sigma_prev_orig = _bcast(x["sig_prev_orig"], batch)
        if cfg.recal_sigma_prev:
            sigma_prev = sigma_t * x["sig_ratio"]
        else:
            sigma_prev = sigma_prev_orig

        over = t.max() > cfg.sigma_pred_threshold  # traced: t is carried

        def with_pred(args):
            xt_, st_, sp_, t_ = args
            if cfg.refine_prior_sigma:
                st_, sp_, t_ = _refine_sigma(sampler, cfg, xt_, st_, sp_, t_)
            t_ = jnp.clip(t_, 0.0, t_max)
            if has_pred:
                st_, sp_, t_ = _nlc_correct(sampler, bundle, cfg, sigma_vars, params,
                                            xt_, st_, sp_, t_, t_max=t_max)
            return st_, sp_, t_

        def base_only(args):
            _, st_, sp_, t_ = args
            return st_, sp_, jnp.clip(t_, 0.0, t_max)

        if cfg.style == "pred_fast":
            # fused NLC: the refine clamp stays gated on the threshold, but
            # the sigma correction shares the single UNet pass with eps
            assert bundle.forward_and_encode is not None, \
                "pred_fast needs bundle.forward_and_encode"

            def refine_only(args):
                xt_, st_, sp_, t_ = args
                if cfg.refine_prior_sigma:
                    st_, sp_, t_ = _refine_sigma(sampler, cfg, xt_, st_, sp_, t_)
                return st_, sp_, jnp.clip(t_, 0.0, t_max)

            sigma_t, sigma_prev, t = jax.lax.cond(
                over, base_only, refine_only, (xt, sigma_t, sigma_prev, t))
            abar = 1.0 / (sigma_t ** 2 + 1.0)
            out, feat = bundle.forward_and_encode(params, xt * jnp.sqrt(abar), t)
            residual = bundle.sigma(sigma_vars, feat)
            dist_hat = sigma_t * (1.0 + residual)
            sigma_t = jnp.where(over, sigma_t, dist_hat)
            if bundle.learn_epsvar:
                c = out.shape[-1] // 2
                eps, learned_logvar = out[..., :c], out[..., c:]
            else:
                eps, learned_logvar = out, None
            if cfg.norm_eps:
                eps = normalize(eps)
        else:
            sigma_t, sigma_prev, t = jax.lax.cond(
                over, base_only, with_pred, (xt, sigma_t, sigma_prev, t))
            eps, learned_logvar = _forward_eps(sampler, bundle, cfg, params, xt,
                                               sigma_t, t)
        logvar = get_eps_logvar(sigma_t, sigma_prev, sampler.sampler_var,
                                sampler.grid.min_var_coef, learned_logvar)
        x0_hat = clip(pred_xstart(xt, eps, sigma_t))
        x0 = constrain_fn(x0_hat) if constrain_fn is not None else x0_hat

        noise = per_sample_step_noise(seeds, x["ind"], sample_shape)
        x_next = pred_xprev(sampler, x0, eps, sigma_t, sigma_prev, xt, logvar, noise,
                            eta=x["eta"])

        cur_norm = vector_norm(x_next, keepdims=True) / math.sqrt(dim)
        cur_dist = jnp.sqrt(cur_norm ** 2 + cfg.norm_max ** 2
                            - 2 * cur_norm * cfg.norm_max * costheta + 1e-8)
        norm_ratio = cur_norm / jnp.maximum(last_norm, 1e-20)
        sigma_next = (rate[0] * sigma_prev_orig + rate[1] * sigma_prev
                      + rate[2] * sigma_t * norm_ratio + rate[3] * cur_dist)
        t_next = sampler.schedule.get_t_from_sigma(
            sigma_next.reshape(-1), sampler.grid.continuous_t).astype(jnp.float32)

        if constrain_loss is not None:
            const = jnp.mean(constrain_loss(jnp.clip(x0, -1.0, 1.0)))
            better = (const < best_val) & ~dead
            best_x0 = jnp.where(better, x0, best_x0)
            best_val = jnp.where(better, const, best_val)
            stop = const <= cfg.stop_condition
        else:
            best_x0 = jnp.where(dead, best_x0, x0)
            const = jnp.asarray(0.0)
            stop = jnp.asarray(False)

        is_nan = jnp.isnan(x_next).any()
        frozen = dead | is_nan | stop
        xt_next = jnp.where(dead, xt, x_next)
        log = {}
        if cfg.return_log:
            log = {"z": xt_next * jnp.sqrt(1.0 / (sigma_prev ** 2 + 1.0)),
                   "eps": eps, "x0_prec": x0_hat, "x0_postc": x0,
                   "const": const, "sigma": sigma_next[:, 0, 0, 0]}
        carry_next = (xt_next, jnp.where(dead, x0_last, x0),
                      jnp.where(dead, sigma_t, sigma_next),
                      jnp.where(dead, t, t_next), cur_norm, best_x0, best_val, frozen)
        return carry_next, log

    sigma0 = _bcast(sampler.sampling_sigmas[0], batch)
    t0 = jnp.full((batch,), float(np.asarray(sampler.timesteps)[0]), jnp.float32)
    norm0 = vector_norm(xT, keepdims=True) / math.sqrt(dim)
    carry0 = (xT, xT, sigma0, t0, norm0, xT, jnp.asarray(1e4, jnp.float32),
              jnp.asarray(False))
    (_, x0_last, _, _, _, best_x0, _, _), logs = jax.lax.scan(step, carry0, xs)
    return best_x0, logs


# --------------------------------------------------------------------------
# jit builders
# --------------------------------------------------------------------------

def build_denoise_fn(sampler, bundle, cfg, constrain_fn=None, constrain_loss=None,
                     donate_x: bool = True):
    """Returns jitted (params, sigma_vars, xT, seeds) -> (final, logs)."""
    fn = partial(denoise_loop, sampler, bundle, cfg,
                 constrain_fn=constrain_fn, constrain_loss=constrain_loss)
    return jax.jit(fn, donate_argnums=(2,) if donate_x else ())


def build_projection_fn(sampler, bundle, cfg, constrain_fn=None, constrain_loss=None,
                        donate_x: bool = True):
    fn = partial(projection_loop, sampler, bundle, cfg,
                 constrain_fn=constrain_fn, constrain_loss=constrain_loss)
    return jax.jit(fn, donate_argnums=(2,) if donate_x else ())
