"""DDNM / DDNM+ projection samplers with RePaint-style time travel.

Parity with reference functions/svd_ddnm.py: ddnm_diffusion (:19-78,
x0 range-space projection each step), ddnm_plus_diffusion (:80-164, the
noise-aware Lambda / Lambda_noise projection, DDNM Eq.17/51) and
get_schedule_jump (:167-190). The reference keeps this module unreferenced by
its entry points (the live path is the Constraint_Function projection); it is
provided here for full capability parity.

TPU-first: the time-travel schedule precomputes into per-step (t, t_next,
is_travel) arrays consumed by one lax.scan; the model call is gated by
lax.cond so time-travel steps skip the UNet entirely.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..operators.svd import SVDOperator
from ..operators.constraints import flatten_chw, unflatten_chw
from ..sched.schedules import NoiseSchedule
from ..utils.rng import per_sample_step_noise


def get_schedule_jump(t_T: int, jump_length: int, jump_n_sample: int):
    """RePaint time-travel schedule (reference :167-190)."""
    jumps = {}
    for j in range(0, t_T - jump_length, jump_length):
        jumps[j] = jump_n_sample - 1
    t = t_T
    ts = []
    while t >= 1:
        t -= 1
        ts.append(t)
        if jumps.get(t, 0) > 0:
            jumps[t] -= 1
            for _ in range(jump_length):
                t += 1
                ts.append(t)
    ts.append(-1)
    return ts


@dataclass(frozen=True)
class DDNMConfig:
    T_sampling: int = 100
    travel_length: int = 1
    travel_repeat: int = 1
    eta: float = 0.85
    sigma_y: float = 0.0           # >0 switches to DDNM+ noise-aware mode
    plus: bool = False


def ddnm_sampler(schedule: NoiseSchedule, op: SVDOperator, cfg: DDNMConfig,
                 forward: Callable[[Any, jnp.ndarray, jnp.ndarray], jnp.ndarray],
                 params, y: jnp.ndarray, seeds: jnp.ndarray,
                 sample_shape, x_init: Optional[jnp.ndarray] = None):
    """z-space DDNM sampling. y: flat CHW measurement. Returns (x_T=0, x0)."""
    T = schedule.num_train_timesteps
    skip = T // cfg.T_sampling
    times = get_schedule_jump(cfg.T_sampling, cfg.travel_length, cfg.travel_repeat)
    pairs = np.asarray(list(zip(times[:-1], times[1:])), np.int64) * skip
    pairs[:, 1] = np.where(pairs[:, 1] < 0, -1, pairs[:, 1])
    is_travel = pairs[:, 1] >= pairs[:, 0]

    abar = np.concatenate([np.asarray(schedule.alphas_cumprod), [1.0]])

    def at_of(t):
        return jnp.where(t >= 0, jnp.asarray(abar)[jnp.clip(t, 0, T - 1)], 1.0)

    batch = seeds.shape[0]
    h, w, c = sample_shape
    if x_init is None:
        x_init = per_sample_step_noise(seeds, jnp.asarray(0), tuple(sample_shape),
                                       stream=3000017)

    xs = {
        "ind": jnp.arange(len(pairs)),
        "t": jnp.asarray(pairs[:, 0]),
        "t_next": jnp.asarray(pairs[:, 1]),
        "travel": jnp.asarray(is_travel),
    }

    def step(carry, s):
        xt, x0_last = carry
        at = at_of(s["t"]).astype(jnp.float32)
        at_next = at_of(s["t_next"]).astype(jnp.float32)
        noise = per_sample_step_noise(seeds, s["ind"], tuple(sample_shape))

        def normal_step(args):
            xt, x0_last = args
            tb = jnp.full((batch,), s["t"], jnp.float32)
            et = forward(params, xt, tb)
            if et.shape[-1] == 2 * c:
                et = et[..., :c]
            x0_t = (xt - et * jnp.sqrt(1 - at)) / jnp.sqrt(at)

            resid = op.A(flatten_chw(x0_t)) - y.reshape(y.shape[0], -1)
            apy = op.A_pinv(resid)
            if cfg.plus:
                sigma_t = jnp.sqrt(1 - at_next)
                proj = op.Lambda(apy, jnp.sqrt(at_next), cfg.sigma_y, sigma_t,
                                 cfg.eta)
                x0_hat = x0_t - unflatten_chw(proj, h, w, c)
                nz = op.Lambda_noise(flatten_chw(noise), jnp.sqrt(at_next),
                                     cfg.sigma_y, sigma_t, cfg.eta,
                                     flatten_chw(et))
                xt_next = jnp.sqrt(at_next) * x0_hat + unflatten_chw(nz, h, w, c)
            else:
                x0_hat = x0_t - unflatten_chw(apy, h, w, c)
                c1 = jnp.sqrt(1 - at_next) * cfg.eta
                c2 = jnp.sqrt(1 - at_next) * np.sqrt(1 - cfg.eta ** 2)
                xt_next = jnp.sqrt(at_next) * x0_hat + c1 * noise + c2 * et
            return xt_next, x0_t

        def travel_step(args):
            xt, x0_last = args
            xt_next = jnp.sqrt(at_next) * x0_last \
                + noise * jnp.sqrt(1 - at_next)
            return xt_next, x0_last

        xt_next, x0 = jax.lax.cond(s["travel"], travel_step, normal_step,
                                   (xt, x0_last))
        return (xt_next, x0), None

    (x_final, x0_final), _ = jax.lax.scan(step, (x_init, x_init), xs)
    return x_final, x0_final


def build_ddnm_sampler(schedule, op, cfg, forward, sample_shape):
    fn = partial(ddnm_sampler, schedule, op, cfg, forward,
                 sample_shape=sample_shape)
    return jax.jit(lambda params, y, seeds: fn(params, y=y, seeds=seeds))
