"""Redesign-sigma: append a cyclical log-space sigma residual tail so the
total step count max_T exceeds num_timesteps (reference image_sample.py:788-800).
"""
from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from .samplers import Sampler


def redesign_sigma_tail(sampler: Sampler, max_T: int, num_timesteps: int,
                        min_sigma: float, max_sigma: float, sigma_gamma: float,
                        cycle_size: int) -> Sampler:
    if max_T <= num_timesteps:
        return sampler
    iters = np.arange(max_T - num_timesteps, dtype=np.float64)
    cycle = np.floor(1 + iters / cycle_size)
    x = np.abs(iters / cycle_size - cycle + 1)
    sigma_res = (np.log(min_sigma)
                 + (np.log(max_sigma) - np.log(min_sigma)) * np.maximum(0, 1 - x)
                 * sigma_gamma ** (cycle - 1))
    sigma_res = np.exp(sigma_res)

    base = np.asarray(sampler.sampling_sigmas, np.float64)
    sigmas = np.concatenate([np.clip(base[:-1], min_sigma, None), sigma_res])
    grid = np.arange(sampler.schedule.num_train_timesteps, dtype=np.float64)
    table = np.asarray(sampler.schedule.sigmas, np.float64)
    timesteps = np.interp(sigmas, table, grid)
    timesteps = np.concatenate([timesteps, [-1.0]])
    sigmas = np.concatenate([sigmas, [sampler.schedule.final_sigma]])

    new_grid = dataclasses.replace(
        sampler.grid,
        timesteps=jnp.asarray(timesteps, jnp.float32),
        sampling_sigmas=jnp.asarray(sigmas, jnp.float32),
        continuous_t=True,
    )
    return dataclasses.replace(sampler, grid=new_grid)
