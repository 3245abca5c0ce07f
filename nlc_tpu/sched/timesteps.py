"""Sampling-time timestep / sigma grid construction (host-side numpy).

Parity targets:
  - space_timesteps: guided-diffusion respacing incl. "ddimN"
    (/root/reference/src/schedulers.py:38-91)
  - replace_duplicate_t: dedup pass making the descending t grid strictly
    decreasing (/root/reference/src/schedulers.py:15-31)
  - Scheduler.set_timesteps_sigma styles DDIM / EDM(rho=7) / Linear / Scaled
    (/root/reference/src/schedulers.py:227-284)

Grids are built once on host; the jitted sampler scans over the resulting
fixed-length arrays — no per-step host work.
"""
from __future__ import annotations


import numpy as np
import jax.numpy as jnp
from flax import struct

from .schedules import NoiseSchedule


def space_timesteps(num_timesteps: int, section_counts) -> set:
    """Respacing of [0, num_timesteps) into per-section strided subsets."""
    if isinstance(section_counts, str):
        if section_counts.startswith("ddim"):
            desired_count = int(section_counts[len("ddim"):])
            for stride in range(1, num_timesteps):
                if len(range(0, num_timesteps, stride)) == desired_count:
                    return set(range(0, num_timesteps, stride))
            raise ValueError(f"cannot create exactly {desired_count} steps with an integer stride")
        section_counts = [int(x) for x in section_counts.split(",")]
    size_per = num_timesteps // len(section_counts)
    extra = num_timesteps % len(section_counts)
    start_idx = 0
    all_steps = []
    for i, section_count in enumerate(section_counts):
        size = size_per + (1 if i < extra else 0)
        if size < section_count:
            raise ValueError(f"cannot divide section of {size} steps into {section_count}")
        frac_stride = 1 if section_count <= 1 else (size - 1) / (section_count - 1)
        cur = 0.0
        for _ in range(section_count):
            all_steps.append(start_idx + round(cur))
            cur += frac_stride
        start_idx += size
    return set(all_steps)


def replace_duplicate_t(ts: np.ndarray, max_step: int = 999) -> np.ndarray:
    """Make a descending integer t-grid strictly decreasing.

    First pass (right-to-left) bumps duplicates up; second pass (left-to-right)
    caps values at the running upper bound so nothing exceeds max_step.
    """
    ts = np.asarray(ts).astype(np.int64)
    new_ts = np.zeros_like(ts)
    new_ts[-2:] = ts[-2:]
    for i in range(len(ts) - 1, 0, -1):
        if ts[i - 1] > new_ts[i]:
            new_ts[i - 1] = ts[i - 1]
        else:
            new_ts[i - 1] = new_ts[i] + 1
    new_ts2 = np.zeros_like(new_ts)
    cur_big = max_step
    for i in range(len(new_ts) - 1):
        new_ts2[i] = min(new_ts[i], cur_big)
        cur_big = new_ts2[i] - 1
    return new_ts2


@struct.dataclass
class SamplingGrid:
    """The fixed sampling trajectory: N steps from grid index i to i+1.

    timesteps:        (N+1,) float32 — trailing entry is -1 (clean endpoint)
    sampling_sigmas:  (N+1,) float32 — trailing entry is final_sigma = 0
    min_var_coef:     scalar — posterior-variance floor used by get_eps_logvar
                      (reference schedulers.py:279-284)
    """
    timesteps: jnp.ndarray
    sampling_sigmas: jnp.ndarray
    min_var_coef: jnp.ndarray
    num_inference_steps: int = struct.field(pytree_node=False)
    continuous_t: bool = struct.field(pytree_node=False, default=False)


def _np_sigma(schedule: NoiseSchedule, t: np.ndarray) -> np.ndarray:
    sigmas = np.asarray(schedule.sigmas)
    t = np.asarray(t)
    sig = sigmas[np.clip(t, 0, schedule.num_train_timesteps - 1).astype(np.int64)]
    return np.where(t >= 0, sig, schedule.final_sigma)


def _np_t_from_sigma(schedule: NoiseSchedule, sigma: np.ndarray, continuous_t: bool) -> np.ndarray:
    sigmas = np.asarray(schedule.sigmas)
    sigma = np.asarray(sigma)
    if continuous_t:
        grid = np.arange(schedule.num_train_timesteps, dtype=np.float64)
        return np.interp(sigma, sigmas, grid)
    return np.searchsorted(sigmas, sigma, side="left")


def build_sampling_grid(schedule: NoiseSchedule, start: float, end: float,
                        num_inference_steps: int, style: str = "DDIM",
                        scale: float = 1.0, continuous_t: bool = False,
                        set_alpha_to_one: bool = True) -> SamplingGrid:
    """Host-side construction of the (timesteps, sigmas) trajectory.

    `start` is the largest sigma (x_T noise level), `end` the smallest before
    the appended clean endpoint.
    """
    n_req = num_inference_steps
    n = num_inference_steps if set_alpha_to_one else num_inference_steps + 1

    if style == "DDIM":
        start_t = int(_np_t_from_sigma(schedule, start, False))
        end_t = int(_np_t_from_sigma(schedule, end, False))
        ts = space_timesteps(num_timesteps=start_t + 1 - end_t, section_counts=str(n))
        ts = end_t + np.array(sorted(ts, reverse=True))
        timesteps = ts.astype(np.float64)
        sigmas = _np_sigma(schedule, ts)
    elif style == "EDM":
        rho = 7.0
        i = np.arange(n, dtype=np.float64)
        sigmas = (start ** (1 / rho) + i / (n - 1) * (end ** (1 / rho) - start ** (1 / rho))) ** rho
        timesteps = _np_t_from_sigma(schedule, sigmas, continuous_t)
    elif style == "Linear":
        sigmas = np.exp(np.linspace(np.log(start), np.log(end), n))
        timesteps = _np_t_from_sigma(schedule, sigmas, continuous_t)
    elif style == "Scaled":
        diff = np.log(end) - np.log(start)
        a_t = scale ** np.arange(n - 1, dtype=np.float64)
        a_cum = np.cumsum(a_t)
        sigma_logs = np.log(start) + (diff / a_cum[-1]) * a_cum
        sigma_logs = np.insert(sigma_logs, 0, np.log(start))
        sigmas = np.exp(sigma_logs)
        timesteps = _np_t_from_sigma(schedule, sigmas, continuous_t)
    else:
        raise ValueError(f"invalid sigma style {style!r}")

    if not continuous_t:
        timesteps = replace_duplicate_t(np.asarray(timesteps),
                                        max_step=schedule.num_train_timesteps - 1)
        sampling_sigmas = _np_sigma(schedule, timesteps)
    else:
        sampling_sigmas = np.asarray(sigmas, dtype=np.float64)

    timesteps = np.asarray(timesteps, dtype=np.float64)
    if set_alpha_to_one:
        timesteps = np.concatenate([timesteps, [-1.0]])
        sampling_sigmas = np.concatenate([sampling_sigmas, [schedule.final_sigma]])

    # Posterior-variance floor from the last real transition (reference :279-284).
    # Degenerate 1-step grids only have 2 entries; fall back to that single pair.
    if len(sampling_sigmas) >= 3:
        sig_t, sig_prev = sampling_sigmas[-3], sampling_sigmas[-2]
    else:
        sig_t, sig_prev = sampling_sigmas[0], sampling_sigmas[1]
    beta_t = (sig_t ** 2 - sig_prev ** 2) / (sig_t ** 2 + 1)
    alpha_t = 1 / (sig_t ** 2 + 1)
    alpha_prev = 1 / (sig_prev ** 2 + 1)
    min_var_coef = beta_t * (1 - alpha_prev) / (1 - alpha_t)

    return SamplingGrid(
        timesteps=jnp.asarray(timesteps, jnp.float32),
        sampling_sigmas=jnp.asarray(sampling_sigmas, jnp.float32),
        min_var_coef=jnp.asarray(min_var_coef, jnp.float32),
        num_inference_steps=n_req,
        continuous_t=continuous_t,
    )
