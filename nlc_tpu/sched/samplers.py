"""Sampler step rules as pure functions + the `get_sampler` factory.

Parity targets (all in /root/reference/src/schedulers.py):
  get_eps_logvar                :367-390  (learned/fixedsmall/fixedlarge)
  pred_xstart                   :407-409  (x0 = x_t - sigma * eps)
  DDIM_Scheduler.pred_xprev     :432-449
  DDIM_simple_Scheduler         :465-473
  DDIM_simple_orig_Scheduler    :487-496  (the default sampler)
  DDIM_simple_drag_Scheduler    :505-514
  DDPM_Scheduler                :548-562
  DDPM_orig_Scheduler           :581-599  (z-space posterior mean)
  DDIM_orig_Scheduler           :609-627
  GE_Scheduler                  :641-673  (2nd-order gradient estimation)
  get_sampler factory           :676-726

TPU-first re-design: the reference's Scheduler subclasses carry mutable state
(self.i, self.state) and draw torch RNG internally. Here every rule is a pure
function of (x0, eps, sigma_t, sigma_prev, xt, logvar, noise, cfg) so the
whole sampling loop jits into one lax.scan. The GE sampler's eps-momentum
state is threaded explicitly through the scan carry.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax.numpy as jnp

from ..utils.norms import normalize
from .schedules import NoiseSchedule, make_noise_schedule
from .timesteps import SamplingGrid, build_sampling_grid

SAMPLER_NAMES = (
    "ddpm", "ddim", "ddim_simple", "ddim_orig", "ddim_simple_orig",
    "ddim_simple_drag", "ddpm_orig", "ge",
)


def pred_xstart(xt: jnp.ndarray, eps: jnp.ndarray, sigma_t: jnp.ndarray) -> jnp.ndarray:
    return xt - sigma_t * eps


def get_eps_logvar(sigma_t: jnp.ndarray, sigma_prev: jnp.ndarray, sampler_var: str,
                   min_var_coef: jnp.ndarray, learned_logvar: Optional[jnp.ndarray] = None
                   ) -> Optional[jnp.ndarray]:
    """Per-step log variance derived purely from (sigma_t, sigma_prev)."""
    beta_t = (sigma_t ** 2 - sigma_prev ** 2) / (sigma_t ** 2 + 1)
    beta_t = jnp.clip(jnp.abs(beta_t), min=1e-20)
    alpha_t = 1.0 / (sigma_t ** 2 + 1)
    alpha_prev = 1.0 / (sigma_prev ** 2 + 1)
    coef = jnp.clip((1 - alpha_prev) / (1 - alpha_t), 0.0, 1.0)
    post_var = beta_t * coef
    max_logvar = jnp.log(beta_t)
    min_logvar = jnp.log(jnp.clip(post_var, min=min_var_coef))
    if sampler_var == "learned" and learned_logvar is not None:
        frac = (learned_logvar + 1.0) / 2.0
        return frac * max_logvar + (1.0 - frac) * min_logvar
    # 'learned' without a variance-predicting model falls back to the
    # posterior (fixedsmall) variance.
    if sampler_var == "fixedlarge":
        return max_logvar
    # 'fixedsmall' and the 'none' fallback (reference returns None for 'none';
    # rules that need a variance then use the small/posterior one).
    return min_logvar


@dataclass(frozen=True)
class Sampler:
    """Static sampler configuration + precomputed tables.

    Pure-config dataclass (not a pytree): pass its arrays (grid/schedule) into
    jitted functions; the strings/floats select code paths at trace time.
    """
    name: str
    schedule: NoiseSchedule
    grid: SamplingGrid
    eta: float = 0.0
    sampler_var: str = "none"
    ge_gamma: float = 2.0
    norm_eps: bool = False

    @property
    def num_inference_steps(self) -> int:
        return self.grid.num_inference_steps

    @property
    def timesteps(self) -> jnp.ndarray:
        return self.grid.timesteps

    @property
    def sampling_sigmas(self) -> jnp.ndarray:
        return self.grid.sampling_sigmas


def _mask_noise(noise: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(mask, noise, jnp.zeros_like(noise))


def pred_xprev(cfg: Sampler, x0: jnp.ndarray, eps: jnp.ndarray, sigma_t: jnp.ndarray,
               sigma_prev: jnp.ndarray, xt: jnp.ndarray, logvar: Optional[jnp.ndarray],
               noise: jnp.ndarray, eta: Optional[float] = None,
               ge_state: Optional[dict] = None):
    """One reverse-step x_t -> x_{t-1}.

    `noise` must be pre-drawn standard normal of x0's shape (pure function —
    the caller owns RNG). `eta` overrides cfg.eta (reference `new_eta` swaps
    eta for the final step, experiments.py:347-348) and may be a traced scalar
    so per-step eta works inside lax.scan: every rule is written so eta == 0
    reduces exactly to the reference's deterministic branch (the noise terms
    carry an eta (or derived-zero) factor). For the 'ge' sampler pass
    ge_state = {'eps_prev': ..., 'i': step_index}; returns (x_prev, new_state),
    otherwise returns x_prev.
    """
    name = cfg.name
    eta = cfg.eta if eta is None else eta
    eta = jnp.asarray(eta, x0.dtype)

    if name == "ddpm":
        noise_sigma = jnp.exp(0.5 * logvar) * jnp.sqrt(sigma_prev ** 2 + 1)
        signal_sigma = jnp.sqrt(jnp.clip(sigma_prev ** 2 - noise_sigma ** 2, min=0))
        x_prev = x0 + signal_sigma * eps
        return x_prev + noise_sigma * _mask_noise(noise, sigma_prev > 0)

    if name == "ddpm_orig":
        alpha_bar = 1.0 / (sigma_t ** 2 + 1)
        alpha_bar_prev = 1.0 / (sigma_prev ** 2 + 1)
        alpha_t = alpha_bar / alpha_bar_prev
        beta_t = 1 - alpha_t
        zt = xt * jnp.sqrt(alpha_bar)
        c1 = beta_t * jnp.sqrt(alpha_bar_prev) / (1.0 - alpha_bar)
        c2 = (1.0 - alpha_bar_prev) * jnp.sqrt(alpha_t) / (1.0 - alpha_bar)
        posterior_mean = c1 * x0 + c2 * zt
        mask = (sigma_prev > 0).astype(x0.dtype)
        z_prev = posterior_mean + mask * jnp.exp(0.5 * logvar) * noise
        return z_prev / jnp.sqrt(alpha_bar_prev)

    if name in ("ddim", "ddim_orig"):
        if name == "ddim_orig":
            eps = (xt - x0) / sigma_t
        ddpm_noise_sigma = jnp.exp(0.5 * logvar) if logvar is not None else jnp.zeros(())
        noise_sigma = eta * ddpm_noise_sigma * jnp.sqrt(sigma_prev ** 2 + 1)
        nz = _mask_noise(noise, sigma_prev > 0)
        signal_sigma = jnp.sqrt(jnp.clip(sigma_prev ** 2 - noise_sigma ** 2, min=0))
        if name == "ddim":
            noise_sigma = jnp.sqrt(jnp.clip(sigma_prev ** 2 - signal_sigma ** 2, min=0))
        return x0 + signal_sigma * eps + noise_sigma * nz

    if name in ("ddim_simple", "ddim_simple_orig", "ddim_simple_drag"):
        if name in ("ddim_simple_orig", "ddim_simple_drag"):
            eps = (xt - x0) / sigma_t
        if name == "ddim_simple_drag":
            signal_sigma = sigma_prev
        else:
            signal_sigma = jnp.sqrt(jnp.clip(1.0 - eta ** 2, min=0.0)) * sigma_prev
        return x0 + signal_sigma * eps + eta * sigma_prev * noise

    if name == "ge":
        assert ge_state is not None, "ge sampler needs eps-momentum state"
        gamma = cfg.ge_gamma
        eps_prev = ge_state["eps_prev"]
        is_first = ge_state["i"] == 0
        eps_av = jnp.where(is_first, eps, eps * gamma + eps_prev * (1 - gamma))
        if cfg.norm_eps:
            eps_av = normalize(eps_av)
        noise_sigma = eta * sigma_prev * jnp.sqrt(
            jnp.clip(1 - (sigma_prev / sigma_t) ** 2, min=0))
        signal_sigma = jnp.sqrt(jnp.clip(sigma_prev ** 2 - noise_sigma ** 2, min=0))
        x_prev = x0 + signal_sigma * eps_av
        nz = _mask_noise(noise, sigma_t > cfg.schedule.sigmas[0])
        x_prev = x_prev + noise_sigma * nz
        return x_prev, {"eps_prev": eps, "i": ge_state["i"] + 1}

    raise NotImplementedError(f"unknown sampler {name!r}")


def ge_pred_xstart(cfg: Sampler, xt: jnp.ndarray, eps: jnp.ndarray, sigma_t: jnp.ndarray,
                   ge_state: dict) -> jnp.ndarray:
    """GE sampler's momentum-averaged x0 prediction (reference :647-653)."""
    gamma = cfg.ge_gamma
    is_first = ge_state["i"] == 0
    eps_av = jnp.where(is_first, eps, eps * gamma + ge_state["eps_prev"] * (1 - gamma))
    if cfg.norm_eps:
        eps_av = normalize(eps_av)
    return xt - sigma_t * eps_av


def get_sampler(sampler_name: str, train_timesteps: int, inference_timesteps: int,
                beta_start: float = 1e-4, beta_end: float = 0.02,
                beta_schedule: str = "linear", sigma_style: str = "DDIM",
                set_alpha_to_one: bool = True, start_sigma: Optional[float] = None,
                end_sigma: Optional[float] = None, sampler_var: str = "none",
                continuous_t: bool = False, linear_scale: float = 1.0, eta: float = 0.0,
                ge_gamma: float = 2.0, norm_eps: bool = False,
                start_t: Optional[int] = None, end_t: Optional[int] = None) -> Sampler:
    """Factory with the reference's flag semantics (schedulers.py:676-726)."""
    if sampler_name not in SAMPLER_NAMES:
        raise NotImplementedError(f"unknown sampler {sampler_name!r}")
    if sampler_name == "ddpm_orig":
        eta = 1.0
    schedule = make_noise_schedule(train_timesteps, beta_start, beta_end, beta_schedule)
    import numpy as np
    sigmas_np = np.asarray(schedule.sigmas)

    if start_sigma is None or start_sigma <= 0:
        if start_t is None or start_t < 0:
            start = float(sigmas_np[-1])
        else:
            start = float(min(sigmas_np[start_t], sigmas_np[-1]))
    else:
        start = float(min(start_sigma, sigmas_np[-1]))
    if end_sigma is None or end_sigma <= 0:
        end = float(sigmas_np[0]) if (end_t is None or end_t < 0) else float(sigmas_np[end_t])
    else:
        end = float(end_sigma)

    grid = build_sampling_grid(schedule, start=start, end=end,
                               num_inference_steps=inference_timesteps, style=sigma_style,
                               scale=linear_scale, continuous_t=continuous_t,
                               set_alpha_to_one=set_alpha_to_one)
    return Sampler(name=sampler_name, schedule=schedule, grid=grid, eta=eta,
                   sampler_var=sampler_var, ge_gamma=ge_gamma, norm_eps=norm_eps)
