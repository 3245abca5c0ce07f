"""Noise schedules as immutable pytrees of precomputed tables.

Behavior parity with the reference `Scheduler` base class
(/root/reference/src/schedulers.py:95-220): beta schedules
linear/quadratic/cosine/sigmoid, sigma = sqrt(1/alpha_bar - 1), final sigma 0
(set_alpha_to_one), and the sigma<->t conversions (discrete searchsorted and
continuous piecewise-linear interpolation).

TPU-first design: tables are built once on host in numpy, stored as jnp
float32 arrays inside a flax.struct dataclass, so every conversion inside a
jitted lax.scan sampler is a pure gather/interp with no host sync — the
reference instead round-trips through a custom torch interp1d autograd op per
step (src/torchinterp1d.py:8).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct


def beta_schedule(name: str, num_timesteps: int, beta_start: float = 1e-4,
                  beta_end: float = 0.02) -> np.ndarray:
    """Beta tables (reference schedulers.py:106-127)."""
    # float32 throughout: the torch reference builds these tables in float32,
    # and the small-t sigmas sqrt(1/abar - 1) are dominated by the float32
    # cumprod's rounding — a float64 pipeline would *differ* from every
    # published checkpoint/FID by ~1% at small t.
    if name == "linear":
        betas = np.linspace(beta_start, beta_end, num_timesteps, dtype=np.float32)
    elif name == "quadratic":
        betas = np.linspace(beta_start ** 0.5, beta_end ** 0.5, num_timesteps,
                            dtype=np.float32) ** 2
    elif name == "cosine":
        s = 0.008
        x = np.linspace(0, num_timesteps, num_timesteps + 1, dtype=np.float32)
        abar = np.cos(((x / num_timesteps) + s) / (1 + s) * np.float32(np.pi) * 0.5) ** 2
        abar = abar / abar[0]
        betas = 1.0 - abar[1:] / abar[:-1]
        betas = np.clip(betas, 1e-6, 0.999)
    elif name == "sigmoid":
        x = np.linspace(-6, 6, num_timesteps, dtype=np.float32)
        betas = 1.0 / (1.0 + np.exp(-x)) * (beta_end - beta_start) + beta_start
    else:
        raise NotImplementedError(f"unknown beta schedule {name!r}")
    return betas.astype(np.float32)


@struct.dataclass
class NoiseSchedule:
    """Precomputed diffusion tables. All arrays are float32 on device.

    sigmas[t] = sqrt(1/alpha_bar_t - 1) is monotonically increasing in t;
    sigma index -1 means the clean endpoint with final_sigma = 0.
    """
    betas: jnp.ndarray                 # (T,)
    alphas_cumprod: jnp.ndarray        # (T,)
    sigmas: jnp.ndarray                # (T,)
    num_train_timesteps: int = struct.field(pytree_node=False)
    final_sigma: float = struct.field(pytree_node=False, default=0.0)

    # ---- discrete lookups (t may be any int array; t < 0 -> clean endpoint) ----
    def sigma(self, t: jnp.ndarray) -> jnp.ndarray:
        t = jnp.asarray(t)
        sig = self.sigmas[jnp.clip(t, 0, self.num_train_timesteps - 1).astype(jnp.int32)]
        return jnp.where(t >= 0, sig, self.final_sigma)

    def alpha_bar(self, t: jnp.ndarray) -> jnp.ndarray:
        t = jnp.asarray(t)
        ab = self.alphas_cumprod[jnp.clip(t, 0, self.num_train_timesteps - 1).astype(jnp.int32)]
        return jnp.where(t >= 0, ab, 1.0)

    def sigma_to_t(self, sigma: jnp.ndarray) -> jnp.ndarray:
        """Discrete: smallest t with sigmas[t] >= sigma (reference :185-190)."""
        return jnp.searchsorted(self.sigmas, jnp.asarray(sigma), side="left")

    # ---- continuous (interpolated) conversions (reference :192-220) ----
    def t_to_sigma_interp(self, t: jnp.ndarray) -> jnp.ndarray:
        """Linear interp of alpha_bar over t, then sigma = sqrt(1/abar - 1)."""
        t = jnp.asarray(t, jnp.float32)
        grid = jnp.arange(self.num_train_timesteps, dtype=jnp.float32)
        abar = jnp.interp(t, grid, self.alphas_cumprod)
        sig = jnp.sqrt(1.0 / abar - 1.0)
        return jnp.where(t >= 0, sig, self.final_sigma)

    def t_to_alphabar_interp(self, t: jnp.ndarray) -> jnp.ndarray:
        sig = self.t_to_sigma_interp(t)
        return 1.0 / (sig ** 2 + 1.0)

    def sigma_to_t_interp(self, sigma: jnp.ndarray) -> jnp.ndarray:
        """Linear interp of t over the sigma table."""
        sigma = jnp.asarray(sigma, jnp.float32)
        grid = jnp.arange(self.num_train_timesteps, dtype=jnp.float32)
        return jnp.interp(sigma, self.sigmas, grid)

    def get_sigma(self, t: jnp.ndarray, continuous_t: bool) -> jnp.ndarray:
        return self.t_to_sigma_interp(t) if continuous_t else self.sigma(t)

    def get_alpha_bar(self, t: jnp.ndarray, continuous_t: bool) -> jnp.ndarray:
        return self.t_to_alphabar_interp(t) if continuous_t else self.alpha_bar(t)

    def get_t_from_sigma(self, sigma: jnp.ndarray, continuous_t: bool) -> jnp.ndarray:
        return self.sigma_to_t_interp(sigma) if continuous_t else self.sigma_to_t(sigma)

    def q_sample(self, x0: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray) -> jnp.ndarray:
        """Forward diffusion q(x_t | x_0) in z-coordinates (reference :323-329)."""
        shape = (-1,) + (1,) * (x0.ndim - 1)
        abar = self.alphas_cumprod[t].reshape(shape)
        return x0 * jnp.sqrt(abar) + noise * jnp.sqrt(1.0 - abar)


def make_noise_schedule(num_train_timesteps: int = 1000, beta_start: float = 1e-4,
                        beta_end: float = 0.02, schedule: str = "linear") -> NoiseSchedule:
    betas = beta_schedule(schedule, num_train_timesteps, beta_start, beta_end)
    alphas_cumprod = np.cumprod((1.0 - betas).astype(np.float32), dtype=np.float32)
    sigmas = np.sqrt(1.0 / alphas_cumprod - 1.0).astype(np.float32)
    return NoiseSchedule(
        betas=jnp.asarray(betas, jnp.float32),
        alphas_cumprod=jnp.asarray(alphas_cumprod, jnp.float32),
        sigmas=jnp.asarray(sigmas, jnp.float32),
        num_train_timesteps=num_train_timesteps,
    )
