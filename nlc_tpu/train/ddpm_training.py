"""From-scratch DDPM / iDDPM training for the ADM-family UNets.

The reference ecosystem samples its ADM checkpoints from OpenAI's
guided-diffusion pretraining (reference image_sample.py:145 loads them; the
repo itself only trains sigma heads). To study NLC behavior on the ADM
architecture family without external assets (VERDICT r4 #3), this module
provides the matching pretraining objective: the iDDPM hybrid loss
L_simple + lambda * L_vlb with a learned-variance output head
(eps_hat, v) -> Sigma = exp(v * log beta_t + (1 - v~) * log beta~_t),
per Nichol & Dhariwal (arXiv:2102.09672) — the objective the ADM
checkpoints the flagship models were trained with.

Reuses the EDM loop machinery (train/edm_training.py): EDMTrainState,
make_train_step_from_loss (accumulation scan + lr ramp + nan_to_num + EMA)
and edm_training_loop (ticks, snapshots, resumable state dumps). Schedule
tables come from sched/schedules.py's beta_schedule (same float32 tables
the samplers use, so trained models sample with bit-matching sigmas).

TPU-first: the whole loss (t draw, q_sample, UNet forward, vlb KL) is one
traced function inside the jitted accumulate step; t is drawn per-sample
with antithetic coverage of {0..T-1}; no data-dependent branching — the
t==0 discretized-NLL case is a jnp.where select.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..sched.schedules import beta_schedule

LN2 = float(np.log(2.0))


@dataclass(frozen=True)
class DDPMTables:
    """Posterior/forward tables for discrete-t DDPM training (fp32)."""
    betas: jnp.ndarray             # (T,)
    abar: jnp.ndarray              # (T,) cumprod alpha
    abar_prev: jnp.ndarray         # (T,) with abar_{-1} = 1
    log_betas: jnp.ndarray
    posterior_logvar: jnp.ndarray  # log beta~_t, clipped at t=0
    post_c0: jnp.ndarray           # coef of x0 in posterior mean
    post_c1: jnp.ndarray           # coef of x_t in posterior mean

    @property
    def num_timesteps(self) -> int:
        return int(self.betas.shape[0])


def make_ddpm_tables(num_timesteps: int = 1000,
                     schedule: str = "linear",
                     beta_start: float = 1e-4,
                     beta_end: float = 0.02) -> DDPMTables:
    betas = beta_schedule(schedule, num_timesteps, beta_start, beta_end)
    alphas = 1.0 - betas
    abar = np.cumprod(alphas, dtype=np.float32)
    abar_prev = np.append(np.float32(1.0), abar[:-1])
    post_var = betas * (1.0 - abar_prev) / (1.0 - abar)
    # t=0 has beta~_0 = 0; clip like iDDPM (log of var[1])
    post_logvar = np.log(np.append(post_var[1], post_var[1:]))
    post_c0 = betas * np.sqrt(abar_prev) / (1.0 - abar)
    post_c1 = (1.0 - abar_prev) * np.sqrt(alphas) / (1.0 - abar)
    as_j = lambda a: jnp.asarray(a, jnp.float32)  # noqa: E731
    return DDPMTables(betas=as_j(betas), abar=as_j(abar),
                      abar_prev=as_j(abar_prev),
                      log_betas=as_j(np.log(betas)),
                      posterior_logvar=as_j(post_logvar),
                      post_c0=as_j(post_c0), post_c1=as_j(post_c1))


# --------------------------------------------------------------------------
# vlb pieces (closed-form; arXiv:2102.09672 eq. 5-8)
# --------------------------------------------------------------------------

def normal_kl(mean1, logvar1, mean2, logvar2):
    return 0.5 * (-1.0 + logvar2 - logvar1 + jnp.exp(logvar1 - logvar2)
                  + (mean1 - mean2) ** 2 * jnp.exp(-logvar2))


def _approx_std_normal_cdf(x):
    return 0.5 * (1.0 + jnp.tanh(jnp.sqrt(2.0 / jnp.pi)
                                 * (x + 0.044715 * x ** 3)))


def discretized_gaussian_log_likelihood(x, means, log_scales):
    """log p(x) for x in [-1,1] discretized to 255 bins (iDDPM's t=0 term)."""
    centered = x - means
    inv_std = jnp.exp(-log_scales)
    plus = _approx_std_normal_cdf(inv_std * (centered + 1.0 / 255.0))
    minus = _approx_std_normal_cdf(inv_std * (centered - 1.0 / 255.0))
    log_cdf_plus = jnp.log(jnp.clip(plus, min=1e-12))
    log_one_minus = jnp.log(jnp.clip(1.0 - minus, min=1e-12))
    log_delta = jnp.log(jnp.clip(plus - minus, min=1e-12))
    return jnp.where(x < -0.999, log_cdf_plus,
                     jnp.where(x > 0.999, log_one_minus, log_delta))


def vb_term(tables: DDPMTables, x0, xt, t, eps_hat, v):
    """Per-sample variational bound term in bits/dim: KL for t>0, the
    discretized NLL for t==0. The mean path is stop-gradded — L_vlb trains
    only the variance head (iDDPM section 3.1)."""
    g = lambda a: a[t].reshape(-1, 1, 1, 1)  # noqa: E731
    true_mean = g(tables.post_c0) * x0 + g(tables.post_c1) * xt
    true_logvar = g(tables.posterior_logvar)

    eps_sg = jax.lax.stop_gradient(eps_hat)
    x0_hat = (xt - jnp.sqrt(1.0 - g(tables.abar)) * eps_sg) \
        / jnp.sqrt(g(tables.abar))
    model_mean = g(tables.post_c0) * x0_hat + g(tables.post_c1) * xt
    frac = (v.astype(jnp.float32) + 1.0) / 2.0
    model_logvar = frac * g(tables.log_betas) \
        + (1.0 - frac) * g(tables.posterior_logvar)

    kl = normal_kl(true_mean, true_logvar, model_mean, model_logvar)
    kl = kl.reshape(kl.shape[0], -1).mean(axis=1) / LN2
    nll = -discretized_gaussian_log_likelihood(x0, model_mean,
                                               0.5 * model_logvar)
    nll = nll.reshape(nll.shape[0], -1).mean(axis=1) / LN2
    return jnp.where(t == 0, nll, kl)


# --------------------------------------------------------------------------
# the hybrid loss as a make_train_step_from_loss loss_elem callable
# --------------------------------------------------------------------------

def make_ddpm_hybrid_loss(tables: DDPMTables, model_apply: Callable,
                          *, learn_var: bool = True,
                          vlb_weight: float = 1e-3,
                          antithetic: bool = True):
    """Returns loss_elem(params, imgs, labels, key, dropout_key) -> (B,1,1,1)
    per-sample hybrid loss. model_apply(params, xt, t, dropout_key) must run
    the UNet in train mode and return (B,H,W,3) eps — or (B,H,W,6)
    (eps, v) when learn_var."""
    T = tables.num_timesteps

    def loss_elem(params, imgs, labels, key, dropout_key):
        del labels  # unconditional study models
        b = imgs.shape[0]
        k_t, k_n = jax.random.split(key)
        if antithetic:
            # antithetic t pairs cover both schedule ends every batch (the
            # sigma trainer uses the same trick — train/sigma_trainer.py)
            half = jax.random.randint(k_t, ((b + 1) // 2,), 0, T)
            t = jnp.concatenate([half, T - 1 - half])[:b]
        else:
            t = jax.random.randint(k_t, (b,), 0, T)
        eps = jax.random.normal(k_n, imgs.shape, jnp.float32)
        x0 = imgs.astype(jnp.float32)
        ab = tables.abar[t].reshape(-1, 1, 1, 1)
        xt = jnp.sqrt(ab) * x0 + jnp.sqrt(1.0 - ab) * eps

        out = model_apply(params, xt, t.astype(jnp.float32), dropout_key)
        out = out.astype(jnp.float32)
        if learn_var:
            c = out.shape[-1] // 2
            eps_hat, v = out[..., :c], out[..., c:]
        else:
            eps_hat, v = out, None

        mse = ((eps_hat - eps) ** 2).reshape(b, -1).mean(axis=1)
        loss = mse
        if learn_var:
            loss = loss + vlb_weight * T \
                * vb_term(tables, x0, xt, t, eps_hat, v)
        return loss.reshape(b, 1, 1, 1)

    return loss_elem
