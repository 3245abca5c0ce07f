"""EDM sigma-head training step (reference EDMImageExperiment.train_edm,
src/experiments.py:963-1082): log-normal (or uniform) sigma sampling,
x-space noising x + sigma*n, preconditioned encode features, optional
EDM-lambda loss weighting. One fully-fused jitted step like sigma_trainer.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.song_unet import EDMPrecond
from ..utils.norms import vector_norm
from .losses import get_loss
from .sigma_trainer import SigmaTrainState, PerturbCoefficients


@dataclass(frozen=True)
class EDMTrainConfig:
    sigma_sampler: str = "edm"      # 'edm' (log-normal) | 'random' (uniform)
    loss_weighted: bool = False
    P_mean: float = -1.2
    P_std: float = 1.2
    sigma_min: float = 0.002
    sigma_max: float = 80.0
    sigma_data: float = 0.5


def edm_sigma_regression_targets(batch_x: jnp.ndarray, sigma: jnp.ndarray,
                                 noise: jnp.ndarray, xi: jnp.ndarray,
                                 eta1: jnp.ndarray, eta2: jnp.ndarray,
                                 sigma_data: float = 0.5):
    """Pinned-draw core of train_edm's regression (reference
    src/experiments.py:994-1002): EDM lambda weight, perturbed noise,
    x-space noising. Split out so the loss math can be golden-tested on
    identical draws (tests/test_sigma_trainer_golden.py).
    Returns (noisy_img, dist_real, weight)."""
    new_noise = noise + eta1 * (noise + eta2 * xi)
    dim = float(np.prod(batch_x.shape[1:]))
    dist_real = vector_norm(new_noise, keepdims=True) / jnp.sqrt(dim)
    noisy = batch_x + sigma * new_noise
    weight = (sigma ** 2 + sigma_data ** 2) / (sigma * sigma_data) ** 2
    return noisy, dist_real, weight


def edm_sigma_loss(loss_name: str, dist_real: jnp.ndarray,
                   residual: jnp.ndarray, weight: jnp.ndarray,
                   loss_weighted: bool):
    """train_edm loss combine (reference experiments.py:1008-1021 with the
    reduction='none' that run_edm_experiment.py:206 always passes):
    elementwise loss, then either lambda-normalized weighted sum or mean."""
    dist_hat = residual + 1.0
    if loss_weighted:
        w = weight / weight.sum()
        return (get_loss(loss_name, reduction="none")(dist_real, dist_hat) * w).sum()
    return get_loss(loss_name)(dist_real, dist_hat)


def make_edm_sigma_train_step(encode_fn: Callable, sigma_apply: Callable,
                              tx: optax.GradientTransformation,
                              loss_name: str = "mse", ema_rate: float = 0.999,
                              perturb: PerturbCoefficients = PerturbCoefficients(),
                              cfg: EDMTrainConfig = EDMTrainConfig()):
    precond = EDMPrecond(sigma_data=cfg.sigma_data)

    def train_step(state: SigmaTrainState, frozen_params, batch_x: jnp.ndarray,
                   key: jax.Array):
        b = batch_x.shape[0]
        shape = batch_x.shape[1:]
        ones = (1,) * len(shape)
        k_s, k_n, k_xi, k_e1, k_e2, k_drop = jax.random.split(
            jax.random.fold_in(key, state.step), 6)

        if cfg.sigma_sampler == "edm":
            rnd = jax.random.normal(k_s, (b,) + ones)
            sigma = jnp.exp(rnd * cfg.P_std + cfg.P_mean)
        else:
            u = jax.random.uniform(k_s, (b,) + ones)
            sigma = cfg.sigma_min * 0.95 + (cfg.sigma_max * 1.05
                                            - cfg.sigma_min * 0.95) * u
        noise = jax.random.normal(k_n, batch_x.shape)
        xi = jax.random.normal(k_xi, batch_x.shape)
        eta1 = perturb.eta1_min + jax.random.uniform(k_e1, (b,) + ones) * perturb.eta1_scale
        eta2 = perturb.eta2_min + jax.random.uniform(k_e2, (b,) + ones) * perturb.eta2_scale
        noisy, dist_real, weight = edm_sigma_regression_targets(
            batch_x, sigma, noise, xi, eta1, eta2, sigma_data=cfg.sigma_data)

        feat = jax.lax.stop_gradient(
            precond.encode(lambda z, t: encode_fn(frozen_params, z, t),
                           noisy, sigma.reshape(-1)))

        def loss_of(params):
            residual, new_stats = sigma_apply(
                {"params": params, "batch_stats": state.batch_stats}, feat,
                rngs={"dropout": k_drop})
            return edm_sigma_loss(loss_name, dist_real, residual, weight,
                                  cfg.loss_weighted), new_stats

        (loss, new_stats), grads = jax.value_and_grad(loss_of, has_aux=True)(
            state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = jax.tree_util.tree_map(
            lambda e, p: e * ema_rate + p * (1.0 - ema_rate), state.ema_params, params)
        return state.replace(params=params, batch_stats=new_stats, ema_params=ema,
                             opt_state=opt_state, step=state.step + 1), {"loss": loss}

    return train_step
