"""Sigma-head training: frozen-UNet feature extraction + sigma regression.

Behavior parity with the reference training loop (src/experiments.py:632-753,
ImageExperiment.train):
  * antithetic t sampling: t ~ U[0,T), second half mirrored T-1-t  (:661-662)
  * perturbed noise  new_noise = n + eta1*n + eta1*eta2*xi          (:664-667)
  * regression target dist_real = ||new_noise|| / sqrt(dim)         (:668)
  * q-sample in z-space, frozen-encoder features under no_grad      (:669-681)
  * loss(dist_real, 1 + residual), AdamW, EMA of sigma params       (:682-694)

TPU-first redesign: the whole iteration is ONE jitted step — noise synthesis,
q-sample, frozen encode, sigma-head forward/backward, AdamW update and the
EMA update all fuse on device; batch is sharded over the mesh 'data' axis and
XLA inserts the gradient all-reduce (the reference instead wraps the head in
DDP but calls it under no_sync() on every step, i.e. per-rank gradients —
here gradients are properly averaged, which can only improve on the
reference's behavior). bf16-ready; no loss-scaling needed (the reference's
fp16_util.py dynamic loss scaling is CUDA-fp16 specific).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..sched.schedules import NoiseSchedule
from ..utils.norms import vector_norm
from .losses import get_loss


@struct.dataclass
class SigmaTrainState:
    params: Any
    batch_stats: Any
    ema_params: Any
    opt_state: Any
    step: jnp.ndarray


def create_sigma_train_state(sigma_variables, lr: float, weight_decay: float = 0.0
                             ) -> Tuple[SigmaTrainState, optax.GradientTransformation]:
    tx = optax.adamw(lr, weight_decay=weight_decay)
    params = sigma_variables["params"]
    return SigmaTrainState(
        params=params,
        batch_stats=sigma_variables.get("batch_stats", {}),
        ema_params=jax.tree_util.tree_map(jnp.copy, params),
        opt_state=tx.init(params),
        step=jnp.asarray(0),
    ), tx


@dataclass(frozen=True)
class PerturbCoefficients:
    """eta1/eta2 noise-perturbation ranges (reference run_image_experiment.py:58-61,
    set_perturb_coefficient experiments.py:228-231)."""
    eta1_min: float = 0.0
    eta1_scale: float = 0.0
    eta2_min: float = 0.0
    eta2_scale: float = 0.0


def sigma_regression_targets(schedule: NoiseSchedule, batch_x: jnp.ndarray,
                             t: jnp.ndarray, noise: jnp.ndarray,
                             xi: jnp.ndarray, eta1: jnp.ndarray,
                             eta2: jnp.ndarray, edm_style: bool = False):
    """Pinned-draw core of the sigma regression (reference
    src/experiments.py:661-669): perturbed noise, regression target, q-sample.

    Split out of the train step so the loss math can be golden-tested against
    the reference on identical (x0, noise, xi, t, eta1, eta2) draws
    (tests/test_sigma_trainer_golden.py). Returns (noisy_x, dist_real) with
    dist_real shaped (B, 1, ..., 1).
    """
    if edm_style:
        # reference experiments.py:996-999 (train_edm)
        new_noise = noise + eta1 * (noise + eta2 * xi)
    else:
        # reference experiments.py:664-667 (train)
        new_noise = noise + eta1 * noise + eta1 * eta2 * xi
    dim = float(np.prod(batch_x.shape[1:]))
    dist_real = vector_norm(new_noise, keepdims=True) / jnp.sqrt(dim)
    noisy_x = schedule.q_sample(batch_x, t, new_noise)
    return noisy_x, dist_real


def make_sigma_train_step(schedule: NoiseSchedule, encode_fn: Callable,
                          sigma_apply: Callable, tx: optax.GradientTransformation,
                          loss_name: str = "mse", ema_rate: float = 0.999,
                          perturb: PerturbCoefficients = PerturbCoefficients(),
                          max_T: int = -1, edm_style: bool = False):
    """Build the jitted train step.

    encode_fn(frozen_params, z, t) -> feat   (stop-gradient frozen UNet)
    sigma_apply({'params','batch_stats'}, feat, train=True)
        -> (residual, new_batch_stats)

    edm_style switches the noise perturbation to the EDM trainer's form
    new_noise = n + eta1*(n + eta2*xi) (reference experiments.py:996-999).
    """
    loss_fn = get_loss(loss_name)
    num_T = max_T if max_T > 0 else schedule.num_train_timesteps

    def train_step(state: SigmaTrainState, frozen_params, batch_x: jnp.ndarray,
                   key: jax.Array):
        b = batch_x.shape[0]
        sample_shape = batch_x.shape[1:]
        k_t, k_n, k_xi, k_e1, k_e2, k_drop = jax.random.split(
            jax.random.fold_in(key, state.step), 6)

        # antithetic timesteps
        t_half = jax.random.randint(k_t, (b // 2 + 1,), 0, num_T)
        t = jnp.concatenate([t_half, num_T - t_half - 1])[:b]

        # perturbed noise
        ones = (1,) * len(sample_shape)
        noise = jax.random.normal(k_n, batch_x.shape)
        xi = jax.random.normal(k_xi, batch_x.shape)
        eta1 = perturb.eta1_min + jax.random.uniform(k_e1, (b,) + ones) * perturb.eta1_scale
        eta2 = perturb.eta2_min + jax.random.uniform(k_e2, (b,) + ones) * perturb.eta2_scale
        noisy_x, dist_real = sigma_regression_targets(
            schedule, batch_x, t, noise, xi, eta1, eta2, edm_style=edm_style)
        feat = jax.lax.stop_gradient(
            encode_fn(frozen_params, noisy_x, t.astype(jnp.float32)))

        def loss_of(params):
            residual, new_stats = sigma_apply(
                {"params": params, "batch_stats": state.batch_stats}, feat,
                rngs={"dropout": k_drop})
            dist_hat = residual + 1.0
            return loss_fn(dist_real, dist_hat), new_stats

        (loss, new_stats), grads = jax.value_and_grad(loss_of, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = jax.tree_util.tree_map(
            lambda e, p: e * ema_rate + p * (1.0 - ema_rate), state.ema_params, params)
        new_state = state.replace(params=params, batch_stats=new_stats,
                                  ema_params=ema, opt_state=opt_state,
                                  step=state.step + 1)
        return new_state, {"loss": loss}

    return train_step
