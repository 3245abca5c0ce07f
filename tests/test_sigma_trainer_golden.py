"""Pinned-draw goldens for the sigma-training loss math vs the torch reference.

The EDM VP/VE/EDM losses already have this treatment
(test_edm_training.py::test_loss_formulas_match_torch); these tests give the
NLC product's own regression target the same: identical
(x0, noise, xi, t, eta1, eta2[, sigma]) draws fed to

  * nlc_tpu.train.sigma_trainer.sigma_regression_targets + get_loss
    vs the reference's train() inner computation
    (/root/reference/src/experiments.py:661-690), and
  * nlc_tpu.train.edm_sigma_trainer.edm_sigma_regression_targets +
    edm_sigma_loss vs the reference's train_edm() inner computation
    (/root/reference/src/experiments.py:989-1021, with the reduction='none'
    that run_edm_experiment.py:206 always passes),

asserting the noised input, the regression target dist_real, and the final
scalar loss agree for every sigma-loss choice ('mse', 'mae', 'huber') and,
on the EDM path, both loss_weighted settings and both sigma samplers.
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.conftest import requires_reference

B, C, H, W = 6, 3, 8, 8
DIM = C * H * W
LOSSES = ["mse", "mae", "huber"]


def _draws(seed=0):
    rng = np.random.RandomState(seed)
    x0 = rng.randn(B, C, H, W).astype(np.float32)
    noise = rng.randn(B, C, H, W).astype(np.float32)
    xi = rng.randn(B, C, H, W).astype(np.float32)
    t = rng.randint(0, 1000, size=(B,)).astype(np.int64)
    # set_perturb_coefficient form (experiments.py:228-231):
    # eta = eta_min + rand * eta_scale, with the CelebA recipe's coefficients
    # (run_image_experiment.py:58-61 defaults are 0; use nonzero to exercise
    # the perturbation path)
    eta1 = (0.05 + rng.rand(B, 1, 1, 1) * 0.4).astype(np.float32)
    eta2 = (0.1 + rng.rand(B, 1, 1, 1) * 0.8).astype(np.float32)
    residual = (0.1 * rng.randn(B, 1, 1, 1)).astype(np.float32)
    return x0, noise, xi, t, eta1, eta2, residual


@requires_reference
@pytest.mark.parametrize("loss_name", LOSSES)
def test_sigma_train_loss_matches_reference(reference_path, loss_name):
    import torch
    sys.path.insert(0, reference_path)
    from tests.test_engine import _stub_missing_reference_deps
    _stub_missing_reference_deps()
    from src.schedulers import get_sampler as torch_get_sampler
    from src.experiments import get_loss as torch_get_loss
    from src.utils import vector_norm as torch_vector_norm

    from nlc_tpu.sched.schedules import make_noise_schedule
    from nlc_tpu.train.sigma_trainer import sigma_regression_targets
    from nlc_tpu.train.losses import get_loss

    x0, noise, xi, t, eta1, eta2, residual = _draws(0)

    # --- reference inner loop (experiments.py:661-690) on pinned draws ---
    tsched = torch_get_sampler("ddim_simple_orig", 1000, 50)
    tx0, tn, txi = map(torch.from_numpy, (x0, noise, xi))
    te1, te2, tt = torch.from_numpy(eta1), torch.from_numpy(eta2), torch.from_numpy(t)
    noise_delta = te1 * tn + te1 * te2 * txi
    new_noise = tn + noise_delta
    dist_real_t = torch_vector_norm(new_noise) / np.sqrt(DIM)
    noisy_t, _ = tsched.diffusion(tx0, tt, new_noise)
    dist_hat_t = torch.from_numpy(residual) + 1
    loss_t = torch_get_loss(loss_name)(dist_real_t, dist_hat_t).item()

    # --- ours on the same draws ---
    sched = make_noise_schedule(1000)
    noisy_j, dist_real_j = sigma_regression_targets(
        sched, jnp.asarray(x0), jnp.asarray(t), jnp.asarray(noise),
        jnp.asarray(xi), jnp.asarray(eta1), jnp.asarray(eta2))
    loss_j = float(get_loss(loss_name)(dist_real_j, jnp.asarray(residual) + 1.0))

    np.testing.assert_allclose(np.asarray(dist_real_j),
                               dist_real_t.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(noisy_j), noisy_t.numpy(),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(loss_j, loss_t, rtol=1e-5, atol=1e-7)


@requires_reference
def test_sigma_train_antithetic_t_matches_reference():
    """t assembly: t ~ U[0,T) over B//2+1 draws, mirrored T-1-t, truncated
    to B (experiments.py:661-662) — same construction as the train step's."""
    import torch
    T, b = 1000, B
    t_half = np.random.RandomState(3).randint(0, T, size=(b // 2 + 1,))
    tt = torch.from_numpy(t_half)
    ref = torch.cat([tt, T - tt - 1], dim=0)[:b].numpy()
    ours = np.concatenate([t_half, T - t_half - 1])[:b]
    np.testing.assert_array_equal(ours, ref)


@requires_reference
@pytest.mark.parametrize("loss_name", LOSSES)
@pytest.mark.parametrize("loss_weighted", [False, True])
def test_edm_sigma_train_loss_matches_reference(reference_path, loss_name,
                                                loss_weighted):
    import torch
    sys.path.insert(0, reference_path)
    from tests.test_engine import _stub_missing_reference_deps
    _stub_missing_reference_deps()
    from src.experiments import get_loss as torch_get_loss
    from src.utils import vector_norm as torch_vector_norm

    from nlc_tpu.train.edm_sigma_trainer import (
        EDMTrainConfig, edm_sigma_regression_targets, edm_sigma_loss)

    cfg = EDMTrainConfig()
    x0, noise, xi, _, eta1, eta2, residual = _draws(1)
    rnd = np.random.RandomState(2).randn(B, 1, 1, 1).astype(np.float32)

    # --- reference train_edm inner loop (experiments.py:989-1021) ---
    tx0, tn, txi = map(torch.from_numpy, (x0, noise, xi))
    te1, te2 = torch.from_numpy(eta1), torch.from_numpy(eta2)
    sigma_t = (torch.from_numpy(rnd) * cfg.P_std + cfg.P_mean).exp()
    weight_t = (sigma_t ** 2 + cfg.sigma_data ** 2) / (sigma_t * cfg.sigma_data) ** 2
    noise_delta = te1 * (tn + te2 * txi)
    new_noise = tn + noise_delta
    dist_real_t = torch_vector_norm(new_noise) / np.sqrt(DIM)
    noisy_t = tx0 + sigma_t * new_noise
    dist_hat_t = torch.from_numpy(residual) + 1
    # run_edm_experiment.py:206 passes reduction='none' unconditionally
    loss_elem = torch_get_loss(loss_name, reduction="none")(dist_real_t, dist_hat_t)
    if loss_weighted:
        w = weight_t / weight_t.sum()
        loss_t = (loss_elem * w).sum().item()
    else:
        loss_t = loss_elem.mean().item()

    # --- ours on the same draws (sigma from the same formula + rnd) ---
    sigma_j = jnp.exp(jnp.asarray(rnd) * cfg.P_std + cfg.P_mean)
    np.testing.assert_allclose(np.asarray(sigma_j), sigma_t.numpy(),
                               rtol=1e-5, atol=1e-7)
    noisy_j, dist_real_j, weight_j = edm_sigma_regression_targets(
        jnp.asarray(x0), sigma_j, jnp.asarray(noise), jnp.asarray(xi),
        jnp.asarray(eta1), jnp.asarray(eta2), sigma_data=cfg.sigma_data)
    loss_j = float(edm_sigma_loss(loss_name, dist_real_j,
                                  jnp.asarray(residual), weight_j,
                                  loss_weighted))

    np.testing.assert_allclose(np.asarray(weight_j), weight_t.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dist_real_j), dist_real_t.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(noisy_j), noisy_t.numpy(),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(loss_j, loss_t, rtol=1e-5, atol=1e-7)


@requires_reference
def test_edm_sigma_random_sampler_formula_matches_reference():
    """'random' sigma sampler: sigma_min*0.95 + (sigma_max*1.05 -
    sigma_min*0.95) * u (experiments.py:993)."""
    import torch
    from nlc_tpu.train.edm_sigma_trainer import EDMTrainConfig
    cfg = EDMTrainConfig()
    u = np.random.RandomState(4).rand(B, 1, 1, 1).astype(np.float32)
    ref = (cfg.sigma_min * 0.95
           + (cfg.sigma_max * 1.05 - cfg.sigma_min * 0.95) * torch.from_numpy(u))
    ours = cfg.sigma_min * 0.95 + (cfg.sigma_max * 1.05
                                   - cfg.sigma_min * 0.95) * jnp.asarray(u)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-6)
