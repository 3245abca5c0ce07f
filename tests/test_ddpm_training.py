"""DDPM/iDDPM trainer (train/ddpm_training.py, cli/ddpm_train.py):
closed-form identities of the vlb pieces + an end-to-end training smoke."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nlc_tpu.train.ddpm_training import (DDPMTables, make_ddpm_tables,
                                         make_ddpm_hybrid_loss, normal_kl,
                                         vb_term)


def test_tables_identities():
    tb = make_ddpm_tables(100, "linear")
    betas = np.asarray(tb.betas)
    abar = np.asarray(tb.abar)
    # abar is the cumprod of (1 - beta)
    np.testing.assert_allclose(abar, np.cumprod(1 - betas), rtol=1e-5)
    # posterior variance < beta everywhere (t>0), and logvar is clipped at 0
    pv = np.exp(np.asarray(tb.posterior_logvar))
    assert (pv[1:] <= betas[1:] + 1e-8).all()
    assert pv[0] == pytest.approx(pv[1])
    # posterior mean coefficients sum: c0*sqrt(abar) + c1*sqrt(abar) terms
    # recover x_t's scaling when x0 = x_t = 1:
    # mu = c0 + c1 must equal (sqrt(abar_prev)*beta + sqrt(alpha)*(1-abar_prev))/(1-abar)
    c0 = np.asarray(tb.post_c0)
    c1 = np.asarray(tb.post_c1)
    expect = (np.sqrt(np.asarray(tb.abar_prev)) * betas
              + np.sqrt(1 - betas) * (1 - np.asarray(tb.abar_prev))) / (1 - abar)
    np.testing.assert_allclose(c0 + c1, expect, rtol=1e-4)


def test_normal_kl_zero_for_identical():
    m = jnp.asarray([0.3, -1.0])
    lv = jnp.asarray([-2.0, 0.5])
    np.testing.assert_allclose(np.asarray(normal_kl(m, lv, m, lv)), 0.0,
                               atol=1e-7)


def test_vb_term_near_zero_at_perfect_prediction():
    """eps_hat == eps and v == -1 (model variance = posterior variance)
    makes the KL vanish for t > 0."""
    tb = make_ddpm_tables(50, "linear")
    rng = np.random.RandomState(0)
    b = 4
    x0 = jnp.asarray(rng.uniform(-1, 1, (b, 8, 8, 3)).astype(np.float32))
    eps = jnp.asarray(rng.randn(b, 8, 8, 3).astype(np.float32))
    t = jnp.asarray([1, 10, 25, 49])
    ab = tb.abar[t].reshape(-1, 1, 1, 1)
    xt = jnp.sqrt(ab) * x0 + jnp.sqrt(1 - ab) * eps
    v = -jnp.ones_like(eps)
    out = np.asarray(vb_term(tb, x0, xt, t, eps, v))
    np.testing.assert_allclose(out, 0.0, atol=1e-5)


def test_vb_mean_is_stop_gradded():
    """L_vlb must not train the mean path: grad wrt eps_hat is exactly the
    variance head's coupling only (zero when v is detached from eps_hat)."""
    tb = make_ddpm_tables(50, "linear")
    rng = np.random.RandomState(1)
    x0 = jnp.asarray(rng.uniform(-1, 1, (2, 4, 4, 3)).astype(np.float32))
    eps = jnp.asarray(rng.randn(2, 4, 4, 3).astype(np.float32))
    t = jnp.asarray([5, 30])
    ab = tb.abar[t].reshape(-1, 1, 1, 1)
    xt = jnp.sqrt(ab) * x0 + jnp.sqrt(1 - ab) * eps
    v = jnp.zeros_like(eps)

    g = jax.grad(lambda e: vb_term(tb, x0, xt, t, e, v).sum())(eps)
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-7)
    # ...while the variance head DOES receive gradient
    gv = jax.grad(lambda vv: vb_term(tb, x0, xt, t, eps * 1.1, vv).sum())(v)
    assert float(np.abs(np.asarray(gv)).max()) > 0


def test_hybrid_loss_t0_uses_discretized_nll():
    tb = make_ddpm_tables(50, "linear")
    rng = np.random.RandomState(2)
    x0 = jnp.asarray(rng.uniform(-1, 1, (2, 4, 4, 3)).astype(np.float32))
    eps = jnp.asarray(rng.randn(2, 4, 4, 3).astype(np.float32))
    t = jnp.asarray([0, 0])
    ab = tb.abar[t].reshape(-1, 1, 1, 1)
    xt = jnp.sqrt(ab) * x0 + jnp.sqrt(1 - ab) * eps
    v = -jnp.ones_like(eps)
    out = np.asarray(vb_term(tb, x0, xt, t, eps, v))
    # perfect prediction at t=0 still pays the discretization entropy > 0
    assert (out > 0).all() and np.isfinite(out).all()


def test_train_smoke_loss_decreases(tmp_path):
    """Tiny ADM + hybrid loss + the shared accumulate step overfits a
    4-image dataset."""
    from nlc_tpu.models.factory import create_sigma_eps_model
    from nlc_tpu.train.edm_training import (EDMLoopConfig,
                                            create_edm_train_state,
                                            make_train_step_from_loss)

    model, _h, _cfg = create_sigma_eps_model(
        image_size=8, num_channels=32, num_res_blocks=1, channel_mult="1,2",
        learn_sigma=True, attention_resolutions="4", dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)),
                        jnp.zeros((1,)))
    tb = make_ddpm_tables(64, "cosine")

    def model_apply(p, xt, t, dropout_key):
        return model.apply(p, xt, t, deterministic=True)

    loss_elem = make_ddpm_hybrid_loss(tb, model_apply)
    cfg = EDMLoopConfig(batch_size=4, num_accumulation_rounds=1, lr=2e-3,
                        lr_rampup_kimg=0, ema_halflife_kimg=1)
    state, tx = create_edm_train_state(params, cfg)
    step = jax.jit(make_train_step_from_loss(loss_elem, tx, cfg))
    rng = np.random.RandomState(3)
    imgs = jnp.asarray(rng.uniform(-1, 1, (1, 4, 8, 8, 3)).astype(np.float32))
    labs = jnp.zeros((1, 4, 0))
    losses = []
    for i in range(30):
        state, m = step(state, imgs, labs, jax.random.PRNGKey(7))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses


def test_cli_smoke_and_snapshot_roundtrip(tmp_path):
    """ddpm_train on synthetic data writes a snapshot that image_sample's
    loader convention (ema unwrap) restores."""
    import yaml
    from nlc_tpu.cli.ddpm_train import get_args, main
    from nlc_tpu.io.checkpoints import load_pytree

    cfgp = os.path.join(tmp_path, "tiny_adm.yml")
    with open(cfgp, "w") as f:
        yaml.safe_dump({
            "model": {"type": "openai", "image_size": 8, "num_channels": 32,
                      "num_res_blocks": 1, "channel_mult": "1,2",
                      "learn_sigma": True, "attention_resolutions": "4",
                      "num_heads": 2, "use_scale_shift_norm": True,
                      "dropout": 0.0, "resblock_updown": True,
                      "feat_layer": 1},
            "data": {"dataset": "synthetic", "image_size": 8, "channels": 3},
            "diffusion": {"num_diffusion_timesteps": 64,
                          "beta_schedule": "cosine"},
        }, f)
    run = os.path.join(tmp_path, "run")
    main(get_args(["--config", cfgp, "--run_dir", run,
                   "--duration_kimg", "1", "--batch", "8",
                   "--kimg_per_tick", "1", "--bf16", "0"]))
    snaps = [d for d in os.listdir(run) if d.startswith("network-snapshot")]
    assert snaps, os.listdir(run)
    tree = load_pytree(os.path.join(run, sorted(snaps)[-1]))
    assert "ema" in tree and "params" in tree["ema"]
