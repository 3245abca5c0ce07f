"""Restart sampling (engine/restart.py, arXiv:2306.14878): plan construction,
bit-parity with the plain Heun sampler when no intervals are given, and
execution with intervals."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nlc_tpu.engine.edm import (EDMModelBundle, EDMSamplerConfig,
                                edm_sigma_grid, edm_sampler)
from nlc_tpu.engine.restart import (RestartInterval, build_restart_plan,
                                    restart_sampler, build_restart_sampler,
                                    parse_restart_spec)
from nlc_tpu.models.song_unet import SongUNet, SongUNetConfig, EDMPrecond


def make_bundle(seed=0):
    cfg = SongUNetConfig(img_resolution=16, in_channels=3, out_channels=3,
                         model_channels=16, channel_mult=(1, 2), num_blocks=1,
                         attn_resolutions=(8,), dropout=0.0)
    model = SongUNet(cfg)
    params = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, 16, 16, 3)),
                        jnp.zeros((1,)))
    bundle = EDMModelBundle(
        forward=lambda p, z, t: model.apply(p, z, t),
        encode=lambda p, z, t: model.apply(p, z, t, method=SongUNet.encode),
        sigma=lambda v, f: jnp.zeros((f.shape[0], 1, 1, 1)),
        precond=EDMPrecond())
    return bundle, params


def test_plan_no_restarts_is_main_grid():
    cfg = EDMSamplerConfig(num_steps=8, S_churn=2.0)
    plan = build_restart_plan(cfg, [])
    grid = edm_sigma_grid(cfg)
    np.testing.assert_allclose(plan["sigma_cur"], grid[:-1].astype(np.float32))
    np.testing.assert_allclose(plan["sigma_next"], grid[1:].astype(np.float32))
    assert not plan["jump"].any()
    np.testing.assert_array_equal(plan["ind"], np.arange(8))
    assert plan["second"][-1] == False  # noqa: E712 — last step first-order


def test_plan_with_interval_structure():
    cfg = EDMSamplerConfig(num_steps=8)
    grid = edm_sigma_grid(cfg)
    # restart around the 4th grid point
    t_min = float(grid[4])
    r = RestartInterval(t_min=t_min, t_max=t_min * 4, K=2, n_steps=3)
    plan = build_restart_plan(cfg, [r])
    # total = main + K * (1 jump + n_steps descents)
    assert len(plan["sigma_cur"]) == 8 + 2 * (1 + 3)
    jumps = np.nonzero(plan["jump"])[0]
    assert len(jumps) == 2
    # each jump rises from the trigger sigma to t_max
    for j in jumps:
        assert plan["sigma_cur"][j] == np.float32(grid[4])
        assert plan["sigma_next"][j] == np.float32(t_min * 4)
        assert plan["gamma"][j] == 0.0
    # descent after a jump returns to the trigger sigma
    assert plan["sigma_next"][jumps[0] + 3] == pytest.approx(grid[4], rel=1e-6)
    # noise indices are unique (distinct per-step streams)
    assert len(set(plan["ind"].tolist())) == len(plan["ind"])
    # descent steps keep the Heun correction (their endpoints are nonzero
    # sigmas, unlike the main grid's terminal step)
    for j in jumps:
        assert plan["second"][j + 1:j + 4].all()


def test_restart_bit_parity_without_intervals():
    bundle, params = make_bundle()
    cfg = EDMSamplerConfig(num_steps=6, S_churn=1.0, style="base,base")
    seeds = jnp.arange(2)
    base = edm_sampler(bundle, cfg, params, {}, seeds, (16, 16, 3))
    same = restart_sampler(bundle, cfg, [], params, {}, seeds, (16, 16, 3))
    np.testing.assert_array_equal(np.asarray(base), np.asarray(same))


def test_restart_with_interval_runs():
    bundle, params = make_bundle()
    cfg = EDMSamplerConfig(num_steps=6, style="base,base")
    grid = edm_sigma_grid(cfg)
    r = RestartInterval(t_min=float(grid[3]), t_max=float(grid[1]), K=1,
                        n_steps=2)
    seeds = jnp.arange(2)
    base = edm_sampler(bundle, cfg, params, {}, seeds, (16, 16, 3))
    out = restart_sampler(bundle, cfg, [r], params, {}, seeds, (16, 16, 3))
    assert np.isfinite(np.asarray(out)).all()
    assert not np.array_equal(np.asarray(out), np.asarray(base))
    # jitted builder agrees with the eager run
    run = build_restart_sampler(bundle, cfg, [r], (16, 16, 3))
    np.testing.assert_allclose(np.asarray(run(params, {}, seeds)),
                               np.asarray(out), atol=1e-5)


def test_restart_invalid_interval():
    cfg = EDMSamplerConfig(num_steps=6)
    grid = edm_sigma_grid(cfg)
    with pytest.raises(ValueError):   # t_max below t_min
        RestartInterval(t_min=float(grid[3]), t_max=float(grid[5]))
    with pytest.raises(ValueError):   # degenerate repetition / step counts
        RestartInterval(t_min=0.1, t_max=1.0, K=0)
    with pytest.raises(ValueError):
        RestartInterval(t_min=0.1, t_max=1.0, n_steps=0)
    with pytest.raises(ValueError):   # interval below the grid minimum
        build_restart_plan(cfg, [RestartInterval(t_min=1e-9, t_max=1.0)])


def test_parse_restart_spec():
    spec = "0.1,2.0,3,4;0.5,5.0,1,2"
    a, b = parse_restart_spec(spec)
    assert (a.t_min, a.t_max, a.K, a.n_steps) == (0.1, 2.0, 3, 4)
    assert (b.t_min, b.t_max, b.K, b.n_steps) == (0.5, 5.0, 1, 2)
    with pytest.raises(ValueError):
        parse_restart_spec("1,2,3")
    assert parse_restart_spec("") == ()
