"""Closed-form and reference-parity tests for noise schedules and grids."""
import numpy as np
import jax.numpy as jnp
import pytest

from nlc_tpu.sched import (
    make_noise_schedule, space_timesteps, replace_duplicate_t, build_sampling_grid,
    get_sampler, pred_xstart, pred_xprev, get_eps_logvar,
)
from tests.conftest import requires_reference


def test_beta_schedules_shapes_and_monotone_sigma():
    for name in ["linear", "quadratic", "cosine", "sigmoid"]:
        sch = make_noise_schedule(1000, schedule=name)
        assert sch.betas.shape == (1000,)
        sig = np.asarray(sch.sigmas)
        assert np.all(np.diff(sig) > 0), f"{name}: sigma not increasing"
        # sigma/alpha_bar identity: sigma = sqrt(1/abar - 1)
        abar = np.asarray(sch.alphas_cumprod)
        np.testing.assert_allclose(sig, np.sqrt(1 / abar - 1), rtol=1e-4)


def test_sigma_t_roundtrip():
    sch = make_noise_schedule(1000)
    t = jnp.array([0, 1, 500, 998, 999])
    sig = sch.sigma(t)
    t_back = sch.sigma_to_t(sig)
    np.testing.assert_array_equal(np.asarray(t_back), np.asarray(t))
    # negative t -> clean endpoint
    assert float(sch.sigma(jnp.array(-1))) == 0.0
    assert float(sch.alpha_bar(jnp.array(-1))) == 1.0


def test_continuous_interp_roundtrip():
    sch = make_noise_schedule(1000)
    t = jnp.array([0.0, 10.5, 500.25, 998.9])
    sig = sch.t_to_sigma_interp(t)
    # alphabar-interp roundtrip is exact at its own nodes; between nodes the
    # two interpolations (over abar vs over sigma) differ slightly.
    t_back = sch.sigma_to_t_interp(sig)
    np.testing.assert_allclose(np.asarray(t_back), np.asarray(t), atol=0.51)


def test_space_timesteps_ddim_and_sections():
    assert space_timesteps(1000, "ddim50") == set(range(0, 1000, 20))
    steps = space_timesteps(300, "10,15,20")
    assert len(steps & set(range(0, 100))) == 10
    assert len(steps & set(range(100, 200))) == 15
    assert len(steps & set(range(200, 300))) == 20


def test_replace_duplicate_t_strictly_decreasing():
    ts = np.array([999, 900, 900, 900, 500, 100, 3, 2, 1, 0])
    out = replace_duplicate_t(ts)
    assert np.all(np.diff(out) < 0)
    assert out.max() <= 999


def test_build_grid_styles():
    sch = make_noise_schedule(1000)
    smax = float(np.asarray(sch.sigmas)[-1])
    smin = float(np.asarray(sch.sigmas)[0])
    for style in ["DDIM", "EDM", "Linear", "Scaled"]:
        grid = build_sampling_grid(sch, start=smax, end=smin, num_inference_steps=10,
                                   style=style)
        assert grid.timesteps.shape == (11,)
        assert grid.sampling_sigmas.shape == (11,)
        sig = np.asarray(grid.sampling_sigmas)
        assert sig[-1] == 0.0
        assert np.all(np.diff(sig) <= 0), style
        assert float(grid.timesteps[-1]) == -1.0


def test_q_sample_statistics():
    import jax
    sch = make_noise_schedule(1000)
    x0 = jnp.ones((4, 8, 8, 3))
    noise = jax.random.normal(jax.random.PRNGKey(0), x0.shape)
    t = jnp.array([0, 100, 500, 999])
    xt = sch.q_sample(x0, t, noise)
    abar = np.asarray(sch.alphas_cumprod)[np.asarray(t)]
    expected_mean = np.sqrt(abar)  # mean of each sample ~ sqrt(abar)*1
    got_mean = np.asarray(xt.mean(axis=(1, 2, 3)))
    np.testing.assert_allclose(got_mean, expected_mean, atol=0.15)


def test_pred_xstart_xprev_consistency():
    """DDIM with eta=0: x_prev = x0 + sigma_prev * eps exactly; at
    sigma_prev=0 the step lands on x0."""
    s = get_sampler("ddim_simple_orig", 1000, 10)
    xt = jnp.ones((2, 4, 4, 3)) * 2.0
    eps = jnp.ones_like(xt) * 0.5
    sigma_t = jnp.asarray(1.0)
    x0 = pred_xstart(xt, eps, sigma_t)
    np.testing.assert_allclose(np.asarray(x0), 1.5)
    noise = jnp.zeros_like(xt)
    x_prev = pred_xprev(s, x0, eps, sigma_t, jnp.asarray(0.0), xt, None, noise)
    np.testing.assert_allclose(np.asarray(x_prev), np.asarray(x0))
    # nonzero sigma_prev: recomputed eps equals given eps here
    x_prev = pred_xprev(s, x0, eps, sigma_t, jnp.asarray(0.3), xt, None, noise)
    np.testing.assert_allclose(np.asarray(x_prev), np.asarray(x0 + 0.3 * eps), rtol=1e-6)


def test_ddpm_variance_split():
    """DDPM: signal^2 + noise^2 == sigma_prev^2 when the variance fits."""
    s = get_sampler("ddpm", 1000, 10, sampler_var="fixedsmall", eta=1.0)
    sigma_t = jnp.asarray(2.0)
    sigma_prev = jnp.asarray(1.5)
    logvar = get_eps_logvar(sigma_t, sigma_prev, "fixedsmall", s.grid.min_var_coef)
    noise_sigma = jnp.exp(0.5 * logvar) * jnp.sqrt(sigma_prev ** 2 + 1)
    assert float(noise_sigma) < float(sigma_prev)
    x0 = jnp.zeros((1, 2, 2, 3))
    eps = jnp.ones_like(x0)
    xt = x0 + sigma_t * eps
    nz = jnp.zeros_like(x0)
    x_prev = pred_xprev(s, x0, eps, sigma_t, sigma_prev, xt, logvar, nz)
    signal_sigma = float(np.asarray(x_prev).reshape(-1)[0])
    np.testing.assert_allclose(signal_sigma ** 2 + float(noise_sigma) ** 2,
                               float(sigma_prev) ** 2, rtol=1e-5)


@requires_reference
def test_schedule_tables_match_torch_reference(reference_path):
    import torch
    from src.schedulers import Scheduler as TorchScheduler

    for name in ["linear", "quadratic", "cosine", "sigmoid"]:
        ref = TorchScheduler(num_train_timesteps=1000, beta_schedule=name)
        ours = make_noise_schedule(1000, schedule=name)
        # atol 1e-6 absorbs the float32 cos/exp last-ulp differences between
        # torch and numpy on tiny cosine-schedule betas (~1e-5).
        np.testing.assert_allclose(np.asarray(ours.betas), ref.betas.numpy(),
                                   rtol=2e-5, atol=1e-6, err_msg=name)
        np.testing.assert_allclose(np.asarray(ours.sigmas), ref.sigmas.numpy(),
                                   rtol=2e-4, atol=1e-6, err_msg=name)


@requires_reference
def test_sampling_grid_matches_torch_reference(reference_path):
    from src.schedulers import get_sampler as torch_get_sampler

    for style in ["DDIM", "Linear", "EDM"]:
        ref = torch_get_sampler("ddim_simple_orig", 1000, 50, sigma_style=style)
        ours = get_sampler("ddim_simple_orig", 1000, 50, sigma_style=style)
        # Tolerate off-by-one timesteps: searchsorted tie-breaks at the last
        # float32 ulp of the sigma table can flip an index, shifting the tiny
        # tail sigmas to the neighbouring table entry.
        np.testing.assert_allclose(np.asarray(ours.timesteps),
                                   ref.timesteps.numpy().astype(np.float64),
                                   atol=1.0, err_msg=style)
        np.testing.assert_allclose(np.asarray(ours.sampling_sigmas),
                                   ref.sampling_sigmas.numpy(), rtol=5e-3,
                                   atol=5e-3, err_msg=style)


@requires_reference
def test_eps_logvar_matches_torch_reference(reference_path):
    import torch
    from src.schedulers import get_sampler as torch_get_sampler

    for var in ["fixedsmall", "fixedlarge"]:
        ref = torch_get_sampler("ddpm", 1000, 20, sampler_var=var)
        ours = get_sampler("ddpm", 1000, 20, sampler_var=var)
        for i in range(3):
            st = ref.sampling_sigmas[i]
            sp = ref.sampling_sigmas[i + 1]
            ref_lv = ref.get_eps_logvar(st, sp).item()
            our_lv = float(get_eps_logvar(jnp.asarray(st.item()), jnp.asarray(sp.item()),
                                          var, ours.grid.min_var_coef))
            np.testing.assert_allclose(our_lv, ref_lv, rtol=1e-3, err_msg=f"{var} step {i}")


@requires_reference
def test_pred_xprev_step_rules_match_torch(reference_path, monkeypatch):
    """Golden per-sampler step rule: identical (x0, eps, xt, logvar, noise) in,
    identical x_prev out, for every sampler class and eta in {0, 0.85}.
    torch.randn_like is patched to a fixed array so the stochastic branches
    compare exactly."""
    import sys, torch
    sys.path.insert(0, "/root/reference")
    from tests.test_engine import _stub_missing_reference_deps
    _stub_missing_reference_deps()
    import src.schedulers as ref_sched

    rng = np.random.RandomState(0)
    shape = (2, 4, 4, 3)
    x0 = rng.randn(*shape).astype(np.float32)
    eps = rng.randn(*shape).astype(np.float32)
    fixed_noise = rng.randn(*shape).astype(np.float32)
    sig_t, sig_prev = 2.5, 1.3

    monkeypatch.setattr(ref_sched.torch, "randn_like",
                        lambda x: torch.from_numpy(fixed_noise))

    names = ["ddim", "ddim_simple", "ddim_orig", "ddim_simple_orig",
             "ddim_simple_drag", "ddpm", "ddpm_orig", "ge"]
    for name in names:
        for eta in ([1.0] if name.startswith("ddpm") or name == "ge"
                    else [0.0, 0.85]):
            ref = ref_sched.get_sampler(name, 1000, 10, sampler_var="fixedsmall",
                                        eta=eta)
            if hasattr(ref, "reset_state"):
                ref.reset_state()
            ref.i = 0
            ours = get_sampler(name, 1000, 10, sampler_var="fixedsmall", eta=eta)

            st = torch.full((2, 1, 1, 1), sig_t)
            sp = torch.full((2, 1, 1, 1), sig_prev)
            logvar_t = ref.get_eps_logvar(st, sp)
            kwargs = dict(log_variance=logvar_t)
            if name == "ge":
                r = ref.pred_xprev(torch.from_numpy(x0), torch.from_numpy(eps),
                                   st, sp, **kwargs)
            else:
                r = ref.pred_xprev(torch.from_numpy(x0), torch.from_numpy(eps),
                                   st, sp, xt=torch.from_numpy(x0)
                                   + st * torch.from_numpy(eps), **kwargs)
            ref_out = r.numpy()

            sj = jnp.full((2, 1, 1, 1), sig_t)
            spj = jnp.full((2, 1, 1, 1), sig_prev)
            lv = get_eps_logvar(sj, spj, "fixedsmall", ours.grid.min_var_coef,
                                None)
            xt = jnp.asarray(x0) + sj * jnp.asarray(eps)
            out = pred_xprev(ours, jnp.asarray(x0), jnp.asarray(eps), sj, spj,
                             xt, lv, jnp.asarray(fixed_noise),
                             eta=jnp.asarray(eta, jnp.float32),
                             ge_state={"eps_prev": jnp.zeros(shape),
                                       "i": jnp.asarray(0)}
                             if name == "ge" else None)
            if name == "ge":
                out = out[0]
            np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-5,
                                       rtol=1e-4, err_msg=f"{name} eta={eta}")
