"""Fused GroupNorm(+FiLM)+SiLU(+int8) kernel — correctness vs the unfused
reference composition (models/layers.py GroupNorm + swish), Pallas interpret
mode vs the XLA reference math, quant-scale validity/tightness, gradients.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nlc_tpu.ops.groupnorm_pallas import (
    SILU_MIN, _quant_scale_from_ranges, _silu, _stats_pallas,
    _stats_reference, fused_groupnorm_act, pallas_groupnorm_applicable)


def _unfused(x, gamma, beta, num_groups, eps, film_scale=None,
             film_shift=None, act="silu"):
    """The existing composition in ADMResBlock (models/adm_unet.py:61-68):
    fp32 GroupNorm -> *(1+scale)+shift -> swish."""
    n, h, w, c = x.shape
    g = min(num_groups, c)
    xg = x.reshape(n, h, w, g, c // g).astype(jnp.float32)
    mean = xg.mean(axis=(1, 2, 4), keepdims=True)
    var = xg.var(axis=(1, 2, 4), keepdims=True)
    xn = ((xg - mean) * jax.lax.rsqrt(var + eps)).reshape(x.shape)
    y = xn * gamma + beta
    if film_scale is not None:
        y = y * (1.0 + film_scale[:, None, None, :])
    if film_shift is not None:
        y = y + film_shift[:, None, None, :]
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    return y


def _rand(key, shape, loc=0.0, scale=1.0, dtype=jnp.float32):
    return (loc + scale * jax.random.normal(key, shape)).astype(dtype)


@pytest.mark.parametrize("film", [False, True])
@pytest.mark.parametrize("act", ["silu", None])
def test_fused_matches_unfused_fp32(film, act):
    k = jax.random.split(jax.random.PRNGKey(0), 5)
    n, h, w, c, g = 2, 8, 8, 128, 32
    x = _rand(k[0], (n, h, w, c), loc=0.7, scale=2.0)
    gamma = _rand(k[1], (c,), loc=1.0, scale=0.2)
    beta = _rand(k[2], (c,), scale=0.3)
    fs = _rand(k[3], (n, c), scale=0.5) if film else None
    fh = _rand(k[4], (n, c), scale=0.5) if film else None
    got = fused_groupnorm_act(x, gamma, beta, num_groups=g, eps=1e-5,
                              film_scale=fs, film_shift=fh, act=act)
    want = _unfused(x, gamma, beta, g, 1e-5, fs, fh, act)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_fused_bf16_close_to_fp32_reference():
    k = jax.random.split(jax.random.PRNGKey(1), 3)
    n, h, w, c, g = 2, 16, 16, 256, 32
    x32 = _rand(k[0], (n, h, w, c), loc=-0.3, scale=3.0)
    gamma = _rand(k[1], (c,), loc=1.0, scale=0.1)
    beta = _rand(k[2], (c,), scale=0.2)
    got = fused_groupnorm_act(x32.astype(jnp.bfloat16), gamma, beta,
                              num_groups=g, eps=1e-5)
    want = _unfused(x32.astype(jnp.bfloat16), gamma, beta, g, 1e-5)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=0.05, atol=0.05)


def test_pallas_interpret_matches_reference_math():
    """The Pallas kernels (interpret mode) vs the XLA reference on the same
    inputs — stats and the full fused output."""
    k = jax.random.split(jax.random.PRNGKey(2), 3)
    n, h, w, c, g = 2, 16, 8, 128, 32
    x = _rand(k[0], (n, h, w, c), loc=0.5, scale=1.5, dtype=jnp.bfloat16)
    gamma = _rand(k[1], (c,), loc=1.0, scale=0.1)
    beta = _rand(k[2], (c,), scale=0.2)
    assert pallas_groupnorm_applicable(x.shape, g)

    s_p, m2_p, mn_p, mx_p = _stats_pallas(x, interpret=True)
    s_r, m2_r, mn_r, mx_r = _stats_reference(x, g)
    np.testing.assert_allclose(np.asarray(s_p), np.asarray(s_r), rtol=1e-5)
    # Chan tile-combine vs direct two-pass: rounding-order differences only
    np.testing.assert_allclose(np.asarray(m2_p), np.asarray(m2_r), rtol=3e-5)
    np.testing.assert_array_equal(np.asarray(mn_p), np.asarray(mn_r))
    np.testing.assert_array_equal(np.asarray(mx_p), np.asarray(mx_r))

    got = fused_groupnorm_act(x, gamma, beta, num_groups=g, interpret=True)
    want = fused_groupnorm_act(x, gamma, beta, num_groups=g)  # XLA ref (CPU)
    # bf16 outputs: boundary cases may round 1 ulp apart between the
    # interpreted kernel and the XLA fusion (ulp at 1.0 = 2^-7)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_large_mean_no_cancellation():
    """Regression: mean >> std inputs must not lose variance accuracy (the
    one-pass sumsq/n - mean^2 form drifted the 50-step preset goldens)."""
    k = jax.random.split(jax.random.PRNGKey(7), 3)
    n, h, w, c, g = 2, 16, 16, 128, 32
    x = _rand(k[0], (n, h, w, c), loc=300.0, scale=0.5)
    gamma = _rand(k[1], (c,), loc=1.0, scale=0.1)
    beta = _rand(k[2], (c,), scale=0.2)
    for interp in (False, True):
        got = fused_groupnorm_act(x, gamma, beta, num_groups=g,
                                  interpret=interp)
        want = _unfused(x, gamma, beta, g, 1e-5)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-3, atol=1e-3)


def test_quant_scale_valid_and_tight():
    """scale must cover the true absmax (no clipping beyond rounding) and be
    within the interior-minimum slack of it."""
    k = jax.random.split(jax.random.PRNGKey(3), 3)
    n, h, w, c, g = 3, 8, 8, 128, 32
    x = _rand(k[0], (n, h, w, c), loc=0.2, scale=2.5)
    gamma = _rand(k[1], (c,), loc=1.0, scale=0.3)
    beta = _rand(k[2], (c,), scale=0.5)
    q, a_scale = fused_groupnorm_act(x, gamma, beta, num_groups=g, quant=True)
    assert q.dtype == jnp.int8 and a_scale.shape == (n,)
    y_true = _unfused(x, gamma, beta, g, 1e-5)
    true_absmax = np.abs(np.asarray(y_true)).reshape(n, -1).max(axis=1)
    scale = np.asarray(a_scale)
    assert (scale * 127.0 >= true_absmax - 1e-5).all()
    # tight: within the interior-minimum slack (<= SILU_MIN absolute)
    assert (scale * 127.0 <= true_absmax + SILU_MIN + 1e-5).all()
    # dequantized output within half-step of the reference
    deq = np.asarray(q, np.float32) * scale[:, None, None, None]
    assert np.abs(deq - np.asarray(y_true)).max() <= 0.51 * scale.max() + 1e-5


def test_quant_pallas_interpret_matches_reference():
    k = jax.random.split(jax.random.PRNGKey(4), 3)
    n, h, w, c, g = 2, 8, 8, 128, 32
    x = _rand(k[0], (n, h, w, c), scale=2.0, dtype=jnp.bfloat16)
    gamma = _rand(k[1], (c,), loc=1.0, scale=0.1)
    beta = _rand(k[2], (c,), scale=0.2)
    q_p, s_p = fused_groupnorm_act(x, gamma, beta, num_groups=g, quant=True,
                                   interpret=True)
    q_r, s_r = fused_groupnorm_act(x, gamma, beta, num_groups=g, quant=True)
    np.testing.assert_allclose(np.asarray(s_p), np.asarray(s_r), rtol=1e-5)
    # integer outputs may differ by 1 ulp at rounding boundaries across
    # compilation contexts (same caveat as ops/quant.py backends)
    diff = np.abs(np.asarray(q_p, np.int32) - np.asarray(q_r, np.int32))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.01


def test_silu_interval_absmax_interior_case():
    """A channel whose z-range straddles the silu minimum must include it."""
    a = jnp.array([[1.0]])
    b = jnp.array([[0.0]])
    mn = jnp.array([[-3.0]])
    mx = jnp.array([[0.5]])   # silu(0.5)=0.31 > |silu(-3)|=0.142; interior
    s = _quant_scale_from_ranges(a, b, mn, mx, "silu")
    assert float(s[0]) * 127.0 >= float(_silu(jnp.array(0.5))) - 1e-6
    mx2 = jnp.array([[0.1]])  # now the interior min dominates
    s2 = _quant_scale_from_ranges(a, b, mn, mx2, "silu")
    np.testing.assert_allclose(float(s2[0]) * 127.0, SILU_MIN, rtol=1e-4)


def test_gradients_match_unfused():
    k = jax.random.split(jax.random.PRNGKey(5), 5)
    n, h, w, c, g = 2, 8, 8, 128, 32
    x = _rand(k[0], (n, h, w, c), scale=1.5)
    gamma = _rand(k[1], (c,), loc=1.0, scale=0.1)
    beta = _rand(k[2], (c,), scale=0.2)
    fs = _rand(k[3], (n, c), scale=0.3)
    fh = _rand(k[4], (n, c), scale=0.3)
    w_out = _rand(jax.random.PRNGKey(6), (n, h, w, c))

    def loss_fused(x_, g_, b_, fs_, fh_):
        y = fused_groupnorm_act(x_, g_, b_, num_groups=g, film_scale=fs_,
                                film_shift=fh_)
        return jnp.sum(y * w_out)

    def loss_ref(x_, g_, b_, fs_, fh_):
        return jnp.sum(_unfused(x_, g_, b_, g, 1e-5, fs_, fh_) * w_out)

    got = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, gamma, beta, fs, fh)
    want = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, gamma, beta, fs, fh)
    for ga, wa in zip(got, want):
        np.testing.assert_allclose(np.asarray(ga), np.asarray(wa),
                                   rtol=2e-3, atol=2e-3)


def test_applicability_gate():
    assert not pallas_groupnorm_applicable((1, 8, 8, 96), 32)   # C % 128
    assert pallas_groupnorm_applicable((1, 9, 8, 128), 32)      # th = H = 9
    # prime H too big for one tile and indivisible by the tile candidates
    assert not pallas_groupnorm_applicable((1, 514, 256, 512), 32)
    assert pallas_groupnorm_applicable((1, 256, 256, 256), 32)
