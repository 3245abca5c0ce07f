"""Fused GroupNorm+SiLU+conv3x3 kernel (ops/norm_conv_pallas.py) vs the
identical-math XLA oracle, in Pallas interpret mode on CPU."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nlc_tpu.ops.norm_conv_pallas import (fused_groupnorm_silu_conv,
                                          fused_norm_conv_applicable,
                                          reference_groupnorm_silu_conv)


def _mk(shape, co, seed=0):
    rng = np.random.RandomState(seed)
    n, h, w, c = shape
    return (jnp.asarray(rng.randn(*shape).astype(np.float32), jnp.bfloat16),
            jnp.asarray(rng.uniform(0.5, 1.5, c).astype(np.float32)),
            jnp.asarray(rng.randn(c).astype(np.float32) * 0.1),
            jnp.asarray(rng.randn(3, 3, c, co).astype(np.float32) * 0.05),
            jnp.asarray(rng.randn(co).astype(np.float32) * 0.1),
            jnp.asarray(rng.randn(n, c).astype(np.float32) * 0.1),
            jnp.asarray(rng.randn(n, c).astype(np.float32) * 0.1))


@pytest.mark.parametrize("shape,co", [
    ((1, 16, 16, 128), 256),   # single row tile (halo rows both synthetic)
    ((2, 32, 32, 128), 128),   # two tiles (first/last, no interior)
    ((1, 64, 16, 128), 128),   # >2 tiles (interior halo DMA path)
])
def test_fused_norm_conv_matches_oracle(shape, co):
    x, gamma, beta, w, bias, fs, fh = _mk(shape, co)
    ref = reference_groupnorm_silu_conv(x, gamma, beta, w, bias,
                                        film_scale=fs, film_shift=fh)
    out = fused_groupnorm_silu_conv(x, gamma, beta, w, bias, film_scale=fs,
                                    film_shift=fh, interpret=True)
    d = np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32))
    # both paths accumulate fp32 and round once to bf16; differences are
    # reduction-order ulps
    assert float(d.max()) < 2e-2, float(d.max())
    assert float(d.mean()) < 1e-4, float(d.mean())


def test_fused_norm_conv_no_film_no_act():
    x, gamma, beta, w, bias, _, _ = _mk((1, 16, 16, 128), 128, seed=3)
    ref = reference_groupnorm_silu_conv(x, gamma, beta, w, None, act=None)
    out = fused_groupnorm_silu_conv(x, gamma, beta, w, None, act=None,
                                    interpret=True)
    d = np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32))
    assert float(d.max()) < 2e-2, float(d.max())


def test_applicability_gate():
    assert fused_norm_conv_applicable((1, 256, 256, 256), 32, 256)
    assert fused_norm_conv_applicable((1, 128, 128, 512), 32, 512)
    assert not fused_norm_conv_applicable((1, 16, 16, 96), 32, 128)  # c%128
