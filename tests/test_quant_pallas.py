"""Fused Pallas int8 conv (ops/quant_pallas.py) vs the taps backend in
interpret mode: the int32 accumulation is identical by construction; the
fused dequant epilogue may differ by 1 ulp of association order."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nlc_tpu.ops.quant import quantize_symmetric, int8_conv
from nlc_tpu.ops.quant_pallas import (int8_conv3x3_pallas,
                                      pallas_conv_applicable)


@pytest.mark.parametrize("hw,cin,cout,batch", [
    (16, 32, 48, 2),
    (8, 16, 16, 1),     # h <= 16: single tile
    (32, 8, 8, 2),      # two 16-tiles
])
def test_pallas_matches_taps_bitwise(hw, cin, cout, batch):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(batch, hw, hw, cin), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, cin, cout) * 0.1, jnp.float32)
    b = jnp.asarray(rng.randn(cout) * 0.1, jnp.float32)

    ref = int8_conv(x, k, b, (1, 1), "SAME", backend="taps",
                    out_dtype=jnp.float32)

    wq, w_scale = quantize_symmetric(k, axis=(0, 1, 2))
    a_scale = jnp.maximum(jnp.max(jnp.abs(x)), 1e-12) / 127.0
    xq = jnp.clip(jnp.round(x / a_scale), -127, 127).astype(jnp.int8)
    out = int8_conv3x3_pallas(xq, wq,
                              (a_scale * w_scale.reshape(-1)).astype(jnp.float32),
                              b, out_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=0)

    # integer-exactness check with a unit epilogue (scale 1, bias 0): any
    # accumulation mismatch would show as >= 1.0
    ones = jnp.ones((wq.shape[-1],), jnp.float32)
    zeros = jnp.zeros((wq.shape[-1],), jnp.float32)
    acc_p = int8_conv3x3_pallas(xq, wq, ones, zeros, out_dtype=jnp.float32,
                                interpret=True)
    from jax import lax
    acc_ref = lax.conv_general_dilated(
        xq, wq, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    np.testing.assert_array_equal(np.asarray(acc_p),
                                  np.asarray(acc_ref).astype(np.float32))


def test_pallas_backend_dispatch():
    """backend='pallas' routes hot shapes through the kernel and falls back
    to taps elsewhere; both agree with the fp32 conv within quant error."""
    rng = np.random.RandomState(1)
    from jax import lax
    for strides, hw in (((1, 1), 16), ((2, 2), 16)):
        x = jnp.asarray(rng.randn(2, hw, hw, 16), jnp.float32)
        k = jnp.asarray(rng.randn(3, 3, 16, 16) * 0.1, jnp.float32)
        applicable = pallas_conv_applicable(x.shape, k.shape, strides, "SAME")
        assert applicable == (strides == (1, 1))
        if not applicable:
            y = int8_conv(x, k, None, strides, "SAME", backend="pallas",
                          out_dtype=jnp.float32)   # falls back to taps
            ref = int8_conv(x, k, None, strides, "SAME", backend="taps",
                            out_dtype=jnp.float32)
            np.testing.assert_array_equal(np.asarray(y), np.asarray(ref))


def test_pallas_applicability_rules():
    assert pallas_conv_applicable((1, 64, 64, 8), (3, 3, 8, 8), (1, 1), "SAME")
    assert pallas_conv_applicable((1, 8, 8, 8), (3, 3, 8, 8), (1, 1),
                                  [(1, 1), (1, 1)])
    assert not pallas_conv_applicable((1, 64, 64, 8), (3, 3, 8, 8), (2, 2),
                                      "SAME")
    assert not pallas_conv_applicable((1, 64, 64, 8), (1, 1, 8, 8), (1, 1),
                                      "SAME")
    assert not pallas_conv_applicable((1, 24, 24, 8), (3, 3, 8, 8), (1, 1),
                                      "SAME")     # 24 % 16 != 0
