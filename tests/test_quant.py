"""Int8 quantized convolution: correctness of both backends
(ops/quant.py) against the fp32 reference conv."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from nlc_tpu.ops.quant import quantize_symmetric, int8_conv, QuantConv


def _ref_conv(x, k, b, strides=(1, 1), padding="SAME"):
    y = lax.conv_general_dilated(x, k, strides, padding,
                                 dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b.reshape(1, 1, 1, -1) if b is not None else y


def test_quantize_symmetric_round_trip():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 8, 8, 16), jnp.float32)
    q, s = quantize_symmetric(x)
    assert q.dtype == jnp.int8
    np.testing.assert_allclose(np.asarray(q) * np.asarray(s), np.asarray(x),
                               atol=float(np.abs(x).max()) / 127 * 0.51)
    # per-channel: one scale per output channel of an HWIO kernel
    k = jnp.asarray(rng.randn(3, 3, 16, 32) * np.linspace(0.01, 2, 32),
                    jnp.float32)
    qk, sk = quantize_symmetric(k, axis=(0, 1, 2))
    assert sk.shape == (1, 1, 1, 32)
    err = np.abs(np.asarray(qk) * np.asarray(sk) - np.asarray(k))
    assert (err <= np.asarray(sk) * 0.51).all()


@pytest.mark.parametrize("strides,padding,hw,cin,cout,ksz", [
    ((1, 1), "SAME", 16, 32, 48, 3),
    ((2, 2), "SAME", 16, 32, 32, 3),
    ((1, 1), "VALID", 12, 16, 16, 3),
    ((1, 1), "SAME", 16, 32, 32, 1),
    ((1, 1), [(1, 1), (1, 1)], 10, 8, 8, 3),
])
def test_backends_agree_exactly_and_match_fp32(strides, padding, hw, cin,
                                               cout, ksz):
    """'taps' and 'conv' run the same integer arithmetic -> bit-identical;
    both approximate the fp32 conv within the quantization error bound."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, hw, hw, cin), jnp.float32)
    k = jnp.asarray(rng.randn(ksz, ksz, cin, cout) * 0.1, jnp.float32)
    b = jnp.asarray(rng.randn(cout) * 0.1, jnp.float32)

    y_taps = int8_conv(x, k, b, strides, padding, backend="taps",
                       out_dtype=jnp.float32)
    y_conv = int8_conv(x, k, b, strides, padding, backend="conv",
                       out_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(y_taps), np.asarray(y_conv))

    ref = _ref_conv(x, k, b, strides, padding)
    assert y_taps.shape == ref.shape
    # error bound: |sum of cin*k*k products| each off by <= .5 ulp of the two
    # scales; empirically well under 2% relative on randn inputs
    denom = float(np.abs(np.asarray(ref)).mean())
    err = float(np.abs(np.asarray(y_taps) - np.asarray(ref)).mean())
    assert err / denom < 0.02, (err, denom)


def test_quant_conv_module_param_layout():
    """QuantConv exposes the same {kernel, bias} params as nn.Conv so
    converted torch checkpoints drop in unchanged."""
    import flax.linen as nn
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 8, 8, 16), jnp.float32)
    qc = QuantConv(24, (3, 3), padding=1, dtype=jnp.float32)
    params = qc.init(jax.random.PRNGKey(0), x)
    ref = nn.Conv(24, (3, 3), padding=1)
    ref_params = ref.init(jax.random.PRNGKey(0), x)
    ref_shapes = jax.tree_util.tree_map(jnp.shape, ref_params)
    q_shapes = jax.tree_util.tree_map(jnp.shape, params)
    assert ref_shapes == q_shapes

    # loading the same weights produces the quantized version of nn.Conv
    y_q = qc.apply(ref_params, x)
    y_f = ref.apply(ref_params, x)
    denom = float(np.abs(np.asarray(y_f)).mean())
    assert float(np.abs(np.asarray(y_q) - np.asarray(y_f)).mean()) / denom < 0.02


def test_quantized_adm_unet_drop_in():
    """ADMUNetConfig(quant_backend=...) keeps the param tree identical to the
    full-precision model (same converted checkpoints load) and its forward
    tracks the fp32 forward within quantization error."""
    from nlc_tpu.models.adm_unet import ADMUNet, ADMUNetConfig

    base = dict(image_size=16, model_channels=32, out_channels=3,
                num_res_blocks=1, attention_resolutions=(4,),
                channel_mult=(1, 2), num_heads=2, use_scale_shift_norm=True,
                resblock_updown=True, feat_layer=1)
    cfg_fp = ADMUNetConfig(**base)
    cfg_q = ADMUNetConfig(**base, quant_backend="taps")
    m_fp = ADMUNet(cfg_fp)
    m_q = ADMUNet(cfg_q)

    x = jnp.asarray(np.random.RandomState(5).randn(2, 16, 16, 3), jnp.float32)
    t = jnp.asarray([10.0, 500.0])
    params = m_fp.init(jax.random.PRNGKey(0), x, t)
    shapes_fp = jax.tree_util.tree_map(jnp.shape, params)
    shapes_q = jax.tree_util.tree_map(
        jnp.shape, m_q.init(jax.random.PRNGKey(0), x, t))
    assert shapes_fp == shapes_q

    y_fp = m_fp.apply(params, x, t)
    y_q = m_q.apply(params, x, t)
    assert y_q.shape == y_fp.shape
    # zero-init out convs make fresh-init outputs tiny; compare against the
    # activation scale rather than the output scale
    denom = max(float(np.abs(np.asarray(y_fp)).max()), 1e-3)
    err = float(np.abs(np.asarray(y_q) - np.asarray(y_fp)).max())
    assert err / denom < 0.15, (err, denom)


def test_quantized_ddim_unet_drop_in():
    """Same drop-in property for the DDIM backbone."""
    from nlc_tpu.models.ddim_unet import DDIMUNet, DDIMUNetConfig

    base = dict(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
                attn_resolutions=(8,), resolution=16)
    m_fp = DDIMUNet(DDIMUNetConfig(**base))
    m_q = DDIMUNet(DDIMUNetConfig(**base, quant_backend="taps"))

    x = jnp.asarray(np.random.RandomState(6).randn(2, 16, 16, 3), jnp.float32)
    t = jnp.asarray([10.0, 500.0])
    params = m_fp.init(jax.random.PRNGKey(0), x, t)
    assert jax.tree_util.tree_map(jnp.shape, params) == \
        jax.tree_util.tree_map(jnp.shape, m_q.init(jax.random.PRNGKey(0), x, t))
    y_fp = m_fp.apply(params, x, t)
    y_q = m_q.apply(params, x, t)
    denom = max(float(np.abs(np.asarray(y_fp)).max()), 1e-3)
    err = float(np.abs(np.asarray(y_q) - np.asarray(y_fp)).max())
    assert err / denom < 0.15, (err, denom)


def test_int8_conv_under_jit_and_scan():
    """The weight quantization is loop-invariant: int8_conv inside lax.scan
    compiles and matches the unrolled result (the sampling-loop deployment
    shape)."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 8, 8, 16), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 16, 16) * 0.1, jnp.float32)

    @jax.jit
    def run(x, k):
        def body(h, _):
            return jnp.tanh(int8_conv(h, k, None, out_dtype=jnp.float32)), None
        out, _ = lax.scan(body, x, None, length=3)
        return out

    out = run(x, k)
    h = x
    for _ in range(3):
        h = jnp.tanh(int8_conv(h, k, None, out_dtype=jnp.float32))
    np.testing.assert_allclose(np.asarray(out), np.asarray(h), atol=1e-6)
