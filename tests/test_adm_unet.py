"""ADM UNet shape tests + golden parity vs the torch reference."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nlc_tpu.models.adm_unet import ADMUNet, ADMUNetConfig, ADMSigmaHead
from nlc_tpu.io.adm_convert import convert_adm_unet, convert_adm_sigma_head
from tests.conftest import requires_reference

SMALL = ADMUNetConfig(image_size=16, model_channels=32, out_channels=6,
                      num_res_blocks=1, attention_resolutions=(2,),
                      channel_mult=(1, 2), num_heads=2,
                      use_scale_shift_norm=True, resblock_updown=False)


def test_adm_shapes_learned_variance():
    m = ADMUNet(SMALL)
    x = jnp.zeros((2, 16, 16, 3))
    t = jnp.array([3., 500.])
    params = m.init(jax.random.PRNGKey(0), x, t)
    out = m.apply(params, x, t)
    assert out.shape == (2, 16, 16, 6)
    feat = m.apply(params, x, t, method=ADMUNet.encode)
    h, w, c = SMALL.feat_shape
    assert feat.shape == (2, h, w, c)
    out2, feat2 = m.apply(params, x, t, method=ADMUNet.forward_and_encode)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(feat), np.asarray(feat2), atol=1e-5)


def test_adm_class_conditional():
    cfg = ADMUNetConfig(image_size=16, model_channels=32, out_channels=3,
                        num_res_blocks=1, attention_resolutions=(2,),
                        channel_mult=(1, 2), num_classes=10)
    m = ADMUNet(cfg)
    x = jnp.zeros((2, 16, 16, 3))
    t = jnp.array([3., 500.])
    y = jnp.array([1, 7])
    params = m.init(jax.random.PRNGKey(0), x, t, y)
    out = m.apply(params, x, t, y)
    assert out.shape == (2, 16, 16, 3)


def _make_torch(cfg, seed=0, resblock_updown=False, new_order=False):
    import torch, sys
    sys.path.insert(0, "/root/reference")
    from src.unet_adm import UNetModel
    torch.manual_seed(seed)
    return UNetModel(
        image_size=cfg.image_size, in_channels=3, model_channels=cfg.model_channels,
        out_channels=cfg.out_channels, num_res_blocks=cfg.num_res_blocks,
        attention_resolutions=cfg.attention_resolutions, dropout=0.0,
        channel_mult=cfg.channel_mult, num_classes=None, use_checkpoint=False,
        use_fp16=False, num_heads=cfg.num_heads,
        num_head_channels=cfg.num_head_channels, num_heads_upsample=-1,
        use_scale_shift_norm=cfg.use_scale_shift_norm,
        resblock_updown=resblock_updown, use_new_attention_order=new_order,
        feat_layer=cfg.feat_layer).eval()


@requires_reference
@pytest.mark.parametrize("updown,new_order,ssn", [
    (False, False, True), (True, True, True), (False, True, False)])
def test_adm_matches_torch_reference(reference_path, updown, new_order, ssn):
    import torch
    cfg = ADMUNetConfig(image_size=16, model_channels=32, out_channels=6,
                        num_res_blocks=1, attention_resolutions=(2,),
                        channel_mult=(1, 2), num_heads=2,
                        use_scale_shift_norm=ssn, resblock_updown=updown,
                        use_new_attention_order=new_order)
    tm = _make_torch(cfg, resblock_updown=updown, new_order=new_order)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = {"params": convert_adm_unet(sd, cfg)}
    m = ADMUNet(cfg)

    x = np.random.RandomState(0).randn(2, 3, 16, 16).astype(np.float32)
    t = np.array([17, 503], dtype=np.int64)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x), torch.from_numpy(t)).numpy()
        ref_feat = tm.encode(torch.from_numpy(x), torch.from_numpy(t)).numpy()
    out = m.apply(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), jnp.asarray(t))
    feat = m.apply(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), jnp.asarray(t),
                   method=ADMUNet.encode)
    np.testing.assert_allclose(np.transpose(np.asarray(out), (0, 3, 1, 2)), ref,
                               atol=3e-4, rtol=1e-3)
    np.testing.assert_allclose(np.transpose(np.asarray(feat), (0, 3, 1, 2)), ref_feat,
                               atol=3e-4, rtol=1e-3)


@requires_reference
def test_adm_sigma_head_matches_torch(reference_path):
    import torch, sys
    sys.path.insert(0, "/root/reference")
    from src.unet_adm import SigmaModel as TorchSigma

    torch.manual_seed(2)
    dim, channels = 7, 64
    tm = TorchSigma(dim=dim, channels=channels, n_blocks=2, out_dim=1, dropout=0.0,
                    num_heads=2).eval()
    with torch.no_grad():
        tm.train()
        for _ in range(2):
            tm(torch.randn(8, channels, dim, dim))
        tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    p, bs = convert_adm_sigma_head(sd, dim, channels, 2)
    head = ADMSigmaHead(dim=dim, channels=channels, n_blocks=2, dropout=0.0,
                        num_heads=2)
    feat = np.random.RandomState(1).randn(4, channels, dim, dim).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(feat)).numpy()
    ours = head.apply({"params": p, "batch_stats": bs},
                      jnp.asarray(np.transpose(feat, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(ours).reshape(-1), ref.reshape(-1),
                               atol=3e-4, rtol=1e-3)


@requires_reference
def test_superres_matches_torch(reference_path):
    """Golden: SuperResModel (low-res conditioned UNet) vs torch, including
    the bilinear upsample semantics (align_corners=False)."""
    import sys, torch
    sys.path.insert(0, "/root/reference")
    from tests.test_engine import _stub_missing_reference_deps
    _stub_missing_reference_deps()
    from src.unet_adm import SuperResModel as TorchSR
    from nlc_tpu.models.adm_unet import SuperResADMUNet, ADMUNetConfig
    from nlc_tpu.io.adm_convert import convert_adm_unet

    torch.manual_seed(0)
    tm = TorchSR(image_size=16, in_channels=3, model_channels=32,
                 out_channels=3, num_res_blocks=1, attention_resolutions=(2,),
                 channel_mult=(1, 2), num_head_channels=16,
                 use_scale_shift_norm=True, resblock_updown=True).eval()
    cfg = ADMUNetConfig(image_size=16, in_channels=6, model_channels=32,
                        out_channels=3, num_res_blocks=1,
                        attention_resolutions=(2,), channel_mult=(1, 2),
                        num_head_channels=16, use_scale_shift_norm=True,
                        resblock_updown=True)
    net = SuperResADMUNet(cfg)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params = {"params": {"unet": convert_adm_unet(sd, cfg)}}

    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 16, 16).astype(np.float32)
    lr = rng.randn(2, 3, 4, 4).astype(np.float32)
    ts = np.array([3.0, 700.0], np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x), torch.from_numpy(ts),
                 low_res=torch.from_numpy(lr)).numpy()
    got = net.apply(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                    jnp.asarray(ts), jnp.asarray(np.transpose(lr, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)),
                               ref, atol=2e-4, rtol=1e-3)
