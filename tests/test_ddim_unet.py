"""Shape tests + torch-reference golden parity for the DDIM UNet and sigma head."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nlc_tpu.models.ddim_unet import DDIMUNet, DDIMUNetConfig
from nlc_tpu.models.sigma_head import SigmaHead, SigmaHeadConfig
from nlc_tpu.io.torch_convert import convert_ddim_unet, convert_sigma_head
from tests.conftest import requires_reference

SMALL = DDIMUNetConfig(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
                       attn_resolutions=(8,), in_channels=3, resolution=16)


def test_unet_shapes_and_methods():
    model = DDIMUNet(SMALL)
    x = jnp.zeros((2, 16, 16, 3))
    t = jnp.array([10, 500])
    params = model.init(jax.random.PRNGKey(0), x, t)
    eps = model.apply(params, x, t)
    assert eps.shape == (2, 16, 16, 3)
    feat = model.apply(params, x, t, method=DDIMUNet.encode)
    h, w, c = SMALL.feat_shape
    assert feat.shape == (2, h, w, c)
    eps2, feat2 = model.apply(params, x, t, method=DDIMUNet.forward_and_encode)
    np.testing.assert_allclose(np.asarray(eps), np.asarray(eps2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(feat), np.asarray(feat2), atol=1e-5)


def test_sigma_head_shapes():
    cfg = SigmaHeadConfig(dim=8, channels=64, n_blocks=2)
    head = SigmaHead(cfg)
    feat = jnp.zeros((2, 8, 8, 64))
    variables = head.init(jax.random.PRNGKey(0), feat)
    out = head.apply(variables, feat)
    assert out.shape == (2, 1, 1, 1)


def _torch_config(py_cfg):
    """Build the namespace config the torch reference Model expects."""
    import types

    model = types.SimpleNamespace(
        ch=py_cfg.ch, out_ch=py_cfg.out_ch, ch_mult=list(py_cfg.ch_mult),
        num_res_blocks=py_cfg.num_res_blocks, attn_resolutions=list(py_cfg.attn_resolutions),
        dropout=py_cfg.dropout, in_channels=py_cfg.in_channels,
        resamp_with_conv=py_cfg.resamp_with_conv, type="simple",
        feat_layer=py_cfg.feat_layer, sigma_block=2, sigma_dropout=0.0,
    )
    data = types.SimpleNamespace(image_size=py_cfg.resolution)
    diffusion = types.SimpleNamespace(num_diffusion_timesteps=1000)
    return types.SimpleNamespace(model=model, data=data, diffusion=diffusion)


@requires_reference
def test_ddim_unet_matches_torch_reference(reference_path):
    import torch
    from src.unet_simple import Model as TorchModel

    torch.manual_seed(0)
    tm = TorchModel(_torch_config(SMALL)).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = {"params": convert_ddim_unet(sd, SMALL)}

    model = DDIMUNet(SMALL)
    x = np.random.RandomState(0).randn(2, 3, 16, 16).astype(np.float32)
    t = np.array([17, 503], dtype=np.int64)
    with torch.no_grad():
        ref_eps = tm(torch.from_numpy(x), torch.from_numpy(t)).numpy()
        ref_feat = tm.encode(torch.from_numpy(x), torch.from_numpy(t)).numpy()

    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    eps = model.apply(params, x_nhwc, jnp.asarray(t))
    feat = model.apply(params, x_nhwc, jnp.asarray(t), method=DDIMUNet.encode)

    np.testing.assert_allclose(np.transpose(np.asarray(eps), (0, 3, 1, 2)), ref_eps,
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.transpose(np.asarray(feat), (0, 3, 1, 2)), ref_feat,
                               atol=2e-4, rtol=1e-3)


@requires_reference
def test_sigma_head_matches_torch_reference(reference_path):
    import torch
    from src.unet_simple import SigmaModel as TorchSigma

    torch.manual_seed(1)
    cfg = SigmaHeadConfig(dim=7, channels=64, n_blocks=2, dropout=0.0)
    tm = TorchSigma(dim=cfg.dim, channels=cfg.channels, n_blocks=cfg.n_blocks,
                    out_dim=1, dropout=0.0).eval()
    # run a forward in train mode first so BatchNorm stats are non-trivial
    with torch.no_grad():
        tm.train()
        for _ in range(3):
            tm(torch.randn(8, cfg.channels, cfg.dim, cfg.dim))
        tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params, batch_stats = convert_sigma_head(sd, cfg)

    head = SigmaHead(cfg)
    feat = np.random.RandomState(2).randn(4, cfg.channels, cfg.dim, cfg.dim).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(feat)).numpy()
    ours = head.apply({"params": params, "batch_stats": batch_stats},
                      jnp.asarray(np.transpose(feat, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(ours).reshape(-1), ref.reshape(-1),
                               atol=2e-4, rtol=1e-3)
