"""DhariwalUNet shape + golden parity vs torch reference."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nlc_tpu.models.song_unet import DhariwalUNet, DhariwalUNetConfig, iDDPMPrecond
from nlc_tpu.io.edm_convert import convert_dhariwal_unet
from tests.conftest import requires_reference

SMALL = DhariwalUNetConfig(img_resolution=16, model_channels=64,
                           channel_mult=(1, 2), num_blocks=1,
                           attn_resolutions=(8,), dropout=0.0)


def test_dhariwal_shapes():
    m = DhariwalUNet(SMALL)
    x = jnp.zeros((2, 16, 16, 3))
    nl = jnp.array([3.0, 500.0])
    params = m.init(jax.random.PRNGKey(0), x, nl)
    out = m.apply(params, x, nl)
    assert out.shape == (2, 16, 16, 3)
    feat = m.apply(params, x, nl, method=DhariwalUNet.encode)
    h, w, c = SMALL.feat_shape
    assert feat.shape == (2, h, w, c)


@requires_reference
@pytest.mark.parametrize("label_dim", [0, 10])
def test_dhariwal_matches_torch(reference_path, label_dim):
    import sys, torch
    sys.path.insert(0, "/root/reference")
    from src.edm_networks import DhariwalUNet as TorchD

    torch.manual_seed(0)
    tm = TorchD(img_resolution=16, in_channels=3, out_channels=3,
                label_dim=label_dim, model_channels=64, channel_mult=[1, 2],
                num_blocks=1, attn_resolutions=[8], dropout=0.0).eval()
    cfg = DhariwalUNetConfig(img_resolution=16, model_channels=64,
                             channel_mult=(1, 2), num_blocks=1,
                             attn_resolutions=(8,), dropout=0.0,
                             label_dim=label_dim)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = {"params": convert_dhariwal_unet(sd, cfg)}
    m = DhariwalUNet(cfg)

    x = np.random.RandomState(0).randn(2, 3, 16, 16).astype(np.float32)
    nl = np.array([3.0, 500.0], dtype=np.float32)
    labels = None
    jlabels = None
    if label_dim:
        onehot = np.zeros((2, label_dim), np.float32)
        onehot[0, 3] = 1
        onehot[1, 7] = 1
        labels = torch.from_numpy(onehot)
        jlabels = jnp.asarray(onehot)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x), torch.from_numpy(nl), labels).numpy()
    out = m.apply(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                  jnp.asarray(nl), jlabels)
    np.testing.assert_allclose(np.transpose(np.asarray(out), (0, 3, 1, 2)), ref,
                               atol=5e-4, rtol=1e-3)
