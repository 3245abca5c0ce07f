"""EDM Heun sampler: grid identities + end-to-end golden parity vs the torch
reference's edm_sampler on converted weights."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nlc_tpu.engine.edm import (EDMModelBundle, EDMSamplerConfig, edm_sigma_grid,
                                edm_sampler)
from nlc_tpu.models.song_unet import (SongUNet, SongUNetConfig, EDMSigmaHead,
                                      EDMPrecond)
from nlc_tpu.io.edm_convert import convert_song_unet, convert_edm_sigma_head
from tests.conftest import requires_reference
from tests.test_engine import _stub_missing_reference_deps

CFG = SongUNetConfig(img_resolution=16, model_channels=32, channel_mult=(1, 2),
                     num_blocks=1, attn_resolutions=(8,), dropout=0.0)


def test_sigma_grid():
    cfg = EDMSamplerConfig(num_steps=18)
    g = edm_sigma_grid(cfg)
    assert g.shape == (19,)
    assert g[0] == pytest.approx(80.0)
    assert g[-2] == pytest.approx(0.002)
    assert g[-1] == 0.0
    assert np.all(np.diff(g) < 0)
    lin = edm_sigma_grid(EDMSamplerConfig(num_steps=10, sigma_scheduler="Linear"))
    np.testing.assert_allclose(lin[0], 80.0, rtol=1e-6)


def _setup_pair(seed=0):
    import sys, torch
    sys.path.insert(0, "/root/reference")
    _stub_missing_reference_deps()
    from src.edm_networks import SongUNet as TorchSong, SigmaModel as TorchSigma

    torch.manual_seed(seed)
    tm = TorchSong(img_resolution=16, in_channels=3, out_channels=3,
                   model_channels=32, channel_mult=[1, 2], num_blocks=1,
                   attn_resolutions=[8], dropout=0.0).eval()
    tsig = TorchSigma(dim=8, channels=64, n_blocks=2, out_dim=1, dropout=0.0).eval()
    with torch.no_grad():
        tsig.train()
        for _ in range(2):
            tsig(torch.randn(8, 64, 8, 8))
        tsig.eval()
        # keep the sigma residual small so 'pred'-style trajectories stay
        # bounded (an untrained head multiplies sigma every step, and chaos
        # would drown the comparison)
        tsig.final_mlp.weight.mul_(0.01)
        tsig.final_mlp.bias.fill_(0.05)

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = {"params": convert_song_unet(sd, CFG)}
    ssd = {k: v.detach().numpy() for k, v in tsig.state_dict().items()}
    p, bs = convert_edm_sigma_head(ssd, 8, 64, 2)
    svars = {"params": p, "batch_stats": bs}

    model = SongUNet(CFG)
    head = EDMSigmaHead(dim=8, channels=64, n_blocks=2, dropout=0.0)
    bundle = EDMModelBundle(
        forward=lambda pp, z, t: model.apply(pp, z, t),
        encode=lambda pp, z, t: model.apply(pp, z, t, method=SongUNet.encode),
        sigma=lambda v, f: head.apply(v, f),
        precond=EDMPrecond(sigma_data=0.5),
    )
    return tm, tsig, params, svars, bundle


class _FixedGen:
    """Stand-in for StackedRandomGenerator yielding fixed latents."""
    def __init__(self, latents):
        import torch
        self._l = torch.from_numpy(latents)

    def randn(self, shape, device=None, **kw):
        assert tuple(shape) == tuple(self._l.shape)
        return self._l


@requires_reference
@pytest.mark.parametrize("style,norm_eps,refine,eps_scale", [
    ("base,base", "000", False, 1.0),
    ("pred_partial,pred_partial", "110", True, 1.0),
    ("pred,pred", "100", True, None),
])
def test_edm_sampler_matches_torch(reference_path, style, norm_eps, refine, eps_scale):
    import sys, torch
    sys.path.insert(0, "/root/reference")
    _stub_missing_reference_deps()
    from src.experiments import EDMImageExperiment
    from src.schedulers import get_sampler as torch_get_sampler

    tm, tsig, params, svars, bundle = _setup_pair()
    sch = torch_get_sampler("ddim_simple_orig", 1000, 6)
    exp = EDMImageExperiment(tm, sch, batch_size=2, data_shape=(3, 16, 16),
                             seed=0, device="cpu", save_folder="/tmp",
                             num_timesteps=6)
    exp.set_model(tm, tsig, learn_epsvar=False)
    exp.set_norm_maxmin(-2.0, 14.0)

    latents = np.random.RandomState(5).randn(2, 3, 16, 16).astype(np.float32)
    with torch.no_grad():
        ref = exp.edm_sampler(shape=(2, 3, 16, 16), gen=_FixedGen(latents),
                              style=style, norm_eps=norm_eps,
                              refine_prior_sigma=refine, num_steps=6,
                              sigma_scheduler="EDM", eps_ratio=0.5,
                              eps_scale=eps_scale,
                              use_second_order=True).numpy()

    import math
    dim = 3 * 16 * 16
    cfg = EDMSamplerConfig(num_steps=6, style=style, norm_eps=norm_eps,
                           refine_prior_sigma=refine, eps_ratio=0.5,
                           eps_scale=eps_scale,
                           norm_max=14.0 / math.sqrt(dim),
                           norm_min=-2.0 / math.sqrt(dim))
    lat = jnp.asarray(np.transpose(latents, (0, 2, 3, 1)))
    out = edm_sampler(bundle, cfg, params, svars, jnp.arange(2), (16, 16, 3),
                      latents=lat)
    out_nchw = np.transpose(np.asarray(out), (0, 3, 1, 2))
    # the torch reference runs the loop in float64; our float32 trajectories
    # accumulate ~1% divergence through the sigma_next_c/sigma_next0 ratio at
    # tiny sigmas in the corrected-eps styles
    tol = dict(atol=5e-3, rtol=5e-3) if "pred" not in style else \
        dict(atol=1e-2, rtol=4e-2)
    np.testing.assert_allclose(out_nchw, ref, err_msg=f"{style}/{norm_eps}", **tol)


def test_edm_pred_fast_equals_pred_sigma():
    """'pred_fast' (one fused pass) must be bit-identical to 'pred_sigma'
    (encode + forward) when refine_prior_sigma is off — the fusion changes
    FLOPs, not math. With a random head it must still run finite."""
    import jax
    from nlc_tpu.engine.edm import (EDMModelBundle, EDMSamplerConfig,
                                    edm_sampler)
    from nlc_tpu.models.song_unet import (SongUNet, SongUNetConfig,
                                          EDMSigmaHead, EDMPrecond)

    cfg = SongUNetConfig(img_resolution=16, in_channels=3, out_channels=3,
                         model_channels=16, channel_mult=(1, 2), num_blocks=1,
                         attn_resolutions=(8,), dropout=0.0)
    model = SongUNet(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)),
                        jnp.zeros((1,)))
    d, _, ch = cfg.feat_shape if hasattr(cfg, "feat_shape") else (4, 4, 32)
    head = EDMSigmaHead(dim=d, channels=ch, n_blocks=1)
    feat_shape = (d, d, ch)
    svars = head.init(jax.random.PRNGKey(1), jnp.zeros((1,) + feat_shape))

    bundle = EDMModelBundle(
        forward=lambda p, z, t: model.apply(p, z, t),
        encode=lambda p, z, t: model.apply(p, z, t, method=SongUNet.encode),
        sigma=lambda v, f: head.apply(v, f),
        precond=EDMPrecond(),
        forward_and_encode=lambda p, z, t: model.apply(
            p, z, t, method=SongUNet.forward_and_encode),
    )
    seeds = jnp.arange(2)
    outs = {}
    for style in ["pred_sigma,pred_sigma", "pred_fast,pred_fast", "base,base"]:
        scfg = EDMSamplerConfig(num_steps=4, style=style,
                                refine_prior_sigma=False)
        outs[style] = np.asarray(edm_sampler(bundle, scfg, params, svars,
                                             seeds, (16, 16, 3)))
        assert np.isfinite(outs[style]).all(), style
    np.testing.assert_allclose(outs["pred_fast,pred_fast"],
                               outs["pred_sigma,pred_sigma"], atol=1e-6)
    assert not np.allclose(outs["pred_fast,pred_fast"], outs["base,base"])
