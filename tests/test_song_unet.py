"""SongUNet / EDM precond / EDM sigma head: shapes + torch golden parity,
plus persistence-pickle round trip."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nlc_tpu.models.song_unet import (SongUNet, SongUNetConfig, EDMSigmaHead,
                                      EDMPrecond, VPPrecond, VEPrecond, iDDPMPrecond)
from nlc_tpu.io.edm_convert import convert_song_unet, convert_edm_sigma_head
from tests.conftest import requires_reference

SMALL = SongUNetConfig(img_resolution=16, in_channels=3, out_channels=3,
                       model_channels=32, channel_mult=(1, 2), num_blocks=1,
                       attn_resolutions=(8,), dropout=0.0)


def test_song_unet_shapes():
    m = SongUNet(SMALL)
    x = jnp.zeros((2, 16, 16, 3))
    nl = jnp.array([0.5, -1.0])
    params = m.init(jax.random.PRNGKey(0), x, nl)
    out = m.apply(params, x, nl)
    assert out.shape == (2, 16, 16, 3)
    feat = m.apply(params, x, nl, method=SongUNet.encode)
    h, w, c = SMALL.feat_shape
    assert feat.shape == (2, h, w, c)


def _torch_song(cfg, seed=0, **over):
    import torch, sys
    sys.path.insert(0, "/root/reference")
    from src.edm_networks import SongUNet as TorchSong
    torch.manual_seed(seed)
    kw = dict(img_resolution=cfg.img_resolution, in_channels=3, out_channels=3,
              label_dim=cfg.label_dim, augment_dim=cfg.augment_dim,
              model_channels=cfg.model_channels, channel_mult=list(cfg.channel_mult),
              channel_mult_emb=cfg.channel_mult_emb, num_blocks=cfg.num_blocks,
              attn_resolutions=list(cfg.attn_resolutions), dropout=0.0,
              embedding_type=cfg.embedding_type,
              channel_mult_noise=cfg.channel_mult_noise,
              encoder_type=cfg.encoder_type, decoder_type=cfg.decoder_type,
              resample_filter=list(cfg.resample_filter))
    kw.update(over)
    return TorchSong(**kw).eval()


@requires_reference
@pytest.mark.parametrize("enc,dec,embed,filt", [
    ("standard", "standard", "positional", (1, 1)),
    ("residual", "standard", "fourier", (1, 3, 3, 1)),
    ("skip", "skip", "positional", (1, 1)),
])
def test_song_unet_matches_torch(reference_path, enc, dec, embed, filt):
    import torch
    cfg = SongUNetConfig(img_resolution=16, model_channels=32, channel_mult=(1, 2),
                         num_blocks=1, attn_resolutions=(8,), dropout=0.0,
                         embedding_type=embed, encoder_type=enc, decoder_type=dec,
                         resample_filter=filt,
                         channel_mult_noise=2 if embed == "fourier" else 1)
    tm = _torch_song(cfg)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    # buffers (map_noise.freqs) are in state_dict
    params = {"params": convert_song_unet(sd, cfg)}
    m = SongUNet(cfg)

    x = np.random.RandomState(0).randn(2, 3, 16, 16).astype(np.float32)
    nl = np.array([0.3, -0.7], dtype=np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x), torch.from_numpy(nl), None).numpy()
        ref_feat = tm.encode(torch.from_numpy(x), torch.from_numpy(nl), None).numpy()
    out = m.apply(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), jnp.asarray(nl))
    feat = m.apply(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), jnp.asarray(nl),
                   method=SongUNet.encode)
    np.testing.assert_allclose(np.transpose(np.asarray(out), (0, 3, 1, 2)), ref,
                               atol=5e-4, rtol=1e-3, err_msg=f"{enc}/{dec}/{embed}")
    np.testing.assert_allclose(np.transpose(np.asarray(feat), (0, 3, 1, 2)), ref_feat,
                               atol=5e-4, rtol=1e-3)


@requires_reference
def test_edm_precond_matches_torch(reference_path):
    import torch, sys
    sys.path.insert(0, "/root/reference")
    from src.edm_networks import EDMPrecond as TorchEDM

    torch.manual_seed(0)
    tp = TorchEDM(img_resolution=16, img_channels=3, model_type="SongUNet",
                  model_channels=32, channel_mult=[1, 2], num_blocks=1,
                  attn_resolutions=[8], dropout=0.0).eval()
    sd = {k[len("model."):]: v.detach().numpy()
          for k, v in tp.state_dict().items() if k.startswith("model.")}
    cfg = SongUNetConfig(img_resolution=16, model_channels=32, channel_mult=(1, 2),
                         num_blocks=1, attn_resolutions=(8,), dropout=0.0)
    params = {"params": convert_song_unet(sd, cfg)}
    m = SongUNet(cfg)
    pre = EDMPrecond(sigma_data=0.5)

    x = np.random.RandomState(1).randn(2, 3, 16, 16).astype(np.float32)
    sigma = np.array([1.7, 0.3], dtype=np.float32)
    with torch.no_grad():
        ref = tp(torch.from_numpy(x), torch.from_numpy(sigma)).numpy()
    ours = pre(lambda z, t: m.apply(params, z, t),
               jnp.asarray(np.transpose(x, (0, 2, 3, 1))), jnp.asarray(sigma))
    np.testing.assert_allclose(np.transpose(np.asarray(ours), (0, 3, 1, 2)), ref,
                               atol=5e-4, rtol=1e-3)


@requires_reference
def test_edm_sigma_head_matches_torch(reference_path):
    import torch, sys
    sys.path.insert(0, "/root/reference")
    from src.edm_networks import SigmaModel as TorchSigma

    torch.manual_seed(3)
    dim, channels = 4, 64
    tm = TorchSigma(dim=dim, channels=channels, n_blocks=2, out_dim=1,
                    dropout=0.0).eval()
    with torch.no_grad():
        tm.train()
        for _ in range(2):
            tm(torch.randn(8, channels, dim, dim))
        tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    p, bs = convert_edm_sigma_head(sd, dim, channels, 2)
    head = EDMSigmaHead(dim=dim, channels=channels, n_blocks=2, dropout=0.0)
    feat = np.random.RandomState(1).randn(4, channels, dim, dim).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(feat)).numpy()
    ours = head.apply({"params": p, "batch_stats": bs},
                      jnp.asarray(np.transpose(feat, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(ours).reshape(-1), ref.reshape(-1),
                               atol=5e-4, rtol=1e-3)


@requires_reference
def test_persistence_pickle_roundtrip(reference_path, tmp_path):
    """Build a persistence pickle with the reference's own machinery, then
    load it with our standalone shim in-process."""
    import pickle, torch, sys
    sys.path.insert(0, "/root/reference")
    from torch_utils import persistence
    from src.edm_networks import EDMPrecond as TorchEDM

    torch.manual_seed(0)
    tp = TorchEDM(img_resolution=16, img_channels=3, model_type="SongUNet",
                  model_channels=32, channel_mult=[1, 2], num_blocks=1,
                  attn_resolutions=[8], dropout=0.0).eval()
    path = tmp_path / "network-snapshot-test.pkl"
    with open(path, "wb") as f:
        pickle.dump({"ema": tp}, f)

    # The reference's persistence module is importable here, so this exercises
    # the same pickle format our shim handles standalone.
    from nlc_tpu.io.edm_pickle import load_edm_state_dict
    sd = load_edm_state_dict(str(path))
    ref_sd = {k[len("model."):]: v.detach().numpy()
              for k, v in tp.state_dict().items() if k.startswith("model.")}
    assert set(sd) == set(ref_sd)
    for k in sd:
        np.testing.assert_array_equal(sd[k], ref_sd[k])


def test_precond_coefficient_identities():
    """c_skip + c_out relations at sigma -> 0 and closed forms."""
    pre = EDMPrecond(sigma_data=0.5)
    sigma = jnp.asarray([1e-4]).reshape(-1, 1, 1, 1)
    c_skip, c_out, c_in, c_noise = pre.coeffs(sigma)
    np.testing.assert_allclose(np.asarray(c_skip).item(), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c_out).item(),
                               np.asarray(sigma).item(), rtol=1e-4)
    vp = VPPrecond()
    s = vp.sigma(jnp.asarray(0.5))
    np.testing.assert_allclose(np.asarray(vp.sigma_inv(s)).item(), 0.5, rtol=1e-4)
    ip = iDDPMPrecond()
    # u table is decreasing; round_sigma finds nearest entry
    assert ip.u[0] > ip.u[-2]
    idx = ip.round_sigma(jnp.asarray([float(ip.u[7])]), return_index=True)
    assert int(idx[0]) == 7


def test_forward_and_encode_consistency():
    """Fused pass returns exactly (__call__, encode) for both EDM UNets."""
    import jax
    from nlc_tpu.models.song_unet import (SongUNet, SongUNetConfig,
                                          DhariwalUNet, DhariwalUNetConfig)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 16, 16, 3), jnp.float32)
    t = jnp.asarray([0.3, 0.9])

    song = SongUNet(SongUNetConfig(img_resolution=16, in_channels=3,
                                   out_channels=3, model_channels=16,
                                   channel_mult=(1, 2), num_blocks=1,
                                   attn_resolutions=(8,), dropout=0.0))
    p = song.init(jax.random.PRNGKey(0), x, t)
    out, feat = song.apply(p, x, t, method=SongUNet.forward_and_encode)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(song.apply(p, x, t)))
    np.testing.assert_array_equal(
        np.asarray(feat), np.asarray(song.apply(p, x, t,
                                                method=SongUNet.encode)))

    dh = DhariwalUNet(DhariwalUNetConfig(img_resolution=16, in_channels=3,
                                         out_channels=3, model_channels=16,
                                         channel_mult=(1, 2), num_blocks=1,
                                         attn_resolutions=(8,)))
    p = dh.init(jax.random.PRNGKey(0), x, t)
    out, feat = dh.apply(p, x, t, method=DhariwalUNet.forward_and_encode)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(dh.apply(p, x, t)))
    np.testing.assert_array_equal(
        np.asarray(feat), np.asarray(dh.apply(p, x, t,
                                              method=DhariwalUNet.encode)))


def test_song_unet_quant_backend_drift():
    """quant_backend='taps' shares the exact param tree with the bf16 model
    and produces a bounded-drift output (W8A8 per-channel weight + per-tensor
    activation quantization; same policy as the ADM/DDIM families)."""
    import dataclasses
    cfg_q = dataclasses.replace(SMALL, quant_backend="taps")
    m = SongUNet(SMALL, dtype=jnp.bfloat16)
    mq = SongUNet(cfg_q, dtype=jnp.bfloat16)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 16, 16, 3), jnp.float32)
    nl = jnp.array([0.5, -1.0])
    params = m.init(jax.random.PRNGKey(0), x, nl)
    params_q = mq.init(jax.random.PRNGKey(0), x, nl)
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(params_q)
    ref = np.asarray(m.apply(params, x, nl), np.float32)
    out = np.asarray(mq.apply(params, x, nl), np.float32)
    scale = max(np.abs(ref).max(), 1e-6)
    assert np.abs(out - ref).max() / scale < 0.1, \
        (np.abs(out - ref).max(), scale)
    # and it must not silently fall through to bf16
    assert np.abs(out - ref).max() > 0.0
