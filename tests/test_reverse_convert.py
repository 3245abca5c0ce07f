"""Round-trip tests for io.reverse_convert: torch -> flax -> torch must
reproduce the original state_dict exactly (every transform is a transpose /
permute, so equality is bitwise). Covers all converter families:
DDIM/ADM/Song/Dhariwal UNets, the three sigma heads, and the classifier."""
import numpy as np
import pytest

from tests.conftest import requires_reference

from nlc_tpu.io import reverse_convert as rc
from nlc_tpu.io.torch_convert import convert_ddim_unet, convert_sigma_head
from nlc_tpu.io.adm_convert import (convert_adm_unet, convert_adm_sigma_head,
                                    convert_classifier)
from nlc_tpu.io.edm_convert import (convert_song_unet, convert_dhariwal_unet,
                                    convert_edm_sigma_head)

# buffers the forward converters deliberately ignore (not learnable state):
# EDM fused-resample FIR taps; BatchNorm step counters. map_noise.freqs IS
# carried (it defines the Fourier embedding).
_KNOWN_BUFFERS = ("resample_filter", "num_batches_tracked")


def _check_roundtrip(orig, rebuilt):
    for k, v in rebuilt.items():
        assert k in orig, f"reverse emitted unknown key {k}"
        np.testing.assert_array_equal(v, orig[k], err_msg=k)
    for k in set(orig) - set(rebuilt):
        assert any(p in k for p in _KNOWN_BUFFERS), f"key lost in round-trip: {k}"


def _sd(tm):
    return {k: v.detach().numpy() for k, v in tm.state_dict().items()}


@requires_reference
def test_ddim_unet_roundtrip(reference_path):
    import torch
    from src.unet_simple import Model as TorchModel
    from tests.test_ddim_unet import SMALL, _torch_config

    torch.manual_seed(0)
    sd = _sd(TorchModel(_torch_config(SMALL)))
    _check_roundtrip(sd, rc.ddim_unet_to_torch(convert_ddim_unet(sd, SMALL)))


@requires_reference
@pytest.mark.parametrize("dim", [7, 8])
def test_ddim_sigma_head_roundtrip(reference_path, dim):
    import torch
    from src.unet_simple import SigmaModel as TorchSigma
    from nlc_tpu.models.sigma_head import SigmaHeadConfig

    torch.manual_seed(1)
    cfg = SigmaHeadConfig(dim=dim, channels=32, n_blocks=2, dropout=0.0)
    tm = TorchSigma(dim=dim, channels=32, n_blocks=2, out_dim=1, dropout=0.0)
    sd = _sd(tm)
    params, bs = convert_sigma_head(sd, cfg)
    back = rc.ddim_sigma_head_to_torch(params, bs, dim, 32, 2)
    _check_roundtrip(sd, back)
    # the emitted dict loads cleanly into a fresh torch module
    tm2 = TorchSigma(dim=dim, channels=32, n_blocks=2, out_dim=1, dropout=0.0)
    tm2.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                         for k, v in back.items()})


@requires_reference
@pytest.mark.parametrize("updown,classes", [(False, None), (True, 10)])
def test_adm_unet_roundtrip(reference_path, updown, classes):
    import torch
    from src.unet_adm import UNetModel

    torch.manual_seed(0)
    tm = UNetModel(image_size=16, in_channels=3, model_channels=32,
                   out_channels=6, num_res_blocks=1, attention_resolutions=(2,),
                   dropout=0.0, channel_mult=(1, 2), num_classes=classes,
                   use_checkpoint=False, use_fp16=False, num_heads=2,
                   num_head_channels=-1, num_heads_upsample=-1,
                   use_scale_shift_norm=True, resblock_updown=updown,
                   use_new_attention_order=False, feat_layer=1)
    sd = _sd(tm)
    _check_roundtrip(sd, rc.adm_unet_to_torch(convert_adm_unet(sd, None)))


@requires_reference
def test_adm_sigma_head_roundtrip(reference_path):
    import torch
    from src.unet_adm import SigmaModel as TorchSigma

    torch.manual_seed(2)
    dim, ch = 5, 32
    tm = TorchSigma(dim=dim, channels=ch, n_blocks=2, out_dim=1, dropout=0.0,
                    num_heads=2)
    sd = _sd(tm)
    params, bs = convert_adm_sigma_head(sd, dim, ch, 2)
    back = rc.adm_sigma_head_to_torch(params, bs, dim, ch, 2)
    _check_roundtrip(sd, back)
    tm2 = TorchSigma(dim=dim, channels=ch, n_blocks=2, out_dim=1, dropout=0.0,
                     num_heads=2)
    tm2.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                         for k, v in back.items()})


@requires_reference
@pytest.mark.parametrize("pool", ["adaptive", "attention", "spatial", "spatial_v2"])
def test_classifier_roundtrip(reference_path, pool):
    import sys, torch
    sys.path.insert(0, "/root/reference")
    from tests.test_engine import _stub_missing_reference_deps
    _stub_missing_reference_deps()
    from src.unet_adm import EncoderUNetModel as TorchEnc
    from nlc_tpu.models.classifier import EncoderUNetConfig

    torch.manual_seed(0)
    tm = TorchEnc(image_size=16, in_channels=3, model_channels=32,
                  out_channels=10, num_res_blocks=1, attention_resolutions=(2,),
                  channel_mult=(1, 2), num_head_channels=16,
                  use_scale_shift_norm=True, resblock_updown=True, pool=pool)
    cfg = EncoderUNetConfig(image_size=16, model_channels=32, out_channels=10,
                            num_res_blocks=1, attention_resolutions=(2,),
                            channel_mult=(1, 2), num_head_channels=16,
                            use_scale_shift_norm=True, resblock_updown=True,
                            pool=pool)
    sd = _sd(tm)
    _check_roundtrip(sd, rc.classifier_to_torch(convert_classifier(sd, cfg), cfg))


@requires_reference
@pytest.mark.parametrize("enc,dec,embed,filt,label", [
    ("standard", "standard", "positional", (1, 1), 0),
    ("residual", "skip", "fourier", (1, 3, 3, 1), 10),
])
def test_song_unet_roundtrip(reference_path, enc, dec, embed, filt, label):
    import torch
    from nlc_tpu.models.song_unet import SongUNetConfig
    from tests.test_song_unet import _torch_song

    cfg = SongUNetConfig(img_resolution=16, model_channels=32, channel_mult=(1, 2),
                         num_blocks=1, attn_resolutions=(8,), dropout=0.0,
                         embedding_type=embed, encoder_type=enc, decoder_type=dec,
                         resample_filter=filt, label_dim=label,
                         channel_mult_noise=2 if embed == "fourier" else 1)
    sd = _sd(_torch_song(cfg))
    _check_roundtrip(sd, rc.song_unet_to_torch(convert_song_unet(sd, cfg)))


@requires_reference
def test_dhariwal_unet_roundtrip(reference_path):
    import torch
    from src.edm_networks import DhariwalUNet as TorchD
    from nlc_tpu.models.song_unet import DhariwalUNetConfig

    torch.manual_seed(0)
    tm = TorchD(img_resolution=16, in_channels=3, out_channels=3, label_dim=10,
                model_channels=64, channel_mult=[1, 2], num_blocks=1,
                attn_resolutions=[8], dropout=0.0)
    cfg = DhariwalUNetConfig(img_resolution=16, model_channels=64,
                             channel_mult=(1, 2), num_blocks=1,
                             attn_resolutions=(8,), dropout=0.0, label_dim=10)
    sd = _sd(tm)
    _check_roundtrip(sd, rc.dhariwal_unet_to_torch(convert_dhariwal_unet(sd, cfg)))


@requires_reference
def test_edm_sigma_head_roundtrip(reference_path):
    import torch
    from src.edm_networks import SigmaModel as TorchSigma

    torch.manual_seed(3)
    dim, ch = 4, 32
    tm = TorchSigma(dim=dim, channels=ch, n_blocks=2, out_dim=1, dropout=0.0)
    sd = _sd(tm)
    p, bs = convert_edm_sigma_head(sd, dim, ch, 2)
    back = rc.edm_sigma_head_to_torch(p, bs, dim, ch, 2)
    _check_roundtrip(sd, back)
    tm2 = TorchSigma(dim=dim, channels=ch, n_blocks=2, out_dim=1, dropout=0.0)
    tm2.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                         for k, v in back.items()})


def test_reverse_cli_sigma_head(tmp_path):
    """End-to-end reverse CLI: flax sigma head -> orbax -> torch .pt with
    reference-layout keys (dims inferred from the params alone)."""
    import jax
    import jax.numpy as jnp
    import torch
    from nlc_tpu.models.sigma_head import SigmaHead, SigmaHeadConfig
    from nlc_tpu.io.checkpoints import save_pytree
    from nlc_tpu.cli.convert_checkpoint import main as convert_main

    cfg = SigmaHeadConfig(dim=8, channels=16, n_blocks=2, dropout=0.0)
    head = SigmaHead(cfg)
    variables = head.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 16)))
    src = str(tmp_path / "sigma")
    save_pytree(variables, src)
    dst = str(tmp_path / "sigma.pt")
    convert_main(["--reverse", "--arch", "ddim_sigma", "--src", src,
                  "--dst", dst])
    sd = torch.load(dst, map_location="cpu", weights_only=True)
    assert "down_layer.1.norm1.weight" in sd      # PureResnetBlock at idx 1
    assert "down_layer.2.q.weight" in sd          # attn at idx 2 (block 0)
    assert "fc_layer.1.weight" in sd and "final_mlp.weight" in sd
    kernel = np.asarray(variables["params"]["res_0"]["conv1"]["kernel"])
    np.testing.assert_array_equal(
        sd["down_layer.1.conv1.weight"].numpy(),
        np.transpose(kernel, (3, 2, 0, 1)))


def test_infer_sigma_head_dims():
    import jax
    import jax.numpy as jnp
    from nlc_tpu.models.sigma_head import SigmaHead, SigmaHeadConfig
    from nlc_tpu.io.reverse_convert import infer_sigma_head_dims

    cfg = SigmaHeadConfig(dim=7, channels=16, n_blocks=2, dropout=0.0)
    head = SigmaHead(cfg)
    variables = head.init(jax.random.PRNGKey(0), jnp.zeros((1, 7, 7, 16)))
    dim, ch, nb = infer_sigma_head_dims(variables["params"])
    assert (ch, nb) == (16, 2)
    # dim=7 pads to 8 -> final 2; recovered even-dim 8 yields the same layout
    assert dim == 8


def test_save_torch_state_dict(tmp_path):
    import torch

    sd = {"a.weight": np.arange(6, dtype=np.float32).reshape(2, 3)}
    path = str(tmp_path / "x.pt")
    rc.save_torch_state_dict(sd, path)
    loaded = torch.load(path, map_location="cpu", weights_only=True)
    np.testing.assert_array_equal(loaded["a.weight"].numpy(), sd["a.weight"])
