"""Restoration subpackage tests: NAFNet parity vs torch reference, registry,
losses/schedulers, TLC, tiled inference, train/test CLIs, NIQE math."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import yaml

from nlc_tpu.restoration import ARCH_REGISTRY, define_network, NAFNet
from nlc_tpu.restoration.losses import PSNRLoss, build_loss
from nlc_tpu.restoration.lr_schedulers import build_scheduler
from tests.conftest import requires_reference


def test_registry():
    assert "NAFNet" in ARCH_REGISTRY and "NAFSSR" in ARCH_REGISTRY
    net = define_network({"type": "NAFNet", "width": 8, "middle_blk_num": 1,
                          "enc_blk_nums": [1], "dec_blk_nums": [1]})
    x = jnp.zeros((1, 16, 16, 3))
    params = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(params, x)
    assert out.shape == x.shape
    with pytest.raises(KeyError):
        define_network({"type": "NopeNet"})


def test_nafnet_odd_sizes_padder():
    net = NAFNet(width=8, middle_blk_num=1, enc_blk_nums=(1, 1),
                 dec_blk_nums=(1, 1))
    x = jnp.ones((1, 19, 23, 3))
    params = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(params, x)
    assert out.shape == (1, 19, 23, 3)


def test_nafssr_shapes():
    net = define_network({"type": "NAFSSR", "up_scale": 2, "width": 8,
                          "num_blks": 2, "fusion_from": 0, "fusion_to": 2})
    x = jnp.zeros((1, 8, 8, 6))
    params = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(params, x)
    assert out.shape == (1, 16, 16, 6)


@requires_reference
def test_nafnet_matches_torch(reference_path):
    import sys, types, torch
    from tests.test_engine import _stub_missing_reference_deps
    _stub_missing_reference_deps()
    # import NAFNet_arch without triggering the archs package __init__ (it
    # auto-imports every arch, incl. CLIP ones needing real torchvision)
    for name, path in [("basicsr", "/root/reference/basicsr"),
                       ("basicsr.models", "/root/reference/basicsr/models"),
                       ("basicsr.models.archs",
                        "/root/reference/basicsr/models/archs")]:
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__path__ = [path]
            sys.modules[name] = mod
    from basicsr.models.archs.NAFNet_arch import NAFNet as TorchNAF

    torch.manual_seed(0)
    tm = TorchNAF(img_channel=3, width=8, middle_blk_num=1,
                  enc_blk_nums=[1, 1], dec_blk_nums=[1, 1]).eval()
    net = NAFNet(width=8, middle_blk_num=1, enc_blk_nums=(1, 1),
                 dec_blk_nums=(1, 1))
    from nlc_tpu.restoration import convert_nafnet
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = convert_nafnet(sd, enc_blk_nums=[1, 1], dec_blk_nums=[1, 1],
                            middle_blk_num=1)

    x = np.random.RandomState(0).randn(2, 3, 16, 16).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    out = net.apply({"params": params},
                    jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    got = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-3)


def test_losses_and_schedulers():
    a = jnp.zeros((2, 4, 4, 3))
    b = jnp.ones((2, 4, 4, 3)) * 0.1
    l1 = build_loss({"type": "L1Loss", "loss_weight": 2.0})(a, b)
    np.testing.assert_allclose(float(l1), 0.2, rtol=1e-5)
    psnr_loss = PSNRLoss(a, b)
    assert float(psnr_loss) < 0  # log(0.01) < 0
    s = build_scheduler({"type": "CosineAnnealingRestartLR", "periods": [10, 10],
                         "restart_weights": [1, 0.5]})
    assert s(0) == pytest.approx(1.0, abs=1e-5)
    assert s(10) == pytest.approx(0.5, abs=1e-2)
    s2 = build_scheduler({"type": "MultiStepRestartLR", "milestones": [5, 8],
                          "gamma": 0.1})
    assert s2(0) == 1.0 and s2(6) == pytest.approx(0.1) and \
        s2(9) == pytest.approx(0.01)


def test_nafnet_remat_parity():
    """remat=True rematerializes blocks in the backward pass without changing
    outputs or gradients (enables 256^2 training of deep configs in 16 GB)."""
    import jax
    from nlc_tpu.restoration.archs import NAFNet
    kw = dict(width=8, enc_blk_nums=[1, 1], middle_blk_num=1,
              dec_blk_nums=[1, 1])
    a, b = NAFNet(**kw), NAFNet(**kw, remat=True)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 16, 16, 3), jnp.float32)
    p = a.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(np.asarray(a.apply(p, x)),
                               np.asarray(b.apply(p, x)), atol=1e-6)
    ga = jax.grad(lambda pp: jnp.sum(a.apply(pp, x) ** 2))(p)
    gb = jax.grad(lambda pp: jnp.sum(b.apply(pp, x) ** 2))(p)
    for la, lb in zip(jax.tree_util.tree_leaves(ga),
                      jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=1e-5)


def test_tlc_local_window():
    """TLC flag changes SCA pooling but keeps shapes; params are shared."""
    net_g = NAFNet(width=8, middle_blk_num=1, enc_blk_nums=(1,), dec_blk_nums=(1,))
    net_l = NAFNet(width=8, middle_blk_num=1, enc_blk_nums=(1,), dec_blk_nums=(1,),
                   tlc_window=(8, 8))
    x = jnp.asarray(np.random.RandomState(0).rand(1, 16, 16, 3), jnp.float32)
    params = net_g.init(jax.random.PRNGKey(0), x)
    # beta/gamma init to zero makes blocks near-identity; randomize so the
    # SCA pooling branch actually contributes
    leaves, treedef = jax.tree_util.tree_flatten(params)
    rng = np.random.RandomState(1)
    leaves = [jnp.asarray(rng.randn(*l.shape).astype(np.float32) * 0.1)
              for l in leaves]
    params = jax.tree_util.tree_unflatten(treedef, leaves)
    out_g = net_g.apply(params, x)
    out_l = net_l.apply(params, x)     # same params, local pooling
    assert out_l.shape == out_g.shape
    assert not np.allclose(np.asarray(out_g), np.asarray(out_l))


def test_train_and_test_cli(tmp_path):
    from nlc_tpu.cli.basicsr_train import main as train_main, parse_options
    opt = {
        "name": "t", "manual_seed": 0,
        "network_g": {"type": "NAFNet", "width": 8, "middle_blk_num": 1,
                      "enc_blk_nums": [1], "dec_blk_nums": [1]},
        "datasets": {"train": {"type": "synthetic", "gt_size": 16,
                               "batch_size_per_gpu": 2},
                     "val": {"type": "synthetic"}},
        "train": {"total_iter": 6, "pixel_opt": {"type": "PSNRLoss"},
                  "optim_g": {"lr": 1e-3},
                  "scheduler": {"type": "LinearLR", "total_iter": 6}},
        "val": {"val_freq": 100}, "logger": {"print_freq": 2,
                                             "save_checkpoint_freq": 6},
        "path": {"experiments_root": str(tmp_path / "exp")},
    }
    opt_path = tmp_path / "opt.yml"
    with open(opt_path, "w") as f:
        yaml.safe_dump(opt, f)
    state, metrics = train_main(parse_options(["-opt", str(opt_path)]))
    assert int(state.step) >= 6
    assert os.path.isdir(tmp_path / "exp" / "net_g_6")

    from nlc_tpu.cli.basicsr_test import main as test_main
    m = test_main(["-opt", str(opt_path), "--ckpt", str(tmp_path / "exp" / "net_g_6"),
                   "--grids", "1", "--crop_size", "8"])
    assert "psnr" in m


def test_niqe_machinery(tmp_path):
    """NIQE with synthetic pristine params: smoother image scores closer to
    the (synthetic) pristine stats than heavy noise."""
    from nlc_tpu.eval.niqe import niqe_features, calculate_niqe
    rng = np.random.RandomState(0)
    # build synthetic 'pristine' stats from smooth images
    feats = []
    for i in range(4):
        base = rng.rand(3, 3) * 255
        img = np.kron(base, np.ones((32, 32)))
        img += rng.randn(96, 96) * 2
        feats.append(niqe_features(img))
    feats = np.concatenate(feats, axis=0)
    mu = np.nanmean(feats, axis=0)
    cov = np.cov(feats, rowvar=False) + np.eye(feats.shape[1]) * 1e-6
    path = tmp_path / "pris.npz"
    np.savez(path, mu_pris_param=mu, cov_pris_param=cov)

    smooth = np.kron(rng.rand(3, 3) * 255, np.ones((32, 32))) + \
        rng.randn(96, 96) * 2
    noisy = rng.rand(96, 96) * 255
    s1 = calculate_niqe(smooth, str(path))
    s2 = calculate_niqe(noisy, str(path))
    assert s1 < s2


def test_naf_variant_family():
    """All registered NAF variants run and differ where mechanisms differ."""
    x = jnp.asarray(np.random.RandomState(0).rand(1, 16, 16, 3), jnp.float32)
    outs = {}
    for name in ["NAFNet", "CANet", "NOANet", "SSANet", "SCSANet", "SSSANet",
                 "SSCSANet", "SPANet", "RSPANet", "NSPANet"]:
        net = define_network({"type": name, "width": 8, "middle_blk_num": 1,
                              "enc_blk_nums": [1, 1, 1, 1],
                              "dec_blk_nums": [1, 1, 1, 1]})
        params = net.init(jax.random.PRNGKey(0), x)
        out = net.apply(params, x)
        assert out.shape == x.shape, name
        assert np.isfinite(np.asarray(out)).all(), name
        outs[name] = np.asarray(out)
    # param structures differ (mechanism-specific weights exist)
    ssanet = define_network({"type": "SSANet", "width": 8, "middle_blk_num": 1,
                             "enc_blk_nums": [1], "dec_blk_nums": [1]})
    p = ssanet.init(jax.random.PRNGKey(0), x)
    flat = jax.tree_util.tree_flatten_with_path(p)[0]
    keys = {"/".join(str(k) for k in path) for path, _ in flat}
    assert any("ft" in k for k in keys)
    assert not any("sca_conv" in k for k in keys)


def _stub_clip_deps():
    """clip.py imports ftfy + torchvision.transforms; neither is in the image
    and neither is touched by tokenize() on ASCII prompt templates."""
    import sys, types
    if "ftfy" not in sys.modules:
        f = types.ModuleType("ftfy")
        f.fix_text = lambda s: s
        sys.modules["ftfy"] = f
    import tests.test_engine as te
    te._stub_missing_reference_deps()
    tv = sys.modules["torchvision"]
    if not hasattr(tv, "transforms"):
        tr = types.ModuleType("torchvision.transforms")
        for name in ["Compose", "Resize", "CenterCrop", "ToTensor", "Normalize"]:
            setattr(tr, name, type(name, (), {"__init__": lambda self, *a, **k: None}))
        tr.InterpolationMode = type("InterpolationMode", (), {"BICUBIC": None})
        tv.transforms = tr
        sys.modules["torchvision.transforms"] = tr


@requires_reference
def test_clip_text_encoder_matches_torch(reference_path):
    """Flax CLIP text tower vs the vendored torch model.py on random weights,
    driving exactly the PANet TextEncoder path (embedded prompts in, projected
    EOT feature out)."""
    import sys, types, torch
    _stub_clip_deps()
    for name, path in [("basicsr", "/root/reference/basicsr"),
                       ("basicsr.models", "/root/reference/basicsr/models")]:
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__path__ = [path]
            sys.modules[name] = mod
    from basicsr.models.clip.model import CLIP

    torch.manual_seed(0)
    tm = CLIP(embed_dim=96, image_resolution=32, vision_layers=2,
              vision_width=64, vision_patch_size=16, context_length=77,
              vocab_size=100, transformer_width=64, transformer_heads=4,
              transformer_layers=2).eval()
    prompts = np.random.RandomState(0).randn(3, 77, 64).astype(np.float32)
    eot = 5
    with torch.no_grad():
        x = torch.from_numpy(prompts) + tm.positional_embedding
        x = tm.transformer(x.permute(1, 0, 2)).permute(1, 0, 2)
        x = tm.ln_final(x)
        ref = (x[torch.arange(3), eot] @ tm.text_projection).numpy()

    from nlc_tpu.restoration import CLIPTextEncoder, convert_clip_text
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params = convert_clip_text(sd, prefix="", layers=2)
    enc = CLIPTextEncoder(width=64, layers=2, heads=4, ctx_len=77, embed_dim=96)
    got = enc.apply({"params": params}, jnp.asarray(prompts), eot_idx=eot)
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5, rtol=1e-4)


@requires_reference
def test_panet_matches_torch(reference_path):
    """End-to-end PANet parity: full torch PANet built over a small vendored
    CLIP (load_clip_to_cpu patched out — no weight download), converted via
    convert_panet, compared on a random image."""
    import sys, types, torch
    _stub_clip_deps()
    for name, path in [("basicsr", "/root/reference/basicsr"),
                       ("basicsr.models", "/root/reference/basicsr/models"),
                       ("basicsr.models.archs",
                        "/root/reference/basicsr/models/archs")]:
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__path__ = [path]
            sys.modules[name] = mod
    from basicsr.models.clip.model import CLIP
    import basicsr.models.archs.PANet_arch as pa

    torch.manual_seed(0)
    small_clip = CLIP(embed_dim=512, image_resolution=32, vision_layers=2,
                      vision_width=64, vision_patch_size=16, context_length=77,
                      vocab_size=49408, transformer_width=64,
                      transformer_heads=4, transformer_layers=2).eval()
    pa.load_clip_to_cpu = lambda: small_clip
    tm = pa.PANet(img_channel=3, width=8, middle_blk_num=1,
                  enc_blk_nums=[1, 1], dec_blk_nums=[1, 1]).eval()
    # sanity: the fixed "X X X." template puts EOT at n_ctx + 2
    assert int(tm.tokenized_prompts.argmax(dim=-1)[0]) == 5

    x = np.random.RandomState(1).randn(2, 3, 16, 16).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()

    from nlc_tpu.restoration import define_network, convert_panet
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params = convert_panet(sd, enc_blk_nums=[1, 1], dec_blk_nums=[1, 1],
                           middle_blk_num=1, clip_layers=2)
    net = define_network({"type": "PANet", "width": 8, "middle_blk_num": 1,
                          "enc_blk_nums": [1, 1], "dec_blk_nums": [1, 1],
                          "clip_width": 64, "clip_layers": 2, "clip_heads": 4,
                          "clip_embed_dim": 512})
    out = net.apply({"params": params},
                    jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    got = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-3)


def test_panet_frozen_clip_training():
    """Trainer leaves the CLIP tower and prefix/suffix untouched while ctx and
    conv weights move (reference freezes via requires_grad_(False))."""
    from nlc_tpu.restoration.model import RestorationModel
    opt = {"network_g": {"type": "PANet", "width": 8, "middle_blk_num": 1,
                         "enc_blk_nums": [1], "dec_blk_nums": [1],
                         "clip_width": 32, "clip_layers": 1, "clip_heads": 2,
                         "clip_embed_dim": 32},
           "train": {"total_iter": 2, "pixel_opt": {"type": "L1Loss"},
                     "optim_g": {"lr": 1e-2}}}
    m = RestorationModel(opt)
    lq = jnp.asarray(np.random.RandomState(0).rand(2, 16, 16, 3), jnp.float32)
    gt = jnp.asarray(np.random.RandomState(1).rand(2, 16, 16, 3), jnp.float32)
    state = m.init_state(lq)
    p0 = jax.device_get(state.params["params"])
    state, loss = m.train_step(state, lq, gt, jax.random.PRNGKey(0))
    state, loss = m.train_step(state, lq, gt, jax.random.PRNGKey(1))
    p1 = jax.device_get(state.params["params"])
    frozen_same = jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: np.array_equal(a, b), p0["text_encoder"],
        p1["text_encoder"]))
    assert frozen_same
    assert np.array_equal(p0["token_prefix"], p1["token_prefix"])
    assert not np.array_equal(p0["ctx"], p1["ctx"])
    assert not np.array_equal(p0["intro"]["kernel"], p1["intro"]["kernel"])


def test_demo_cli_and_datasets(tmp_path):
    """basicsr_demo single-image inference + SingleImage/Stereo datasets."""
    from PIL import Image
    from nlc_tpu.cli.basicsr_demo import main as demo_main
    from nlc_tpu.restoration.data import SingleImageDataset, StereoPairedDataset
    rng = np.random.RandomState(0)
    inp = tmp_path / "in.png"
    Image.fromarray((rng.rand(19, 23, 3) * 255).astype(np.uint8)).save(inp)
    opt = {"name": "d", "network_g": {"type": "NAFNet", "width": 8,
                                      "middle_blk_num": 1,
                                      "enc_blk_nums": [1], "dec_blk_nums": [1]}}
    opt_path = tmp_path / "opt.yml"
    with open(opt_path, "w") as f:
        yaml.safe_dump(opt, f)
    out = demo_main(["-opt", str(opt_path), "--input", str(inp),
                     "--output", str(tmp_path / "out.png")])
    assert np.asarray(Image.open(out)).shape == (19, 23, 3)

    # single-image dataset yields (lq, path)
    sroot = tmp_path / "single"
    sroot.mkdir()
    Image.fromarray((rng.rand(8, 8, 3) * 255).astype(np.uint8)).save(
        sroot / "a.png")
    ds = SingleImageDataset(str(sroot))
    lq, path = ds[0]
    assert lq.shape == (8, 8, 3) and path.endswith("a.png")

    # stereo pairs stack to 6 channels; crop respects scale
    for sub in ["gt", "lq"]:
        d = tmp_path / sub
        d.mkdir()
        size = 16 if sub == "gt" else 8
        for side in ["L", "R"]:
            Image.fromarray((rng.rand(size, size, 3) * 255).astype(np.uint8)
                            ).save(d / f"v_{side}.png")
    sds = StereoPairedDataset(str(tmp_path / "gt"), str(tmp_path / "lq"),
                              gt_size=8, scale=2)
    lq, gt = sds[0]
    assert lq.shape == (4, 4, 6) and gt.shape == (8, 8, 6)
    with pytest.raises(ValueError):
        StereoPairedDataset(str(sroot), str(sroot))


def test_demo_ssr_cli(tmp_path):
    from PIL import Image
    from nlc_tpu.cli.basicsr_demo_ssr import main as ssr_main
    rng = np.random.RandomState(0)
    for side in ["l", "r"]:
        Image.fromarray((rng.rand(10, 12, 3) * 255).astype(np.uint8)).save(
            tmp_path / f"{side}.png")
    opt = {"name": "ssr", "network_g": {"type": "NAFSSR", "up_scale": 2,
                                        "width": 8, "num_blks": 1,
                                        "fusion_from": 0, "fusion_to": 1}}
    opt_path = tmp_path / "opt.yml"
    with open(opt_path, "w") as f:
        yaml.safe_dump(opt, f)
    out_l, out_r = ssr_main([
        "-opt", str(opt_path),
        "--input_l", str(tmp_path / "l.png"), "--input_r", str(tmp_path / "r.png"),
        "--output_l", str(tmp_path / "sl.png"),
        "--output_r", str(tmp_path / "sr.png")])
    assert np.asarray(Image.open(out_l)).shape == (20, 24, 3)
    assert np.asarray(Image.open(out_r)).shape == (20, 24, 3)


def test_video_clip_dataset(tmp_path):
    """Frame-window indices match the reference padding modes; clip dataset
    stacks the lq window channel-wise around the center gt frame."""
    from nlc_tpu.restoration.data import (VideoClipDataset,
                                          generate_frame_indices)
    # reference docstring examples (data_util.py:54-59)
    assert generate_frame_indices(0, 100, 5, "replicate") == [0, 0, 0, 1, 2]
    assert generate_frame_indices(0, 100, 5, "reflection") == [2, 1, 0, 1, 2]
    assert generate_frame_indices(0, 100, 5, "reflection_circle") == [4, 3, 0, 1, 2]
    assert generate_frame_indices(0, 100, 5, "circle") == [3, 4, 0, 1, 2]

    from PIL import Image
    rng = np.random.RandomState(0)
    for sub in ["gt", "lq"]:
        for clip in ["c0", "c1"]:
            d = tmp_path / sub / clip
            d.mkdir(parents=True)
            for f in range(4):
                Image.fromarray((rng.rand(8, 8, 3) * 255).astype(np.uint8)
                                ).save(d / f"{f:03}.png")
    ds = VideoClipDataset(str(tmp_path / "gt"), str(tmp_path / "lq"),
                          num_frame=3)
    assert len(ds) == 8
    lq, gt = ds[0]          # first frame of c0: reflection pad
    assert lq.shape == (8, 8, 9) and gt.shape == (8, 8, 3)
    # center channel block equals frame 0's lq
    lq0 = np.asarray(Image.open(tmp_path / "lq" / "c0" / "000.png"),
                     np.float32) / 255.0
    np.testing.assert_allclose(lq[..., 3:6], lq0)


def test_video_training_cli(tmp_path):
    """basicsr_train on a video clip dataset: 3-frame window in, center frame
    out (NAFNet out_channel)."""
    from PIL import Image
    from nlc_tpu.cli.basicsr_train import main as train_main, parse_options
    rng = np.random.RandomState(0)
    for sub in ["gt", "lq"]:
        d = tmp_path / "data" / sub / "c0"
        d.mkdir(parents=True)
        for f in range(4):
            Image.fromarray((rng.rand(16, 16, 3) * 255).astype(np.uint8)).save(
                d / f"{f:03}.png")
    opt = {"name": "vid", "manual_seed": 0,
           "network_g": {"type": "NAFNet", "img_channel": 9, "out_channel": 3,
                         "width": 8, "middle_blk_num": 1, "enc_blk_nums": [1],
                         "dec_blk_nums": [1]},
           "datasets": {"train": {"type": "video",
                                  "dataroot_gt": str(tmp_path / "data" / "gt"),
                                  "dataroot_lq": str(tmp_path / "data" / "lq"),
                                  "num_frame": 3, "batch_size_per_gpu": 2},
                        "val": {"type": "video",
                                "dataroot_gt": str(tmp_path / "data" / "gt"),
                                "dataroot_lq": str(tmp_path / "data" / "lq"),
                                "num_frame": 3}},
           "train": {"total_iter": 2, "pixel_opt": {"type": "L1Loss"},
                     "optim_g": {"lr": 1e-3},
                     "scheduler": {"type": "LinearLR", "total_iter": 2}},
           "val": {"val_freq": 100},
           "logger": {"print_freq": 1, "save_checkpoint_freq": 2},
           "path": {"experiments_root": str(tmp_path / "exp")}}
    opt_path = tmp_path / "opt.yml"
    with open(opt_path, "w") as f:
        yaml.safe_dump(opt, f)
    state, metrics = train_main(parse_options(["-opt", str(opt_path)]))
    assert int(state.step) == 2 and "psnr" in metrics


def test_local_variant_registry():
    """<Name>Local aliases map train_size to a TLC window; weights are shared
    with the base arch (same param tree), and the local pooling changes the
    output as TLC should."""
    net_l = define_network({"type": "NAFNetLocal", "width": 8,
                            "middle_blk_num": 1, "enc_blk_nums": [1],
                            "dec_blk_nums": [1],
                            "train_size": [1, 3, 8, 8]})
    assert net_l.tlc_window == (12, 12)
    net_g = define_network({"type": "NAFNet", "width": 8, "middle_blk_num": 1,
                            "enc_blk_nums": [1], "dec_blk_nums": [1]})
    x = jnp.asarray(np.random.RandomState(0).rand(1, 16, 16, 3), jnp.float32)
    params = net_g.init(jax.random.PRNGKey(0), x)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    rng = np.random.RandomState(1)
    leaves = [jnp.asarray(rng.randn(*l.shape).astype(np.float32) * 0.1)
              for l in leaves]
    params = jax.tree_util.tree_unflatten(treedef, leaves)
    out_l = net_l.apply(params, x)        # same param tree loads directly
    out_g = net_g.apply(params, x)
    assert out_l.shape == out_g.shape
    assert not np.allclose(np.asarray(out_l), np.asarray(out_g))
    assert "PANetLocal" in ARCH_REGISTRY and "SPANetLocal" in ARCH_REGISTRY


def test_prefetch_loader_transparent():
    """PrefetchLoader yields exactly the wrapped iterator's items in order,
    in both cpu and device modes (reference prefetch_dataloader.py parity)."""
    from nlc_tpu.restoration.prefetch import PrefetchLoader, wrap_prefetch
    rng = np.random.RandomState(0)
    items = [(rng.rand(2, 4, 4, 3).astype(np.float32),
              rng.rand(2, 4, 4, 3).astype(np.float32)) for _ in range(7)]
    for mode in ("cpu", "device"):
        got = list(PrefetchLoader(iter(items), num_prefetch_queue=2, mode=mode))
        assert len(got) == len(items)
        for (a, b), (ra, rb) in zip(got, items):
            np.testing.assert_array_equal(np.asarray(a), ra)
            np.testing.assert_array_equal(np.asarray(b), rb)
    # wait-time accounting exists and is finite
    pl = PrefetchLoader(iter(items), mode="cpu")
    list(pl)
    assert pl.batches == len(items) and pl.wait_time >= 0.0

    # YAML-schema wrapper: None mode passes through untouched
    it2, loader = wrap_prefetch(iter(items), {"prefetch_mode": None})
    assert loader is None and len(list(it2)) == 7
    it3, loader3 = wrap_prefetch(iter(items),
                                 {"prefetch_mode": "cuda",
                                  "num_prefetch_queue": 3})
    assert loader3 is not None and len(list(it3)) == 7


def test_prefetch_loader_propagates_worker_error():
    from nlc_tpu.restoration.prefetch import PrefetchLoader

    def gen():
        yield (np.zeros(1), np.zeros(1))
        raise RuntimeError("decode failed")

    pl = PrefetchLoader(gen(), mode="cpu")
    next(pl)
    with pytest.raises(RuntimeError, match="decode failed"):
        next(pl)


def test_train_cli_prefetch_and_wait_metric(tmp_path, capsys):
    """basicsr_train with prefetch_mode: cpu trains identically and logs the
    measured input_wait_frac (VERDICT r2 #6)."""
    from nlc_tpu.cli.basicsr_train import main as train_main, parse_options
    opt = {
        "name": "tp", "manual_seed": 0,
        "network_g": {"type": "NAFNet", "width": 8, "middle_blk_num": 1,
                      "enc_blk_nums": [1], "dec_blk_nums": [1]},
        "datasets": {"train": {"type": "synthetic", "gt_size": 16,
                               "batch_size_per_gpu": 2,
                               "prefetch_mode": "cpu",
                               "num_prefetch_queue": 2}},
        "train": {"total_iter": 4, "pixel_opt": {"type": "PSNRLoss"},
                  "optim_g": {"lr": 1e-3},
                  "scheduler": {"type": "LinearLR", "total_iter": 4}},
        "logger": {"print_freq": 2, "save_checkpoint_freq": 4},
        "path": {"experiments_root": str(tmp_path / "exp")},
    }
    opt_path = tmp_path / "opt.yml"
    with open(opt_path, "w") as f:
        yaml.safe_dump(opt, f)
    state, _ = train_main(parse_options(["-opt", str(opt_path)]))
    assert int(state.step) >= 4
    cap = capsys.readouterr()
    assert "input_wait_frac" in cap.err + cap.out  # logger.log prints to stderr


def test_train_cli_resume_typed_opt_state(tmp_path):
    """Resuming through the CLI must restore the optax state into its typed
    NamedTuple containers and continue stepping from the saved step — orbax
    without a target returns raw dicts and the first tx.update crashed on
    `state.mu` (regression; same class as the edm_train resume fix)."""
    from nlc_tpu.cli.basicsr_train import main as train_main, parse_options
    opt = {
        "name": "tr", "manual_seed": 0,
        "network_g": {"type": "NAFNet", "width": 8, "middle_blk_num": 1,
                      "enc_blk_nums": [1], "dec_blk_nums": [1]},
        "datasets": {"train": {"type": "synthetic", "gt_size": 16,
                               "batch_size_per_gpu": 2}},
        "train": {"total_iter": 4, "pixel_opt": {"type": "PSNRLoss"},
                  "optim_g": {"lr": 1e-3},
                  "scheduler": {"type": "LinearLR", "total_iter": 8}},
        "logger": {"print_freq": 2, "save_checkpoint_freq": 4},
        "path": {"experiments_root": str(tmp_path / "exp")},
    }
    opt_path = tmp_path / "opt.yml"
    with open(opt_path, "w") as f:
        yaml.safe_dump(opt, f)
    state, _ = train_main(parse_options(["-opt", str(opt_path)]))
    assert int(state.step) == 4

    opt["train"]["total_iter"] = 8
    opt["path"]["resume_state"] = str(tmp_path / "exp" / "net_g_4")
    with open(opt_path, "w") as f:
        yaml.safe_dump(opt, f)
    state2, _ = train_main(parse_options(["-opt", str(opt_path)]))
    # the resumed run must take exactly 4 more steps (host `it` picks up at
    # the restored step) and its opt_state must be the typed optax structure
    assert int(state2.step) == 8
    assert os.path.isdir(tmp_path / "exp" / "net_g_8")
    import jax.tree_util as jtu
    td_live = jtu.tree_structure(state.opt_state)
    td_resumed = jtu.tree_structure(state2.opt_state)
    assert td_live == td_resumed
