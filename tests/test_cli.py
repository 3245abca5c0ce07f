"""CLI smoke tests on tiny configs (CPU): unconstrained sampling, restoration,
EDM sampling, sigma training, result evaluation — exercising flag parsing,
method presets, PNG-skip resume, args.json round trip, checkpoints."""
import json
import os

import numpy as np
import pytest
import yaml

TINY_DDIM = {
    "model": {"type": "simple", "ch": 32, "out_ch": 3, "ch_mult": [1, 2],
              "num_res_blocks": 1, "attn_resolutions": [8], "dropout": 0.0,
              "in_channels": 3, "resamp_with_conv": True, "feat_layer": 0},
    "data": {"dataset": "CELEBA", "image_size": 16, "channels": 3},
    "diffusion": {"num_diffusion_timesteps": 1000, "beta_schedule": "linear"},
}
TINY_EDM = {
    "model": {"img_resolution": 16, "in_channels": 3, "out_channels": 3,
              "model_channels": 32, "channel_mult": [1, 2], "num_blocks": 1,
              "attn_resolutions": [8], "dropout": 0.0},
    "data": {"dataset": "CIFAR10", "image_size": 16, "channels": 3},
}


@pytest.fixture()
def store(tmp_path):
    cfg_dir = tmp_path / "store" / "config"
    cfg_dir.mkdir(parents=True)
    with open(cfg_dir / "tiny.yml", "w") as f:
        yaml.safe_dump(TINY_DDIM, f)
    with open(cfg_dir / "tinyedm.yml", "w") as f:
        yaml.safe_dump(TINY_EDM, f)
    return str(tmp_path / "store")


def test_image_sample_unconstrained(store, tmp_path):
    from nlc_tpu.cli.image_sample import get_args, main
    args, config = get_args([
        "--config", "celeba", "--config_path", "tiny", "--store_dir", store,
        "--method", "base", "--max_T", "3", "--sample_size", "2",
        "--batch_size", "2", "--bf16", "0", "--eta", "0.0",
        "--test_dir", str(tmp_path / "out")])
    main(args, config)
    images = os.path.join(args.test_dir, "0", "images")
    assert len(os.listdir(images)) == 2
    assert os.path.exists(os.path.join(args.test_dir, "args.json"))
    assert os.path.exists(os.path.join(args.test_dir, "0", "results.json"))
    # PNG-skip resume: rerunning with same save_folder skips all batches
    args2, config2 = get_args([
        "--config", "celeba", "--config_path", "tiny", "--store_dir", store,
        "--method", "base", "--max_T", "3", "--sample_size", "2",
        "--batch_size", "2", "--bf16", "0", "--eta", "0.0",
        "--save_folder", args.test_dir])
    main(args2, config2)   # must not crash; skips existing PNGs


def test_image_sample_stamps_fallback_fid_backend(store, tmp_path):
    """Every FID computed without Inception weights must be stamped
    fid_backend=fallback in results.json (not mistakable for a pytorch_fid
    comparable number)."""
    from nlc_tpu.cli.image_sample import get_args, main
    from nlc_tpu.eval.fid import FIDComputer

    rng = np.random.RandomState(0)
    target = tmp_path / "target.npz"
    FIDComputer().stats_of_images(rng.rand(8, 16, 16, 3)).save(str(target))
    args, config = get_args([
        "--config", "celeba", "--config_path", "tiny", "--store_dir", store,
        "--method", "base", "--max_T", "3", "--sample_size", "2",
        "--batch_size", "2", "--bf16", "0", "--eta", "0.0",
        "--fid_target", str(target), "--test_dir", str(tmp_path / "out")])
    log = main(args, config)
    assert np.isfinite(log["fid"])
    with open(os.path.join(args.test_dir, "0", "results.json")) as f:
        res = json.load(f)
    assert res["fid_backend"] == "fallback"
    assert "fid_note" in res


def test_image_sample_constrained(store, tmp_path):
    from nlc_tpu.cli.image_sample import get_args, main
    args, config = get_args([
        "--config", "celeba", "--config_path", "tiny", "--store_dir", store,
        "--method", "pred_denoise_base", "--max_T", "3", "--sample_size", "2",
        "--batch_size", "2", "--bf16", "0", "--eta", "0.0",
        "--constraint", "sr_averagepooling", "--constraint_proj", "svd",
        "--test_dir", str(tmp_path / "outc")])
    log = main(args, config)
    assert {"mse", "psner", "ssim", "const_f_loss"} <= set(log)


def test_edm_sample_cli(store, tmp_path):
    from nlc_tpu.cli.edm_image_sample import get_args, main
    args, config = get_args([
        "--config", "cifar10", "--config_path", "tinyedm", "--store_dir", store,
        "--num_timesteps", "4", "--sample_size", "2", "--batch_size", "2",
        "--bf16", "0", "--sigma_type", "base,base",
        "--test_dir", str(tmp_path / "edm")])
    main(args, config)
    assert len(os.listdir(os.path.join(args.test_dir, "0", "images"))) == 2


def test_edm_sample_cli_restart(store, tmp_path):
    """--restart: Restart-sampling intervals through the EDM CLI."""
    from nlc_tpu.cli.edm_image_sample import get_args, main
    args, config = get_args([
        "--config", "cifar10", "--config_path", "tinyedm", "--store_dir", store,
        "--num_timesteps", "4", "--sample_size", "2", "--batch_size", "2",
        "--bf16", "0", "--sigma_type", "base,base",
        "--restart", "1.0,10.0,1,2",
        "--test_dir", str(tmp_path / "edmr")])
    main(args, config)
    assert len(os.listdir(os.path.join(args.test_dir, "0", "images"))) == 2


def test_train_cli_period_zero_saves_final_only(store, tmp_path):
    """save/eval period <= 0 (extension for resumable chunked drivers):
    only the final-epoch checkpoint is written and no eval fires; the
    reference's periodic semantics (incl. the ep-0 fire) are untouched for
    positive periods (covered by test_train_cli_and_resume)."""
    from nlc_tpu.cli.run_image_experiment import get_args, main
    args, config = get_args([
        "--config", "celeba", "--config_path", "tiny", "--store_dir", store,
        "--epoch", "3", "--iter_per_epoch", "2", "--eval_per_epoch", "0",
        "--save_per_epoch", "0", "--batch_size", "2", "--bf16", "0",
        "--sigma_block", "2", "--num_timesteps", "3",
        "--result_dir", str(tmp_path / "p0")])
    main(args, config)
    run_dir = os.path.join(str(tmp_path / "p0"), "celeba", "0")
    cks = sorted(d for d in os.listdir(run_dir) if d.startswith("sigma_ckpt"))
    assert cks == ["sigma_ckpt_2"], cks
    assert not os.path.exists(os.path.join(run_dir, "train_logs.tsv"))


def test_train_cli_and_resume(store, tmp_path):
    from nlc_tpu.cli.run_image_experiment import get_args, main
    args, config = get_args([
        "--config", "celeba", "--config_path", "tiny", "--store_dir", store,
        "--epoch", "1", "--iter_per_epoch", "2", "--eval_per_epoch", "5",
        "--save_per_epoch", "1", "--batch_size", "2", "--bf16", "0",
        "--sigma_block", "2", "--num_timesteps", "3",
        "--result_dir", str(tmp_path / "train")])
    main(args, config)
    run_dir = os.path.join(str(tmp_path / "train"), "celeba", "0")
    assert os.path.isdir(os.path.join(run_dir, "sigma_ckpt_0"))
    assert os.path.isdir(os.path.join(run_dir, "ema_sigma_ckpt_0"))
    # resume path: checkpoint loads
    from nlc_tpu.io.checkpoints import load_pytree
    ck = load_pytree(os.path.join(run_dir, "sigma_ckpt_0"))
    assert "params" in ck
    # full resume: model + ema + optimizer state restore into typed containers
    # (reference run_image_experiment.py:73-75 resume flags)
    args2, config2 = get_args([
        "--config", "celeba", "--config_path", "tiny", "--store_dir", store,
        "--epoch", "1", "--iter_per_epoch", "2", "--eval_per_epoch", "5",
        "--save_per_epoch", "1", "--batch_size", "2", "--bf16", "0",
        "--sigma_block", "2", "--num_timesteps", "3",
        "--resume_model", os.path.join(run_dir, "sigma_ckpt_0"),
        "--resume_ema_model", os.path.join(run_dir, "ema_sigma_ckpt_0"),
        "--resume_optim", os.path.join(run_dir, "optim_state"),
        "--result_dir", str(tmp_path / "train")])
    main(args2, config2)
    run_dir2 = os.path.join(str(tmp_path / "train"), "celeba", "1")
    opt2 = load_pytree(os.path.join(run_dir2, "optim_state"))
    # resumed run continued counting steps from the first run's optim state
    assert int(np.asarray(opt2["step"])) == 4


def test_image_sample_parallel_picard(store, tmp_path):
    """--parallel_window: parallel-in-time sampling through the CLI (smoke +
    bad-window error)."""
    from nlc_tpu.cli.image_sample import get_args, main
    common = ["--config", "celeba", "--config_path", "tiny", "--store_dir",
              store, "--method", "base", "--sampling", "denoise",
              "--num_timesteps", "4", "--max_T", "4", "--sample_size", "2",
              "--batch_size", "2", "--bf16", "0", "--eta", "0.0"]
    args, config = get_args(common + ["--parallel_window", "2",
                                      "--picard_iters", "2",
                                      "--test_dir", str(tmp_path / "pp")])
    main(args, config)
    assert len(os.listdir(os.path.join(args.test_dir, "0", "images"))) == 2
    args2, config2 = get_args(common + ["--parallel_window", "3",
                                        "--test_dir", str(tmp_path / "bad")])
    with pytest.raises(SystemExit):
        main(args2, config2)


def test_edm_train_cli_and_resume(store, tmp_path):
    """EDM sigma-trainer CLI smoke (synthetic data, random frozen eps) +
    --load_folder / resume flags (reference run_edm_experiment.py:63-69)."""
    from nlc_tpu.cli.run_edm_experiment import get_args, main
    from nlc_tpu.io.checkpoints import load_pytree

    common = ["--config", "cifar10", "--config_path", "tinyedm",
              "--store_dir", store, "--epoch", "1", "--iter_per_epoch", "2",
              "--eval_per_epoch", "5", "--save_per_epoch", "1",
              "--batch_size", "2", "--bf16", "0", "--sigma_block", "2",
              "--num_timesteps", "3",
              "--result_dir", str(tmp_path / "edmtrain")]
    args, config = get_args(common)
    main(args, config)
    run_dir = os.path.join(str(tmp_path / "edmtrain"), "cifar10", "0")
    assert os.path.isdir(os.path.join(run_dir, "sigma_ckpt_0"))

    # resume into the SAME run dir (--load_folder) with full state restore
    args2, config2 = get_args(common + [
        "--load_folder", "0",
        "--resume_model", os.path.join(run_dir, "sigma_ckpt_0"),
        "--resume_ema_model", os.path.join(run_dir, "ema_sigma_ckpt_0"),
        "--resume_optim", os.path.join(run_dir, "optim_state")])
    main(args2, config2)
    opt2 = load_pytree(os.path.join(run_dir, "optim_state"))
    assert int(np.asarray(opt2["step"])) == 4  # continued, not restarted
    # no new numbered run dir was allocated
    assert not os.path.isdir(os.path.join(str(tmp_path / "edmtrain"),
                                          "cifar10", "1"))


def test_edm_full_train_cli_resume_state(tmp_path):
    """edm_train --resume_state must restore the optax state into TYPED
    containers and keep stepping: orbax without a `target` returns raw
    nested dicts (NamedTuple structure lost) and the first tx.update after
    resume crashed on `state.mu` (regression found by a verify drive)."""
    import glob
    from PIL import Image
    from nlc_tpu.cli.edm_train import get_args, main

    data = tmp_path / "data"
    data.mkdir()
    rng = np.random.RandomState(0)
    for i in range(32):
        Image.fromarray(rng.randint(0, 255, (16, 16, 3), np.uint8)).save(
            str(data / f"{i:03d}.png"))
    run = str(tmp_path / "run")
    argv = ["--data", str(data), "--run_dir", run, "--arch", "ddpmpp",
            "--resolution", "16", "--model_channels", "8",
            "--channel_mult", "1,2", "--num_blocks", "1", "--dropout", "0.0",
            "--augment", "0", "--duration_kimg", "1", "--batch", "16",
            "--kimg_per_tick", "1", "--snapshot_ticks", "1", "--bf16", "0"]
    main(get_args(argv))
    states = sorted(glob.glob(os.path.join(run, "training-state-*")))
    assert states, "training loop wrote no state dump"

    argv2 = list(argv)
    argv2[argv2.index("--duration_kimg") + 1] = "2"
    main(get_args(argv2 + ["--resume_state", states[-1]]))
    stats = [json.loads(l) for l in open(os.path.join(run, "stats.jsonl"))]
    assert stats[-1]["Progress/kimg"] >= 2.0
    assert all(np.isfinite(s["Loss/loss"]) for s in stats)


def test_edm_train_state_dump_carries_ema_and_wall_budget(tmp_path):
    """Two round-4 resume-safety properties: (1) training-state dumps carry
    ema_params and --resume_state restores them exactly (the old dumps
    omitted the EMA, so every resumed run silently restarted its EMA from
    the fresh random init and contaminated snapshots for ~a halflife);
    (2) --max_wall_s exits cleanly at a tick boundary with a resumable
    state dump, instead of relying on an outer `timeout` SIGTERM."""
    import glob
    import jax
    from PIL import Image
    from nlc_tpu.cli.edm_train import get_args, main
    from nlc_tpu.io.checkpoints import load_pytree

    data = tmp_path / "data"
    data.mkdir()
    rng = np.random.RandomState(0)
    for i in range(32):
        Image.fromarray(rng.randint(0, 255, (16, 16, 3), np.uint8)).save(
            str(data / f"{i:03d}.png"))
    run = str(tmp_path / "run")
    # lr 10: the default 10000-kimg lr ramp scales step-one-kimg updates to
    # ~1e-4*lr, and the ema-vs-params delta (a fraction of one update) must
    # stay above fp32 ulp for the identity check below to be meaningful
    argv = ["--data", str(data), "--run_dir", run, "--arch", "ddpmpp",
            "--resolution", "16", "--model_channels", "8",
            "--channel_mult", "1,2", "--num_blocks", "1", "--dropout", "0.0",
            "--augment", "0", "--duration_kimg", "1", "--batch", "16",
            "--kimg_per_tick", "1", "--snapshot_ticks", "1",
            "--state_dump_ticks", "1", "--bf16", "0", "--lr", "10"]
    main(get_args(argv))
    states = sorted(glob.glob(os.path.join(run, "training-state-*")))
    assert states, "training loop wrote no state dump"

    dump = load_pytree(states[-1])
    assert "ema_params" in dump, "training-state dump lacks ema_params"
    p_leaves = jax.tree_util.tree_leaves(dump["params"])
    e_leaves = jax.tree_util.tree_leaves(dump["ema_params"])
    assert any(np.abs(np.asarray(p) - np.asarray(e)).max() > 0
               for p, e in zip(p_leaves, e_leaves)), \
        "ema identical to params — EMA never updated?"

    # resume consumes the 4-key dump (typed ema restore path), and a
    # --max_wall_s budget exits cleanly before duration with a fresh dump
    argv2 = list(argv)
    argv2[argv2.index("--duration_kimg") + 1] = "5"
    main(get_args(argv2 + ["--resume_state", states[-1],
                           "--max_wall_s", "0"]))
    stats = [json.loads(l) for l in open(os.path.join(run, "stats.jsonl"))]
    assert stats[-1]["Progress/kimg"] < 5.0, "max_wall_s=0 did not stop early"
    states2 = sorted(glob.glob(os.path.join(run, "training-state-*")))
    assert "ema_params" in load_pytree(states2[-1])

    # pre-round-4 dumps lack ema_params: the fallback path must restore
    # params/opt and restart the EMA from them instead of crashing
    from nlc_tpu.io.checkpoints import save_pytree
    old = dict(load_pytree(states[-1]))
    old.pop("ema_params")
    old_dir = str(tmp_path / "oldstate")
    save_pytree(old, old_dir)
    main(get_args(argv2 + ["--resume_state", old_dir, "--max_wall_s", "0"]))


def test_sample_cli_loads_orbax_checkpoints(store, tmp_path):
    """--load_eps/--load_sigma accept orbax dirs (trainer checkpoints and
    convert_checkpoint output), not just torch files."""
    import jax
    import jax.numpy as jnp
    from nlc_tpu.cli.image_sample import (get_args, main,
                                          build_models_and_params)
    from nlc_tpu.io.checkpoints import save_pytree

    # build random variables once and save them as orbax dirs
    args0, config0 = get_args([
        "--config", "celeba", "--config_path", "tiny", "--store_dir", store,
        "--method", "base", "--max_T", "2", "--batch_size", "2", "--bf16", "0"])
    _, params, svars, _ = build_models_and_params(args0, config0)
    eps_dir = str(tmp_path / "eps")
    sig_dir = str(tmp_path / "sigma")
    save_pytree(params, eps_dir)
    save_pytree(svars, sig_dir)

    args, config = get_args([
        "--config", "celeba", "--config_path", "tiny", "--store_dir", store,
        "--method", "base", "--max_T", "2", "--sample_size", "2",
        "--batch_size", "2", "--bf16", "0", "--eta", "0.0",
        "--load_eps", eps_dir, "--load_sigma", sig_dir,
        "--test_dir", str(tmp_path / "out")])
    main(args, config)
    assert len(os.listdir(os.path.join(args.test_dir, "0", "images"))) == 2
    # determinism: same params via orbax == same params in memory
    _, params2, svars2, _ = build_models_and_params(args, config)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_result_evaluater(tmp_path):
    from nlc_tpu.cli.result_evaluater import main
    from nlc_tpu.utils.image_io import save_image
    rng = np.random.RandomState(0)
    base = tmp_path / "res" / "celeba" / "sr" / "0" / "0"
    (base / "images").mkdir(parents=True)
    (base / "transform").mkdir(parents=True)
    for i in range(3):
        img = rng.rand(16, 16, 3)
        save_image(img, str(base / "images" / f"00-00000-{i:03}.png"))
        save_image(np.clip(img + 0.05, 0, 1),
                   str(base / "transform" / f"orig_00-00000-{i:03}.png"))
    rows = main(["--results_root", str(tmp_path / "res")])
    assert len(rows) == 1
    assert "psnr" in rows[0] and rows[0]["n_matched"] == 3
    assert os.path.exists(base / "img_results.json")
    assert os.path.exists(tmp_path / "res" / "summary.csv")


@pytest.mark.skipif(not __import__("os").path.isdir("/root/reference"),
                    reason="reference not available")
def test_convert_checkpoint_cli(store, tmp_path):
    """Offline torch->orbax conversion: converted+saved params match the torch
    model through the public DDIMUNet apply."""
    import sys, types, torch
    import jax, jax.numpy as jnp
    sys.path.insert(0, "/root/reference")
    from tests.test_engine import _stub_missing_reference_deps
    _stub_missing_reference_deps()
    from src.unet_simple import Model as TorchModel

    cfgm = types.SimpleNamespace(ch=32, out_ch=3, ch_mult=[1, 2],
                                 num_res_blocks=1, attn_resolutions=[8],
                                 dropout=0.0, in_channels=3,
                                 resamp_with_conv=True, type="simple",
                                 feat_layer=0)
    tcfg = types.SimpleNamespace(
        model=cfgm, data=types.SimpleNamespace(image_size=16),
        diffusion=types.SimpleNamespace(num_diffusion_timesteps=1000))
    torch.manual_seed(0)
    tm = TorchModel(tcfg).eval()
    src = tmp_path / "eps.ckpt"
    torch.save(tm.state_dict(), src)

    from nlc_tpu.cli.convert_checkpoint import main as conv_main
    paths = conv_main(["--family", "nlc", "--config", "celeba",
                       "--config_path", "tiny", "--store_dir", store,
                       "--load_eps", str(src), "--dst", str(tmp_path / "out")])
    from nlc_tpu.io.checkpoints import load_pytree
    eps = load_pytree(paths[0])

    from nlc_tpu.models.ddim_unet import DDIMUNet, DDIMUNetConfig
    net = DDIMUNet(DDIMUNetConfig(ch=32, out_ch=3, ch_mult=(1, 2),
                                  num_res_blocks=1, attn_resolutions=(8,),
                                  in_channels=3, resolution=16))
    x = np.random.RandomState(0).randn(2, 3, 16, 16).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x), torch.tensor([5.0, 9.0])).numpy()
    got = net.apply(eps, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                    jnp.asarray([5.0, 9.0]))
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)),
                               ref, atol=1e-4)

    with pytest.raises(SystemExit):
        conv_main(["--family", "nlc", "--load_eps", "nope", "--dst", "x"])
    with pytest.raises(SystemExit):
        conv_main(["--family", "nlc", "--dst", "x"])


def test_cifar10_eval_dataset_order(tmp_path):
    """CIFAR10 branch mirrors the reference: all items in seeded-2019
    shuffled order (reference datasets/__init__.py:195-215 uses split
    fraction 0.0, i.e. the whole shuffled set)."""
    from PIL import Image
    from nlc_tpu.data import get_eval_dataset
    import os
    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.RandomState(0)
    for i in range(10):
        Image.fromarray((rng.rand(8, 8, 3) * 255).astype(np.uint8)).save(
            d / f"{i:03}.png")
    ds = get_eval_dataset("CIFAR10", image_size=8, data_dir=str(d))
    idx = list(range(10))
    rs = np.random.get_state()
    np.random.seed(2019)
    np.random.shuffle(idx)
    np.random.set_state(rs)
    assert [os.path.basename(f) for f in ds.files] == \
        [f"{i:03}.png" for i in idx]


def test_serve_endpoints(store, tmp_path):
    """HTTP inference server: healthz, warm /sample, /restore roundtrip,
    clean errors."""
    import base64, io, json, threading, urllib.request
    from http.server import ThreadingHTTPServer
    from PIL import Image
    from nlc_tpu.cli.image_sample import get_args
    from nlc_tpu.cli.serve import NLCService, make_handler

    args, config = get_args([
        "--config", "celeba", "--config_path", "tiny", "--store_dir", store,
        "--method", "default", "--sampling", "denoise", "--sigma_type", "pred",
        "--norm_eps", "1", "--refine_sigma", "1", "--num_timesteps", "3",
        "--max_T", "3", "--batch_size", "2", "--bf16", "0", "--eta", "0.0"])
    service = NLCService(args, config)
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        h = json.load(urllib.request.urlopen(f"{base}/healthz"))
        assert h["status"] == "ok" and h["resolution"] == 16

        r = json.load(urllib.request.urlopen(urllib.request.Request(
            f"{base}/sample?n=2&seed=3", method="POST"), timeout=300))
        assert len(r["images"]) == 2
        im = Image.open(io.BytesIO(base64.b64decode(r["images"][0])))
        assert im.size == (16, 16)

        buf = io.BytesIO()
        Image.fromarray((np.random.RandomState(0).rand(24, 24, 3) * 255)
                        .astype(np.uint8)).save(buf, format="PNG")
        req = urllib.request.Request(
            f"{base}/restore?constraint=sr_averagepooling",
            data=buf.getvalue(), method="POST")
        out = urllib.request.urlopen(req, timeout=600)
        assert out.headers["Content-Type"] == "image/png"
        rim = Image.open(io.BytesIO(out.read()))
        assert rim.size == (16, 16)

        # error probes return JSON, not a dead worker
        bad = urllib.request.Request(f"{base}/restore", data=b"x",
                                     method="POST")
        try:
            urllib.request.urlopen(bad, timeout=60)
            assert False
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.shutdown()


def test_serve_coalescing(store):
    """Concurrent same-kind requests pack into ONE device launch, and
    per-sample seeding makes each image identical however it was packed."""
    from concurrent.futures import ThreadPoolExecutor
    from nlc_tpu.cli.image_sample import get_args
    from nlc_tpu.cli.serve import NLCService

    args, config = get_args([
        "--config", "celeba", "--config_path", "tiny", "--store_dir", store,
        "--method", "default", "--sampling", "denoise", "--sigma_type", "base",
        "--num_timesteps", "2", "--max_T", "2", "--batch_size", "4",
        "--bf16", "0", "--eta", "0.0"])
    service = NLCService(args, config, coalesce_ms=1000.0)
    base = service.coalescer.n_launches

    with ThreadPoolExecutor(max_workers=3) as ex:
        futs = [ex.submit(service.sample, 1, seed) for seed in (5, 6, 7)]
        results = [f.result(timeout=300) for f in futs]
    assert service.coalescer.n_launches == base + 1, "requests not coalesced"
    assert service.coalescer.n_requests >= 4  # warmup + the three above

    # bit-identical to a solo request for the same seed
    solo = service.sample(1, seed=6)
    np.testing.assert_array_equal(results[1][0], solo[0])
    # different seeds produce different images
    assert not np.array_equal(results[0][0], results[2][0])


def test_make_fid_stats_cli(tmp_path):
    from PIL import Image
    from nlc_tpu.cli.make_fid_stats import main as stats_main
    from nlc_tpu.eval.fid import FIDComputer
    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.RandomState(0)
    for i in range(6):
        Image.fromarray((rng.rand(16, 16, 3) * 255).astype(np.uint8)).save(
            d / f"{i}.png")
    out = stats_main(["--images_dir", str(d),
                      "--out", str(tmp_path / "s.npz")])
    with np.load(out) as f:
        assert set(f.files) == {"mu", "sigma"}
    fid = FIDComputer(target=out)
    assert abs(fid.fid_of_dir(str(d))) < 1e-3      # self-distance ~ 0
    with pytest.raises(SystemExit):
        stats_main(["--images_dir", str(tmp_path / "nope"), "--out", "x.npz"])


def test_edm_sample_cli_quant_and_pred_fast(store, tmp_path):
    """--quant routes the SongUNet 3x3 convs through the W8A8 path and
    --sigma_type pred_fast,pred_fast uses the fused sub-step (the study32
    extension cells, VERDICT r2 #1)."""
    from nlc_tpu.cli.edm_image_sample import get_args, main
    args, config = get_args([
        "--config", "cifar10", "--config_path", "tinyedm", "--store_dir", store,
        "--num_timesteps", "4", "--sample_size", "2", "--batch_size", "2",
        "--bf16", "0", "--sigma_type", "pred_fast,pred_fast",
        "--quant", "taps",
        "--test_dir", str(tmp_path / "edmq")])
    main(args, config)
    assert len(os.listdir(os.path.join(args.test_dir, "0", "images"))) == 2


def test_train_cli_load_folder_resumes_into_same_run_dir(store, tmp_path):
    """--load_folder must route a resumed chunk INTO the named run dir
    (run_edm_experiment semantics) — it was previously parsed but ignored,
    so chunk 2's checkpoints landed in a fresh dir while chunked callers
    kept reading the old one (the round-5 ADM-study half-head bug)."""
    from nlc_tpu.cli.run_image_experiment import get_args, main
    from nlc_tpu.io.checkpoints import load_pytree
    base = ["--config", "celeba", "--config_path", "tiny", "--store_dir",
            store, "--epoch", "1", "--iter_per_epoch", "2",
            "--eval_per_epoch", "5", "--save_per_epoch", "1",
            "--batch_size", "2", "--bf16", "0", "--sigma_block", "2",
            "--num_timesteps", "3", "--result_dir", str(tmp_path / "train")]
    main(*get_args(base))
    run_dir = os.path.join(str(tmp_path / "train"), "celeba", "0")
    args2, config2 = get_args(base + [
        "--load_folder", "0",
        "--resume_model", os.path.join(run_dir, "sigma_ckpt_0"),
        "--resume_ema_model", os.path.join(run_dir, "ema_sigma_ckpt_0"),
        "--resume_optim", os.path.join(run_dir, "optim_state")])
    main(args2, config2)
    # no auto-incremented dir; the resumed chunk overwrote dir 0's ckpts
    assert not os.path.exists(
        os.path.join(str(tmp_path / "train"), "celeba", "1"))
    opt = load_pytree(os.path.join(run_dir, "optim_state"))
    assert int(np.asarray(opt["step"])) == 4
