"""Self-hosted EDM noise-level-correction study at 32² (CIFAR-class).

Round-1 validated the NLC mechanism fully self-hosted at 16² (docs/
BENCHMARKS.md "Self-hosted scientific validation"); this driver scales the
same zero-asset pipeline to the reference's CIFAR-10 class config — ddpmpp
SongUNet 55.7M at 32², 18-step Heun (edm_image_sample.py defaults) — to
reproduce the reference's documented style ordering (its comment log at
edm_image_sample.py:92-99: corrected ~ base at the accurate 18-step grid,
corrected wins in the few-step regime).

Every stage is idempotent and resumable (the tunneled chip can wedge
mid-run): rerun `python benchmarks/study32.py auto` until it prints DONE.
Stages: data -> stats -> train (edm_train, resume via training-state dumps)
-> head (run_edm_experiment, resume via sigma_ckpt chunks) -> sweep
(edm_image_sample grid; per-cell results.json are the markers).

All FID values use the dependency-free fallback embedding (stamped
`fid_backend: fallback` in results.json) — relative comparisons only.
"""
from __future__ import annotations

import glob
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# default to the repo-root study32/ (gitignored) so the artifacts land where
# tests/test_quant.py's calibration regression resolves them
STUDY = os.environ.get(
    "NLC_STUDY_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "study32"))
DATA = os.path.join(STUDY, "data")
FID_NPZ = os.path.join(STUDY, "fid.npz")
EDM_RUN = os.path.join(STUDY, "edm")
SIGMA_DIR = os.path.join(STUDY, "sigma")
SWEEP = os.path.join(STUDY, "sweep")

# wall budget for the train stage's clean exit (see study64.py)
BUDGET_S = float(os.environ.get("NLC_STUDY_BUDGET_S", "3800"))
_T0 = time.monotonic()

N_IMAGES = 4096
RESOLUTION = 32
TRAIN_KIMG = 600          # ~15 min on the bench chip at 1.55 s/kimg
TRAIN_BATCH = 256
HEAD_EPOCHS_TOTAL = 56    # x HEAD_ITERS = 28k steps >> EMA halflife (~1400)
HEAD_CHUNK_EPOCHS = 8     # one resumable slice (~bounded chip exposure)
HEAD_ITERS = 500
HEAD_BATCH = 128
SAMPLE_SIZE = 2048
SWEEP_BATCH = 256
SWEEP_GRID = [          # (steps, style, quant) — style pairs per engine/edm.py
    (18, "base,base", ""),
    (18, "pred_partial,pred", ""),
    (18, "pred_partial,pred_partial", ""),
    (5, "base,base", ""),
    (5, "pred_partial,pred", ""),
    (5, "pred_partial,pred_partial", ""),
    (3, "base,base", ""),
    (3, "pred_partial,pred", ""),
    # round-3 extension cells (VERDICT r2 #1): measure the FID deltas that
    # gate (a) the int8 bench default and (b) the pred_fast quality claim,
    # against the bf16 'pred' cells above.
    (18, "pred_partial,pred", "conv"),
    (5, "pred_partial,pred", "conv"),
    (18, "pred_fast,pred_fast", ""),
    (5, "pred_fast,pred_fast", ""),
    (5, "pred_fast,pred_fast", "conv"),
    # round-3 boundary bisection: 18-step pred_fast beat 'pred' (6.66 vs
    # 7.56) while 5-step collapsed (93.9 vs 13.3) — locate where the
    # eps-at-uncorrected-t approximation stops being quality-safe.
    (10, "pred_partial,pred", ""),
    (10, "pred_fast,pred_fast", ""),
    (8, "pred_partial,pred", ""),
    (8, "pred_fast,pred_fast", ""),
]


def gen_image(i: int, res: int):
    """Structured synthetic image: smooth two-color gradient background +
    1-4 soft gaussian blobs + optional ring, from a small palette. Enough
    composition structure for FID to rank models, fully deterministic."""
    import numpy as np
    rng = np.random.RandomState(1000 + i)
    yy, xx = np.mgrid[0:res, 0:res] / (res - 1.0)
    palette = np.array([
        [0.86, 0.24, 0.22], [0.22, 0.48, 0.82], [0.95, 0.77, 0.22],
        [0.25, 0.68, 0.38], [0.58, 0.32, 0.72], [0.92, 0.50, 0.20],
    ])
    c0, c1 = palette[rng.choice(len(palette), 2, replace=False)]
    ang = rng.rand() * 2 * np.pi
    t = (np.cos(ang) * xx + np.sin(ang) * yy + 1) / 2
    img = c0[None, None] * (1 - t[..., None]) + c1[None, None] * t[..., None]
    for _ in range(rng.randint(1, 5)):
        cy, cx = rng.rand(2) * 0.8 + 0.1
        r = rng.rand() * 0.18 + 0.08
        col = palette[rng.randint(len(palette))]
        d2 = (yy - cy) ** 2 + (xx - cx) ** 2
        w = np.exp(-d2 / (2 * r * r))[..., None]
        img = img * (1 - 0.9 * w) + col[None, None] * 0.9 * w
    if rng.rand() < 0.5:  # ring
        cy, cx = rng.rand(2) * 0.6 + 0.2
        r0 = rng.rand() * 0.15 + 0.12
        d = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
        w = np.exp(-((d - r0) / 0.035) ** 2)[..., None]
        col = palette[rng.randint(len(palette))]
        img = img * (1 - w) + col[None, None] * w
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def stage_data():
    import numpy as np
    from PIL import Image
    os.makedirs(DATA, exist_ok=True)
    done = len(glob.glob(os.path.join(DATA, "*.png")))
    if done >= N_IMAGES and os.path.exists(os.path.join(STUDY, "norm.json")):
        return True
    for i in range(N_IMAGES):
        p = os.path.join(DATA, f"{i:05d}.png")
        if not os.path.exists(p):
            Image.fromarray(gen_image(i, RESOLUTION)).save(p)
    # calibrate norm_max like the reference's cal_data_norm quantiles
    arrs = []
    for i in range(0, N_IMAGES, 4):
        a = np.asarray(Image.open(os.path.join(DATA, f"{i:05d}.png")),
                       np.float32) / 127.5 - 1
        arrs.append(np.linalg.norm(a.ravel()))
    norms = np.array(arrs)
    stats = {"mean": float(norms.mean()), "p995": float(np.quantile(norms, .995)),
             "max": float(norms.max())}
    with open(os.path.join(STUDY, "norm.json"), "w") as f:
        json.dump(stats, f)
    print("data:", N_IMAGES, "images; norm stats", stats)
    return True


def stage_stats():
    if os.path.exists(FID_NPZ):
        return True
    from nlc_tpu.cli.make_fid_stats import main as stats_main
    stats_main(["--images_dir", DATA, "--out", FID_NPZ])
    return os.path.exists(FID_NPZ)


def _latest(pattern):
    cands = sorted(glob.glob(pattern))
    return cands[-1] if cands else None


def stage_train():
    snap = _latest(os.path.join(EDM_RUN, "network-snapshot-*"))
    if snap and int(re.search(r"(\d+)$", snap).group(1)) >= TRAIN_KIMG:
        return True
    from nlc_tpu.cli.edm_train import get_args, main
    # resumable at 50-kimg granularity + clean in-budget exit (see study64)
    remaining = max(600.0, BUDGET_S - (time.monotonic() - _T0))
    argv = ["--data", DATA, "--run_dir", EDM_RUN, "--arch", "ddpmpp",
            "--resolution", str(RESOLUTION), "--model_channels", "128",
            "--channel_mult", "2,2,2", "--num_blocks", "4",
            "--duration_kimg", str(TRAIN_KIMG), "--batch", str(TRAIN_BATCH),
            "--lr", "1e-3", "--ema_halflife_kimg", "50",
            "--kimg_per_tick", "50", "--snapshot_ticks", "1",
            "--state_dump_ticks", "1", "--max_wall_s", str(remaining),
            "--dropout", "0.13", "--augment", "0.12"]
    state = _latest(os.path.join(EDM_RUN, "training-state-*"))
    if state:
        argv += ["--resume_state", state]
    main(get_args(argv))
    snap = _latest(os.path.join(EDM_RUN, "network-snapshot-*"))
    return bool(snap and int(re.search(r"(\d+)$", snap).group(1)) >= TRAIN_KIMG)


def _head_epochs_done():
    p = os.path.join(STUDY, "head_progress.json")
    if not os.path.exists(p):
        return 0
    with open(p) as f:
        return json.load(f)["epochs_done"]


def stage_head():
    """The sigma loop numbers epochs from 0 each invocation, so cumulative
    progress lives in head_progress.json; every chunk runs exactly
    HEAD_CHUNK_EPOCHS epochs resuming from the previous chunk's final
    checkpoint (fixed name: sigma_ckpt_{HEAD_CHUNK_EPOCHS-1})."""
    done = _head_epochs_done()
    if done >= HEAD_EPOCHS_TOTAL:
        return True
    snap = _latest(os.path.join(EDM_RUN, "network-snapshot-*"))
    assert snap, "train stage incomplete"
    from nlc_tpu.cli.run_edm_experiment import get_args, main
    last = HEAD_CHUNK_EPOCHS - 1
    argv = ["--config", "cifar10", "--load_eps", snap, "--data_dir", DATA,
            "--fid_target", FID_NPZ, "--result_dir", SIGMA_DIR,
            "--epoch", str(HEAD_CHUNK_EPOCHS),
            # save/eval period 0 = final-save-only / eval-off extension
            # (train/loop.py): a periodic value would ALSO fire at ep 0
            # (reference semantics), clobbering the previous chunk's
            # optim_state one epoch into the chunk and running 2 unwanted
            # on-chip FID evals per chunk
            "--iter_per_epoch", str(HEAD_ITERS), "--save_per_epoch", "0",
            "--eval_per_epoch", "0", "--batch_size", str(HEAD_BATCH),
            "--ema_rate", "0.9995", "--lr", "3e-4"]
    # the CLI nests runs under result_dir/<config>/<run-id>
    d = os.path.join(SIGMA_DIR, "cifar10", "0")
    if done:
        argv += ["--load_folder", "0",
                 "--resume_model", os.path.join(d, f"sigma_ckpt_{last}"),
                 "--resume_ema_model", os.path.join(d, f"ema_sigma_ckpt_{last}"),
                 "--resume_optim", os.path.join(d, "optim_state")]
    elif os.path.isdir(d):
        argv += ["--load_folder", "0"]
    a, c = get_args(argv)
    main(a, c)
    with open(os.path.join(STUDY, "head_progress.json"), "w") as f:
        json.dump({"epochs_done": done + HEAD_CHUNK_EPOCHS}, f)
    return done + HEAD_CHUNK_EPOCHS >= HEAD_EPOCHS_TOTAL


def _cell_dir(steps, style, quant=""):
    suffix = f"_int8{quant}" if quant else ""
    return os.path.join(SWEEP, f"s{steps}_{style.replace(',', '-')}{suffix}")


def stage_sweep():
    snap = _latest(os.path.join(EDM_RUN, "network-snapshot-*"))
    assert snap, "train stage incomplete"
    assert _head_epochs_done() >= HEAD_EPOCHS_TOTAL, \
        "head stage incomplete — sweeping with an undertrained head would " \
        "write results.json markers the resume logic never redoes"
    head = os.path.join(SIGMA_DIR, "cifar10", "0",
                        f"ema_sigma_ckpt_{HEAD_CHUNK_EPOCHS - 1}")
    with open(os.path.join(STUDY, "norm.json")) as f:
        norm_max = json.load(f)["p995"]
    from nlc_tpu.cli.edm_image_sample import get_args, main
    all_done = True
    for steps, style, quant in SWEEP_GRID:
        out = _cell_dir(steps, style, quant)
        if os.path.exists(os.path.join(out, "0", "results.json")):
            continue
        argv = ["--config", "cifar10", "--load_eps", snap,
                "--load_sigma", head, "--fid_target", FID_NPZ,
                "--sigma_type", style, "--num_timesteps", str(steps),
                "--sample_size", str(SAMPLE_SIZE),
                "--batch_size", str(SWEEP_BATCH),
                "--save_folder", out]
        if quant:
            argv += ["--quant", quant]
        a, c = get_args(argv)
        a.norm_max = norm_max      # calibrated from OUR data, not CIFAR's
        a.norm_min = 0.0
        r = main(a, c)
        print("cell", steps, style, quant or "bf16", "->", r)
        all_done = all_done and os.path.exists(
            os.path.join(out, "0", "results.json"))
    return all_done


def report():
    rows = []
    for steps, style, quant in SWEEP_GRID:
        p = os.path.join(_cell_dir(steps, style, quant), "0", "results.json")
        if os.path.exists(p):
            with open(p) as f:
                rows.append((steps, style, quant or "bf16",
                             json.load(f).get("fid")))
    print(json.dumps(rows, indent=1))
    return rows


STAGES = [("data", stage_data), ("stats", stage_stats), ("train", stage_train),
          ("head", stage_head), ("sweep", stage_sweep)]


def main():
    if os.environ.get("NLC_STUDY_CPU"):
        # shell-level JAX_PLATFORMS doesn't stick on this image (CLAUDE.md);
        # the config update must land before first device use
        import jax
        jax.config.update("jax_platforms", "cpu")
    which = sys.argv[1] if len(sys.argv) > 1 else "auto"
    if which == "report":
        report()
        return
    if os.path.exists(os.path.join(STUDY, "DEFER")):
        # pause marker: lets an operator re-queue the study behind more
        # urgent chip work without killing anything mid-compile (killing
        # jobs wedges the tunneled device — docs/BENCHMARKS.md)
        print("study deferred (remove DEFER marker to resume)")
        return
    os.makedirs(STUDY, exist_ok=True)
    for name, fn in STAGES:
        if which not in ("auto", name):
            continue
        print(f"== stage {name} ==", flush=True)
        ok = fn()
        print(f"== stage {name}: {'complete' if ok else 'INCOMPLETE'} ==",
              flush=True)
        if which == name or not ok:
            return
    print("DONE")
    report()


if __name__ == "__main__":
    main()
