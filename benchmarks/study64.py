"""Self-hosted 64² study cell: the pred_fast validity boundary at a second
spatial scale (VERDICT r3 #6).

Round 3 bisected pred_fast's boundary at 32² only (safe at 18 steps, broken
at <=10 — docs/BENCHMARKS.md); the recommendation was extrapolated to the
256² flagship where per-step sigma jumps differ. This runs the same
zero-asset pipeline at 64² (ffhq-class SongUNet config, reference
edm_image_sample.py:99) with the minimal 6-cell grid the verdict asked for:
{base, pred, pred_fast} x {18, 10} steps, 1024 samples — plus two bonus
int8-conv cells (pred @ 18/10) so the int8 FID-neutrality evidence exists
at a second spatial scale (ADVICE r3 #3's extrapolation concern).

Same stage/resume discipline as study32.py (idempotent; rerun
`python benchmarks/study64.py auto` until DONE). FID uses the fallback
embedding — relative comparisons only, stamped in results.json.
"""
from __future__ import annotations

import glob
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from study32 import gen_image, _latest  # noqa: E402  (shared helpers)

STUDY = os.environ.get(
    "NLC_STUDY64_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "study64"))
DATA = os.path.join(STUDY, "data")
FID_NPZ = os.path.join(STUDY, "fid.npz")
EDM_RUN = os.path.join(STUDY, "edm")
SIGMA_DIR = os.path.join(STUDY, "sigma")
SWEEP = os.path.join(STUDY, "sweep")

N_IMAGES = 4096
RESOLUTION = 64
# Wall-budget overrides (round-4 tail): the third VM re-image erased the
# 400-kimg model the queued base-int8 isolation cells were meant to sample,
# and a full retrain does not fit the remaining session. A shorter-trained
# fresh model with ALL compared cells re-run on it (internal controls) still
# answers the isolation question — the measurement is the int8-vs-bf16 FID
# delta within one model, not absolute quality.
TRAIN_KIMG = int(os.environ.get("NLC_STUDY64_KIMG", "400"))
TRAIN_BATCH = 128
HEAD_EPOCHS_TOTAL = int(os.environ.get("NLC_STUDY64_HEAD_EPOCHS", "24"))
HEAD_CHUNK_EPOCHS = 8
HEAD_ITERS = 500
HEAD_BATCH = 64
SAMPLE_SIZE = 1024
SWEEP_BATCH = 128
# Self-imposed wall budget: don't START a new stage or sweep cell past this
# point, so the process exits cleanly between chip programs instead of the
# queue's outer `timeout` SIGTERM-ing an in-flight compile (which has wedged
# the tunneled TPU plane before — CLAUDE.md). The longest single unit here
# is one sweep cell (~950 s compile + sampling), so 3800 + ~1100 stays well
# inside the queue's 5400 s backstop.
BUDGET_S = float(os.environ.get("NLC_STUDY_BUDGET_S", "3800"))
_T0 = time.monotonic()


def _over_budget(what: str) -> bool:
    if time.monotonic() - _T0 > BUDGET_S:
        print(f"budget exhausted before {what} ({BUDGET_S:.0f}s) — "
              "exiting cleanly for the next queue attempt", flush=True)
        return True
    return False
SWEEP_GRID = [            # (steps, style, quant) — the verdict's 6 cells
    (18, "base,base", ""),
    (18, "pred_partial,pred", ""),
    (18, "pred_fast,pred_fast", ""),
    (10, "base,base", ""),
    (10, "pred_partial,pred", ""),
    (10, "pred_fast,pred_fast", ""),
    # Bonus: int8-conv FID at a second spatial scale (the 32² study measured
    # FID-neutrality on one architecture/resolution only — ADVICE r3 #3).
    (18, "pred_partial,pred", "conv"),
    (10, "pred_partial,pred", "conv"),
    # Follow-up: the NLC int8 cells measured +6-7% vs bf16 here; these
    # isolate whether that is raw int8 drift or int8 interacting with the
    # NLC correction loop (the sigma head reads int8-perturbed features).
    (18, "base,base", "conv"),
    (10, "base,base", "conv"),
    # Round-5 (VERDICT r4 #5): few-step crossover cells — the regime where
    # the 162/322 studies demonstrated the NLC win, previously unmeasured
    # at this scale (the repo's only 64^2 quality table was anti-NLC).
    (5, "base,base", ""),
    (5, "pred_partial,pred", ""),
    (3, "base,base", ""),
    (3, "pred_partial,pred", ""),
]


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


def stage_train():
    snap = _latest(os.path.join(EDM_RUN, "network-snapshot-*"))
    if snap and int(re.search(r"(\d+)$", snap).group(1)) >= TRAIN_KIMG:
        return True
    from nlc_tpu.cli.edm_train import get_args, main
    # ffhq-64 class config (reference edm train recipe: ch_mult 1,2,2,2)
    # state_dump_ticks=1 + max_wall_s: resumable at 50-kimg granularity and
    # exits cleanly inside the stage budget instead of eating the queue's
    # outer-timeout SIGTERM mid-chip-program (which has wedged the plane)
    remaining = max(600.0, BUDGET_S - (time.monotonic() - _T0))
    argv = ["--data", DATA, "--run_dir", EDM_RUN, "--arch", "ddpmpp",
            "--resolution", str(RESOLUTION), "--model_channels", "128",
            "--channel_mult", "1,2,2,2", "--num_blocks", "4",
            "--duration_kimg", str(TRAIN_KIMG), "--batch", str(TRAIN_BATCH),
            "--lr", "2e-4", "--ema_halflife_kimg", "50",
            "--kimg_per_tick", "50", "--snapshot_ticks", "1",
            "--state_dump_ticks", "1", "--max_wall_s", str(remaining),
            "--dropout", "0.05", "--augment", "0.15"]
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
    try:
        with open(p) as f:
            return json.load(f)["epochs_done"]
    except (ValueError, KeyError):
        # a malformed marker is also how an in-flight OLD-code attempt was
        # stopped at the train/head boundary (host-side, pre-dispatch)
        return 0


def stage_head():
    done = _head_epochs_done()
    if done >= HEAD_EPOCHS_TOTAL:
        return True
    snap = _latest(os.path.join(EDM_RUN, "network-snapshot-*"))
    assert snap, "train stage incomplete"
    from nlc_tpu.cli.run_edm_experiment import get_args, main
    last = HEAD_CHUNK_EPOCHS - 1
    argv = ["--config", "ffhq", "--load_eps", snap, "--data_dir", DATA,
            "--fid_target", FID_NPZ, "--result_dir", SIGMA_DIR,
            "--epoch", str(HEAD_CHUNK_EPOCHS),
            "--iter_per_epoch", str(HEAD_ITERS), "--save_per_epoch", "0",
            "--eval_per_epoch", "0", "--batch_size", str(HEAD_BATCH),
            "--ema_rate", "0.9995", "--lr", "3e-4"]
    d = os.path.join(SIGMA_DIR, "ffhq", "0")
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
    tag = f"_q{quant}" if quant else ""
    return os.path.join(SWEEP, f"s{steps}_{style.replace(',', '-')}{tag}")


def stage_sweep():
    snap = _latest(os.path.join(EDM_RUN, "network-snapshot-*"))
    assert snap, "train stage incomplete"
    assert _head_epochs_done() >= HEAD_EPOCHS_TOTAL, "head stage incomplete"
    head = os.path.join(SIGMA_DIR, "ffhq", "0",
                        f"ema_sigma_ckpt_{HEAD_CHUNK_EPOCHS - 1}")
    with open(os.path.join(STUDY, "norm.json")) as f:
        norm_max = json.load(f)["p995"]
    from nlc_tpu.cli.edm_image_sample import get_args, main
    all_done = True
    grid = SWEEP_GRID
    cell_filter = [t for t in
                   os.environ.get("NLC_STUDY64_CELLS", "").split(",") if t]
    if cell_filter:
        # run ONLY the named cells, in the filter's priority order, so a
        # budget exit keeps the highest-value comparisons
        by_tag = {os.path.basename(_cell_dir(s, st, q)): (s, st, q)
                  for s, st, q in SWEEP_GRID}
        unknown = [t for t in cell_filter if t not in by_tag]
        if unknown:
            raise SystemExit(
                f"NLC_STUDY64_CELLS has unknown tags {unknown}; "
                f"valid tags: {sorted(by_tag)}")
        grid = [by_tag[t] for t in cell_filter]
    for steps, style, quant in grid:
        out = _cell_dir(steps, style, quant)
        if os.path.exists(os.path.join(out, "0", "results.json")):
            continue
        if _over_budget(f"sweep cell s{steps}_{style}_{quant}") or \
                os.path.exists(os.path.join(STUDY, "DEFER")):
            return False
        argv = ["--config", "ffhq", "--load_eps", snap,
                "--load_sigma", head, "--fid_target", FID_NPZ,
                "--sigma_type", style, "--num_timesteps", str(steps),
                "--sample_size", str(SAMPLE_SIZE),
                "--batch_size", str(SWEEP_BATCH),
                "--save_folder", out]
        if quant:
            argv += ["--quant", quant]
        a, c = get_args(argv)
        a.norm_max = norm_max
        a.norm_min = 0.0
        r = main(a, c)
        print("cell", steps, style, "->", r)
        rp = os.path.join(out, "0", "results.json")
        if os.path.exists(rp):
            # Provenance stamp (ADVICE r4): record WHICH eps snapshot the
            # cell sampled, so the summarizer can assert every compared cell
            # ran on one model (a stale pre-re-image cell would otherwise
            # silently break the internal-controls claim).
            with open(rp) as f:
                rj = json.load(f)
            rj["eps_snapshot"] = os.path.abspath(snap)
            rj["eps_kimg"] = int(re.search(r"(\d+)$", snap).group(1))
            with open(rp, "w") as f:
                json.dump(rj, f, indent=1)
        all_done = all_done and os.path.exists(rp)
    return all_done


def report():
    rows = []
    for steps, style, quant in SWEEP_GRID:
        p = os.path.join(_cell_dir(steps, style, quant), "0", "results.json")
        if os.path.exists(p):
            with open(p) as f:
                rows.append((steps, style, quant, json.load(f).get("fid")))
    print(json.dumps(rows, indent=1))
    return rows


STAGES = [("data", stage_data), ("stats", stage_stats), ("train", stage_train),
          ("head", stage_head), ("sweep", stage_sweep)]


def main():
    if os.environ.get("NLC_STUDY_CPU"):
        import jax
        jax.config.update("jax_platforms", "cpu")
    which = sys.argv[1] if len(sys.argv) > 1 else "auto"
    if which == "report":
        report()
        return
    if os.path.exists(os.path.join(STUDY, "DEFER")):
        print("study deferred (remove DEFER marker to resume)")
        return
    os.makedirs(STUDY, exist_ok=True)
    for name, fn in STAGES:
        if which not in ("auto", name):
            continue
        if os.path.exists(os.path.join(STUDY, "DEFER")):
            print("study deferred mid-run (DEFER marker)", flush=True)
            return
        if _over_budget(f"stage {name}"):
            return
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
