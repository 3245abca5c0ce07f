"""Self-hosted NLC study on the ADM architecture family at 32² (VERDICT r4
next-#3).

Every prior self-hosted NLC quality study (16²/32²/64²) used SongUNet/
DDIM-class backbones, while the flagship bench and the reference's headline
FID claims run the learned-variance ADM UNet (reference image_sample.py:145,
src/unet_adm.py:396-731). This study closes that architecture axis: a
from-scratch iDDPM-trained ADM-UNet (cli/ddpm_train.py, reduced
cifar10_adm config class) + trained ADM sigma head, sampled through the
same NLC-DDIM loop/flags the flagship bench uses (ddim_simple_orig,
learned variance, eta 0.85, clamp, norm_eps, refine, threshold 960).

Cells: {18,10,5} steps x {base, pred, pred_fast} + int8-conv isolation
cells (pred@18/10 + base@18) — the NLC few-step crossover, the pred_fast
boundary, and int8 FID-neutrality, all on the ADM family.

Same stage/resume discipline as study64.py: idempotent; rerun
`python benchmarks/study32_adm.py auto` until DONE. Fallback-embedding FID
(relative comparisons within this table only).
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
    "NLC_STUDY_ADM_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "study32_adm"))
DATA = os.path.join(STUDY, "data")
FID_NPZ = os.path.join(STUDY, "fid.npz")
RUN = os.path.join(STUDY, "ddpm")
SIGMA_DIR = os.path.join(STUDY, "sigma")
SWEEP = os.path.join(STUDY, "sweep")
STORE = os.path.join(STUDY, "store")
CFG_NAME = "study_adm"

N_IMAGES = int(os.environ.get("NLC_STUDY_ADM_N", "4096"))
RESOLUTION = int(os.environ.get("NLC_STUDY_ADM_RES", "32"))
TRAIN_KIMG = int(os.environ.get("NLC_STUDY_ADM_KIMG", "300"))
TRAIN_BATCH = int(os.environ.get("NLC_STUDY_ADM_BATCH", "128"))
HEAD_EPOCHS_TOTAL = int(os.environ.get("NLC_STUDY_ADM_HEAD_EPOCHS", "16"))
HEAD_CHUNK_EPOCHS = int(os.environ.get("NLC_STUDY_ADM_HEAD_CHUNK", "8"))
HEAD_ITERS = int(os.environ.get("NLC_STUDY_ADM_HEAD_ITERS", "500"))
HEAD_BATCH = int(os.environ.get("NLC_STUDY_ADM_HEAD_BATCH", "128"))
SAMPLE_SIZE = int(os.environ.get("NLC_STUDY_ADM_SAMPLES", "1024"))
SWEEP_BATCH = int(os.environ.get("NLC_STUDY_ADM_SWEEP_BATCH", "256"))
MODEL_CHANNELS = int(os.environ.get("NLC_STUDY_ADM_CHANNELS", "128"))
CHANNEL_MULT = os.environ.get("NLC_STUDY_ADM_CHANNEL_MULT", "")
BUDGET_S = float(os.environ.get("NLC_STUDY_BUDGET_S", "3800"))
_T0 = time.monotonic()

# ADM flagship NLC-DDIM flags (bench.py / METHOD presets), fixed across cells
COMMON_FLAGS = [
    "--sampling", "denoise", "--method", "default",
    "--sampler", "ddim_simple_orig", "--sampler_var", "learned",
    "--eta", "0.85", "--clip_fn", "clamp", "--norm_eps", "1",
    "--refine_sigma", "1", "--sigma_pred_threshold", "960",
    "--continuous_t", "1", "--final_alpha_one", "1",
]

SWEEP_GRID = [            # (steps, sigma_type, quant)
    (18, "base", ""),
    (18, "pred", ""),
    (10, "base", ""),
    (10, "pred", ""),
    (5, "base", ""),
    (5, "pred", ""),
    (18, "pred_fast", ""),
    (10, "pred_fast", ""),
    (5, "pred_fast", ""),
    # int8 isolation (mirrors the study64 isolation cells on this family)
    (18, "pred", "conv"),
    (10, "pred", "conv"),
    (18, "base", "conv"),
    # deep few-step crossover (the first 9 cells put the 300-kimg model's
    # NLC crossover at ~10 steps with a tie at 5 — push to 3)
    (3, "base", ""),
    (3, "pred", ""),
    (3, "pred_fast", ""),
    # the SHIPPED 'auto' routing on this family: full-'conv' measured
    # +2.7-3.4% on this sharp model (outside the clause), so the default's
    # claim rests on auto's strict-subset routing being materially lighter
    (18, "pred", "auto"),
    (10, "pred", "auto"),
    (18, "base", "auto"),
]


def _over_budget(what: str) -> bool:
    if time.monotonic() - _T0 > BUDGET_S:
        print(f"budget exhausted before {what} ({BUDGET_S:.0f}s) — "
              "exiting cleanly for the next queue attempt", flush=True)
        return True
    return False


def write_config() -> str:
    """Reduced cifar10_adm class config (the reference's 32² ADM family:
    learned variance, cosine betas, scale-shift norm, resblock up/down)."""
    import yaml
    cdir = os.path.join(STORE, "config")
    os.makedirs(cdir, exist_ok=True)
    path = os.path.join(cdir, CFG_NAME + ".yml")
    cfg = {
        "model": {"type": "openai", "image_size": RESOLUTION,
                  "num_channels": MODEL_CHANNELS, "num_res_blocks": 2,
                  "channel_mult": CHANNEL_MULT, "learn_sigma": True,
                  "class_cond": False, "attention_resolutions": "16,8",
                  "num_heads": 4, "num_head_channels": 64,
                  "num_heads_upsample": -1, "use_scale_shift_norm": True,
                  "dropout": 0.05, "resblock_updown": True,
                  "use_new_attention_order": True, "feat_layer": 1},
        "data": {"dataset": "CIFAR10", "image_size": RESOLUTION,
                 "channels": 3},
        "diffusion": {"num_diffusion_timesteps": 1000,
                      "beta_schedule": "cosine"},
    }
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return path


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
    stats = {"mean": float(norms.mean()),
             "p995": float(np.quantile(norms, .995)),
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
    snap = _latest(os.path.join(RUN, "network-snapshot-*"))
    if snap and int(re.search(r"(\d+)$", snap).group(1)) >= TRAIN_KIMG:
        return True
    cfgp = write_config()
    from nlc_tpu.cli.ddpm_train import get_args, main
    remaining = max(600.0, BUDGET_S - (time.monotonic() - _T0))
    argv = ["--config", cfgp, "--data", DATA, "--run_dir", RUN,
            "--duration_kimg", str(TRAIN_KIMG), "--batch", str(TRAIN_BATCH),
            "--lr", "1e-4", "--ema_halflife_kimg", "25",
            "--kimg_per_tick", "50", "--snapshot_ticks", "1",
            "--state_dump_ticks", "1", "--max_wall_s", str(remaining)]
    state = _latest(os.path.join(RUN, "training-state-*"))
    if state:
        argv += ["--resume_state", state]
    main(get_args(argv))
    snap = _latest(os.path.join(RUN, "network-snapshot-*"))
    return bool(snap and int(re.search(r"(\d+)$", snap).group(1)) >= TRAIN_KIMG)


def _head_epochs_done():
    p = os.path.join(STUDY, "head_progress.json")
    if not os.path.exists(p):
        return 0
    try:
        with open(p) as f:
            return json.load(f)["epochs_done"]
    except (ValueError, KeyError):
        return 0


def stage_head():
    done = _head_epochs_done()
    if done >= HEAD_EPOCHS_TOTAL:
        return True
    snap = _latest(os.path.join(RUN, "network-snapshot-*"))
    assert snap, "train stage incomplete"
    write_config()
    from nlc_tpu.cli.run_image_experiment import get_args, main
    last = HEAD_CHUNK_EPOCHS - 1
    argv = ["--config", "cifar10", "--config_path", CFG_NAME,
            "--store_dir", STORE, "--load_eps", snap, "--data_dir", DATA,
            "--fid_target", FID_NPZ, "--result_dir", SIGMA_DIR,
            "--sigma_block", "2", "--feat_layer", "1",
            "--epoch", str(HEAD_CHUNK_EPOCHS),
            "--iter_per_epoch", str(HEAD_ITERS), "--save_per_epoch", "0",
            "--eval_per_epoch", "0", "--batch_size", str(HEAD_BATCH),
            "--ema_rate", "0.9995", "--lr", "3e-4"]
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
    tag = f"_q{quant}" if quant else ""
    return os.path.join(SWEEP, f"s{steps}_{style}{tag}")


def stage_sweep():
    snap = _latest(os.path.join(RUN, "network-snapshot-*"))
    assert snap, "train stage incomplete"
    assert _head_epochs_done() >= HEAD_EPOCHS_TOTAL, "head stage incomplete"
    head = os.path.join(SIGMA_DIR, "cifar10", "0",
                        f"ema_sigma_ckpt_{HEAD_CHUNK_EPOCHS - 1}")
    with open(os.path.join(STUDY, "norm.json")) as f:
        norm_max = json.load(f)["p995"]
    write_config()
    from nlc_tpu.cli.image_sample import get_args, main
    all_done = True
    grid = SWEEP_GRID
    cell_filter = [t for t in
                   os.environ.get("NLC_STUDY_ADM_CELLS", "").split(",") if t]
    if cell_filter:
        by_tag = {os.path.basename(_cell_dir(s, st, q)): (s, st, q)
                  for s, st, q in SWEEP_GRID}
        unknown = [t for t in cell_filter if t not in by_tag]
        if unknown:
            raise SystemExit(
                f"NLC_STUDY_ADM_CELLS has unknown tags {unknown}; "
                f"valid tags: {sorted(by_tag)}")
        grid = [by_tag[t] for t in cell_filter]
    for steps, style, quant in grid:
        out = _cell_dir(steps, style, quant)
        rp = os.path.join(out, "0", "results.json")
        if os.path.exists(rp):
            continue
        if _over_budget(f"sweep cell s{steps}_{style}_{quant}") or \
                os.path.exists(os.path.join(STUDY, "DEFER")):
            return False
        argv = ["--config", "cifar10", "--config_path", CFG_NAME,
                "--store_dir", STORE, "--load_eps", snap,
                "--load_sigma", head, "--fid_target", FID_NPZ,
                "--sigma_type", style, "--num_timesteps", str(steps),
                "--sample_size", str(SAMPLE_SIZE),
                "--batch_size", str(SWEEP_BATCH),
                "--save_folder", out, "--save_flag", "0"] + COMMON_FLAGS
        if quant:
            argv += ["--quant", quant]
        a, c = get_args(argv)
        a.norm_max = norm_max
        a.norm_min = 0.0
        r = main(a, c)
        print("cell", steps, style, quant, "->",
              {k: v for k, v in (r or {}).items() if k != "full_log"})
        if os.path.exists(rp):
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


STAGES = [("data", stage_data), ("stats", stage_stats),
          ("train", stage_train), ("head", stage_head),
          ("sweep", stage_sweep)]


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
