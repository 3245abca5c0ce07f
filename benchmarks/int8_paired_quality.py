"""Embedding-independent int8-vs-bf16 quality evidence (VERDICT r3 #3).

The 32^2 study's int8 FID cells used the fallback embedding (no pretrained
Inception weights in this sandbox), so this script adds metrics that do not
depend on any embedding at all: paired PSNR/SSIM between the same-seed
bf16 and int8-conv sweep cells (identical trajectories up to quantization
noise). High paired PSNR means the int8 path reproduces the bf16 images
themselves, a stronger statement than matching their distribution.

Writes benchmarks/measurements/r4/int8_paired_quality.json.
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SWEEP = os.path.join(os.environ.get("NLC_STUDY_DIR",
                                    os.path.join(REPO, "study32")), "sweep")
OUT = os.path.join(REPO, "benchmarks", "measurements", "r4",
                   "int8_paired_quality.json")

PAIRS = {
    "18step": ("s18_pred_partial-pred", "s18_pred_partial-pred_int8conv"),
    "5step": ("s5_pred_partial-pred", "s5_pred_partial-pred_int8conv"),
}


def cell_images(cell):
    d = os.path.join(SWEEP, cell, "0", "images")
    return d, sorted(os.listdir(d))


def main():
    from PIL import Image
    from nlc_tpu.eval.psnr_ssim import calculate_psnr, calculate_ssim

    n = int(os.environ.get("NLC_PAIRED_N", "2048"))
    out = {}
    for tag, (cell_bf16, cell_int8) in PAIRS.items():
        da, fa = cell_images(cell_bf16)
        db, fb = cell_images(cell_int8)
        common = sorted(set(fa) & set(fb))[:n]
        assert len(common) >= min(n, 256), (tag, len(common))
        psnrs, ssims = [], []
        for f in common:
            a = np.asarray(Image.open(os.path.join(da, f)), np.float64)
            b = np.asarray(Image.open(os.path.join(db, f)), np.float64)
            psnrs.append(calculate_psnr(a, b))
            ssims.append(calculate_ssim(a, b))
        psnrs, ssims = np.asarray(psnrs), np.asarray(ssims)
        out[tag] = {
            "n_pairs": len(common),
            "psnr_mean": round(float(np.mean(psnrs[np.isfinite(psnrs)])), 3),
            "psnr_p1": round(float(np.percentile(psnrs[np.isfinite(psnrs)], 1)), 3),
            "frac_identical": round(float(np.mean(~np.isfinite(psnrs))), 4),
            "ssim_mean": round(float(ssims.mean()), 5),
            "ssim_p1": round(float(np.percentile(ssims, 1)), 5),
        }
        print(tag, out[tag], flush=True)
    out["note"] = ("paired PSNR/SSIM between same-seed bf16 and int8-conv "
                   "sweep cells of the 32^2 study (trained models); "
                   "embedding-independent complement to the fallback-FID "
                   "deltas in int8_drift.json. frac_identical = share of "
                   "bitwise-equal image pairs (PSNR=inf).")
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
