"""Offline result evaluator.

Parity with reference result_evaluater.py (:1-148): walks
<results_root>/<data>/<constraint>/<run_id>/[save_flag/]images directories,
computes FID (against a stats npz), PSNR and SSIM (restored images matched to
transform/orig_* ground truth), writes per-run img_results.json and an
aggregate CSV; failures are logged and skipped (swallow-and-continue,
reference :109-123).

Usage: python -m nlc_tpu.cli.result_evaluater --results_root results_final ...
"""
from __future__ import annotations

import argparse
import csv
import json
import os
import traceback

import numpy as np

from ..eval import calculate_psnr, calculate_ssim, FIDComputer
from ..utils.image_io import load_image
from ..utils import logger


def find_runs(root: str):
    """Yield (data, constraint, run_id, images_dir, transform_dir)."""
    for data in sorted(os.listdir(root)):
        dpath = os.path.join(root, data)
        if not os.path.isdir(dpath):
            continue
        for constraint in sorted(os.listdir(dpath)):
            cpath = os.path.join(dpath, constraint)
            if not os.path.isdir(cpath):
                continue
            for run_id in sorted(os.listdir(cpath)):
                rpath = os.path.join(cpath, run_id)
                for sub in ([""] + sorted(os.listdir(rpath))
                            if os.path.isdir(rpath) else []):
                    base = os.path.join(rpath, sub) if sub else rpath
                    images = os.path.join(base, "images")
                    if os.path.isdir(images):
                        transform = os.path.join(base, "transform")
                        yield (data, constraint, run_id, images,
                               transform if os.path.isdir(transform) else None)
                        break


def evaluate_run(images_dir: str, transform_dir, fid: FIDComputer | None):
    out = {}
    files = sorted(f for f in os.listdir(images_dir) if f.endswith(".png"))
    if transform_dir:
        psnrs, ssims = [], []
        for f in files:
            orig = os.path.join(transform_dir, "orig_" + f)
            if not os.path.exists(orig):
                continue
            a = load_image(os.path.join(images_dir, f))
            b = load_image(orig)
            psnrs.append(calculate_psnr(a, b, crop_border=0))
            ssims.append(calculate_ssim((a * 255).round().astype(np.uint8),
                                        (b * 255).round().astype(np.uint8),
                                        crop_border=0))
        if psnrs:
            out["psnr"] = float(np.mean(psnrs))
            out["ssim"] = float(np.mean(ssims))
            out["n_matched"] = len(psnrs)
    if fid is not None:
        out["fid"] = fid.fid_of_dir(images_dir)
        out["fid_backend"] = fid.backend
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--results_root", type=str, default="results_final")
    p.add_argument("--fid_target", type=str, default=None)
    p.add_argument("--inception_ckpt", type=str, default=None)
    p.add_argument("--out_csv", type=str, default=None)
    args = p.parse_args(argv)
    logger.configure(dir="./logs/")

    fid = None
    if args.fid_target and os.path.exists(args.fid_target):
        extractor = None
        if args.inception_ckpt and os.path.exists(args.inception_ckpt):
            from ..eval.inception import make_inception_extractor
            extractor = make_inception_extractor(args.inception_ckpt)
        fid = FIDComputer(target=args.fid_target, extractor=extractor)

    rows = []
    for data, constraint, run_id, images, transform in find_runs(args.results_root):
        try:
            res = evaluate_run(images, transform, fid)
            res_path = os.path.join(os.path.dirname(images), "img_results.json")
            with open(res_path, "w") as f:
                json.dump(res, f)
            rows.append({"data": data, "constraint": constraint, "run": run_id,
                         **res})
            logger.log(data, constraint, run_id, res)
        except Exception:
            logger.log(f"FAILED on {images}:\n{traceback.format_exc()}")
            continue

    out_csv = args.out_csv or os.path.join(args.results_root, "summary.csv")
    if rows:
        keys = sorted({k for r in rows for k in r})
        with open(out_csv, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=keys)
            w.writeheader()
            w.writerows(rows)
        logger.log("wrote", out_csv)
    return rows


if __name__ == "__main__":
    main()
