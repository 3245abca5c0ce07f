"""Restoration-CNN inference/eval CLI (reference basicsr/test.py parity):
options-driven validation over paired data with PSNR/SSIM, optional TLC and
tiled ('grids') inference, saving restored outputs.

Usage: python -m nlc_tpu.cli.basicsr_test -opt options.yml --ckpt <dir>
"""
from __future__ import annotations

import argparse
import os

import numpy as np
import yaml

import jax.numpy as jnp

from ..restoration.data import PairedImageDataset, SyntheticPairedDataset, paired_loader
from ..restoration.model import RestorationModel
from ..utils import logger
from ..utils.image_io import save_image


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("-opt", type=str, required=True)
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--save_dir", type=str, default=None)
    p.add_argument("--grids", type=int, default=0)
    p.add_argument("--crop_size", type=int, default=256)
    args = p.parse_args(argv)
    with open(args.opt) as f:
        opt = yaml.safe_load(f)
    logger.configure(dir="./logs/")

    model = RestorationModel(opt)
    dval = opt.get("datasets", {}).get("val") or opt.get("datasets", {}).get("test")
    if dval and os.path.isdir(dval.get("dataroot_gt", "")):
        ds = PairedImageDataset(dval["dataroot_gt"], dval["dataroot_lq"],
                                phase="val")
    else:
        ds = SyntheticPairedDataset()

    lq0, _ = ds[0]
    state = model.init_state(jnp.zeros((1,) + lq0.shape))
    if args.ckpt and os.path.exists(args.ckpt):
        state = model.resume(args.ckpt)
        logger.log("loaded", args.ckpt)

    metrics = model.validate(state.params, paired_loader(ds, 1, shuffle=False),
                             use_grids=bool(args.grids),
                             crop_size=args.crop_size)
    logger.log("metrics:", metrics)
    if args.save_dir:
        os.makedirs(args.save_dir, exist_ok=True)
        for i in range(min(len(ds), 16)):
            lq, _ = ds[i]
            pred = np.clip(np.asarray(
                model.test(state.params, jnp.asarray(lq)[None]))[0], 0, 1)
            save_image(pred, os.path.join(args.save_dir, f"{i:04}.png"))
    return metrics


if __name__ == "__main__":
    main()
