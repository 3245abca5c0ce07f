"""Single-image restoration demo CLI (reference basicsr/demo.py:18-60 parity):
read one image, pad to the network's stride, run the model (optionally via
tiled 'grids' inference), write the restored PNG.

Reference reads img_path.input_img/output_img from the options YAML; we accept
the same keys plus --input/--output flag overrides.

Usage: python -m nlc_tpu.cli.basicsr_demo -opt options.yml \
           --ckpt <dir> --input in.png --output out.png
"""
from __future__ import annotations

import argparse
import os

import numpy as np
import yaml
from PIL import Image

import jax.numpy as jnp

from ..restoration.model import RestorationModel
from ..utils import logger
from ..utils.image_io import save_image


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("-opt", type=str, required=True)
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--input", type=str, default=None)
    p.add_argument("--output", type=str, default=None)
    p.add_argument("--grids", type=int, default=0)
    p.add_argument("--crop_size", type=int, default=256)
    args = p.parse_args(argv)
    with open(args.opt) as f:
        opt = yaml.safe_load(f)
    logger.configure(dir="./logs/")

    img_path = args.input or opt.get("img_path", {}).get("input_img")
    out_path = args.output or opt.get("img_path", {}).get("output_img")
    if not img_path or not out_path:
        raise SystemExit("need --input/--output or img_path.{input_img,"
                         "output_img} in the options file")
    if not os.path.exists(img_path):
        raise SystemExit(f"input image not found: {img_path}")

    lq = np.asarray(Image.open(img_path).convert("RGB"), np.float32) / 255.0

    model = RestorationModel(opt)
    state = model.init_state(jnp.zeros((1,) + lq.shape))
    if args.ckpt and os.path.exists(args.ckpt):
        state = model.resume(args.ckpt)
        logger.log("loaded", args.ckpt)

    x = jnp.asarray(lq)[None]
    if args.grids or opt.get("val", {}).get("grids", False):
        pred = model.test_grids(state.params, x,
                                crop_size=min(args.crop_size, *lq.shape[:2]))
    else:
        pred = model.test(state.params, x)
    pred = np.clip(np.asarray(pred)[0], 0.0, 1.0)
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    save_image(pred, out_path)
    logger.log(f"inference {img_path} finished. saved to {out_path}")
    return out_path


if __name__ == "__main__":
    main()
