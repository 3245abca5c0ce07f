"""Stereo SR demo CLI (reference basicsr/demo_ssr.py:29-115 parity): read a
left/right image pair, stack them channel-wise (6 channels — the NAFSSR input
convention), run the model, split and write both SR views.

Usage: python -m nlc_tpu.cli.basicsr_demo_ssr -opt options.yml --ckpt <dir> \
           --input_l l.png --input_r r.png --output_l sl.png --output_r sr.png
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


def _read(path):
    if not os.path.exists(path):
        raise SystemExit(f"input image not found: {path}")
    return np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("-opt", type=str, required=True)
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--input_l", type=str, default=None)
    p.add_argument("--input_r", type=str, default=None)
    p.add_argument("--output_l", type=str, default=None)
    p.add_argument("--output_r", type=str, default=None)
    args = p.parse_args(argv)
    with open(args.opt) as f:
        opt = yaml.safe_load(f)
    logger.configure(dir="./logs/")

    paths = opt.get("img_path", {})
    in_l = args.input_l or paths.get("input_l")
    in_r = args.input_r or paths.get("input_r")
    out_l = args.output_l or paths.get("output_l")
    out_r = args.output_r or paths.get("output_r")
    if not all([in_l, in_r, out_l, out_r]):
        raise SystemExit("need --input_l/--input_r/--output_l/--output_r or "
                         "img_path.{input_l,input_r,output_l,output_r}")

    lq = np.concatenate([_read(in_l), _read(in_r)], axis=-1)  # (H, W, 6)

    model = RestorationModel(opt)
    state = model.init_state(jnp.zeros((1,) + lq.shape))
    if args.ckpt and os.path.exists(args.ckpt):
        state = model.resume(args.ckpt)
        logger.log("loaded", args.ckpt)

    pred = np.clip(np.asarray(model.test(state.params, jnp.asarray(lq)[None]))[0],
                   0.0, 1.0)
    for out_path, img in [(out_l, pred[..., :3]), (out_r, pred[..., 3:])]:
        os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
        save_image(img, out_path)
    logger.log(f"inference {in_l} / {in_r} finished. "
               f"saved to {out_l} / {out_r}")
    return out_l, out_r


if __name__ == "__main__":
    main()
