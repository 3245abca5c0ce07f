"""Create FID target statistics from an image directory.

Counterpart of pytorch_fid's compute_statistics_of_path usage in the
reference (src/experiments.py:210-226 consumes precomputed mu/sigma npz
files). With --inception_ckpt the real InceptionV3-FID features are used;
otherwise the self-contained fallback embedding (relative FID only).

Usage: python -m nlc_tpu.cli.make_fid_stats --images_dir samples/ \
           --out store/fid/myset.npz [--inception_ckpt pt_inception.pth]
"""
from __future__ import annotations

import argparse
import os


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--images_dir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--inception_ckpt", default=None)
    args = p.parse_args(argv)
    if not os.path.isdir(args.images_dir):
        raise SystemExit(f"images_dir not found: {args.images_dir}")

    from ..eval.fid import FIDComputer
    extractor = None
    if args.inception_ckpt:
        if not os.path.exists(args.inception_ckpt):
            raise SystemExit(f"inception ckpt not found: {args.inception_ckpt}")
        from ..eval.inception import make_inception_extractor
        extractor = make_inception_extractor(args.inception_ckpt)
    fid = FIDComputer(target=None, extractor=extractor)
    stats = fid.stats_of_dir(args.images_dir)
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    stats.save(args.out)
    print(f"wrote {args.out} (dim={stats.mu.shape[0]}, "
          f"inception={extractor is not None})")
    return args.out


if __name__ == "__main__":
    main()
