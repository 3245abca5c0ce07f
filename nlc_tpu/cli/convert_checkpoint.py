"""Offline checkpoint converter: torch reference checkpoints -> orbax pytrees.

The sampling CLIs convert torch checkpoints on the fly at every launch; this
tool does it once so production serving loads orbax directly. It delegates to
the exact same model-construction + conversion code paths the CLIs use, so a
converted checkpoint is bit-identical to what the CLI would have built.
Covers the three reference formats (SURVEY.md §5 checkpoint/resume): plain
state_dicts, DataParallel lists + EMA states, and EDM persistence pickles.

Usage:
  # DDIM/ADM ('simple'/'openai' model configs) + optional sigma head
  python -m nlc_tpu.cli.convert_checkpoint --family nlc --config celeba \
      --config_path celeba_hq --load_eps model.ckpt --load_sigma sigma.pt --dst out/
  # EDM pickles
  python -m nlc_tpu.cli.convert_checkpoint --family edm --config cifar10 \
      --load_eps network-snapshot.pkl --dst out/

Reverse direction (our orbax pytrees -> reference torch .pt state_dicts, for
users migrating back gradually; io/reverse_convert.py):
  python -m nlc_tpu.cli.convert_checkpoint --reverse --arch adm \
      --src out/eps --dst model.pt
  python -m nlc_tpu.cli.convert_checkpoint --reverse --arch adm_sigma \
      --src runs/sigma_ckpt_10 --dst sigma.pt
"""
from __future__ import annotations

import argparse
import os

import numpy as np

REVERSE_ARCHS = ["ddim", "adm", "song", "dhariwal",
                 "ddim_sigma", "adm_sigma", "edm_sigma"]


def reverse_main(args):
    from ..io import reverse_convert as rc
    from ..io.checkpoints import load_pytree

    tree = load_pytree(args.src)
    if isinstance(tree, dict) and "ema" in tree:
        tree = tree["ema"]   # EDM trainer network-snapshot-*.orbax layout
    params = tree.get("params", tree) if isinstance(tree, dict) else tree
    batch_stats = tree.get("batch_stats") if isinstance(tree, dict) else None
    if args.arch.endswith("_sigma"):
        dim, channels, n_blocks = rc.infer_sigma_head_dims(params)
        fn = {"ddim_sigma": rc.ddim_sigma_head_to_torch,
              "adm_sigma": rc.adm_sigma_head_to_torch,
              "edm_sigma": rc.edm_sigma_head_to_torch}[args.arch]
        sd = fn(params, batch_stats, dim, channels, n_blocks)
    else:
        fn = {"ddim": rc.ddim_unet_to_torch, "adm": rc.adm_unet_to_torch,
              "song": rc.song_unet_to_torch,
              "dhariwal": rc.dhariwal_unet_to_torch}[args.arch]
        sd = fn(params)
    rc.save_torch_state_dict(sd, args.dst)
    print(f"wrote {args.dst} ({len(sd)} tensors, "
          f"{sum(v.size for v in sd.values())/1e6:.2f}M params)")
    return [args.dst]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--family", choices=["nlc", "edm"])
    p.add_argument("--reverse", action="store_true",
                   help="orbax pytree -> torch state_dict (.pt)")
    p.add_argument("--arch", choices=REVERSE_ARCHS,
                   help="model family of --src (reverse mode)")
    p.add_argument("--src", help="orbax checkpoint dir (reverse mode)")
    p.add_argument("--dst", required=True)
    p.add_argument("--config", default="cifar10")
    p.add_argument("--config_path", default=None)
    p.add_argument("--store_dir", default="store")
    p.add_argument("--load_eps", default=None)
    p.add_argument("--load_sigma", default=None)
    p.add_argument("--sigma_block", type=int, default=2)
    args = p.parse_args(argv)
    if args.reverse:
        if not (args.arch and args.src):
            raise SystemExit("--reverse needs --arch and --src")
        return reverse_main(args)
    if args.family is None:
        raise SystemExit("--family is required (forward mode)")
    if args.load_eps is None and args.load_sigma is None:
        raise SystemExit("nothing to convert: pass --load_eps and/or "
                         "--load_sigma")
    for path in [args.load_eps, args.load_sigma]:
        if path and not os.path.exists(path):
            raise SystemExit(f"source checkpoint not found: {path}")

    import jax
    from ..io.checkpoints import save_pytree

    passthrough = ["--config", args.config,
                   "--config_path", args.config_path or args.config,
                   "--store_dir", args.store_dir, "--bf16", "0",
                   "--sigma_block" if args.family == "edm" else "--max_T",
                   str(args.sigma_block) if args.family == "edm" else "10"]
    if args.load_eps:
        passthrough += ["--load_eps", args.load_eps]
    if args.load_sigma:
        passthrough += ["--load_sigma", args.load_sigma]

    if args.family == "nlc":
        from .image_sample import get_args, build_models_and_params
        cli_args, config = get_args(passthrough)
        cli_args.sigma_block = args.sigma_block
        _, params, svars, _ = build_models_and_params(cli_args, config)
    else:
        from .edm_image_sample import get_args, build
        cli_args, config = get_args(passthrough)
        out = build(cli_args, config)
        params, svars = out[1], out[2]

    os.makedirs(args.dst, exist_ok=True)
    written = []
    if args.load_eps:
        path = os.path.join(args.dst, "eps")
        save_pytree(params, path)
        n = sum(int(np.prod(np.shape(x)))
                for x in jax.tree_util.tree_leaves(params))
        written.append((path, n))
    if args.load_sigma:
        path = os.path.join(args.dst, "sigma")
        save_pytree(svars, path)
        n = sum(int(np.prod(np.shape(x)))
                for x in jax.tree_util.tree_leaves(svars))
        written.append((path, n))
    for path, n in written:
        print(f"wrote {path} ({n/1e6:.2f}M params)")
    return [p for p, _ in written]


if __name__ == "__main__":
    main()
