"""From-scratch EDM diffusion training CLI.

The reference vendors NVIDIA's EDM training stack (training/training_loop.py,
loss.py, augment.py, dataset.py) without an entry point; this CLI exposes the
capability end-to-end: SongUNet/DhariwalUNet + VP/VE/EDM loss + augmentation
+ tick-based loop with snapshots and resume.

Usage: python -m nlc_tpu.cli.edm_train --data <dir-or-zip> --arch ddpmpp ...
"""
from __future__ import annotations

import argparse
import os

import numpy as np

import jax
import jax.numpy as jnp

from ..data.edm_dataset import EDMImageDataset, SyntheticEDMDataset, infinite_batches
from ..io.checkpoints import load_pytree
from ..models.song_unet import (SongUNet, SongUNetConfig, DhariwalUNet,
                                DhariwalUNetConfig, EDMPrecond, VPPrecond, VEPrecond)
from ..train.augment import AugmentConfig
from ..train.edm_training import (LOSSES, EDMLoopConfig, create_edm_train_state,
                                  make_edm_train_step, edm_training_loop)
from ..utils import logger


def get_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data", type=str, default=None, help="dir or .zip")
    p.add_argument("--run_dir", type=str, default="edm-runs/00000")
    p.add_argument("--arch", type=str, default="ddpmpp",
                   choices=["ddpmpp", "ncsnpp", "adm"])
    p.add_argument("--precond", type=str, default="edm",
                   choices=["vp", "ve", "edm"])
    p.add_argument("--resolution", type=int, default=32)
    p.add_argument("--model_channels", type=int, default=128)
    p.add_argument("--channel_mult", type=str, default="2,2,2")
    p.add_argument("--num_blocks", type=int, default=4)
    p.add_argument("--dropout", type=float, default=0.13)
    p.add_argument("--cond", type=int, default=0)
    p.add_argument("--augment", type=float, default=0.12,
                   help="augment probability, 0 disables")
    p.add_argument("--duration_kimg", type=int, default=200000)
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--batch_gpu", type=int, default=None,
                   help="microbatch for gradient accumulation")
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--ema_halflife_kimg", type=float, default=500)
    p.add_argument("--kimg_per_tick", type=int, default=50)
    p.add_argument("--snapshot_ticks", type=int, default=50)
    p.add_argument("--state_dump_ticks", type=int, default=500,
                   help="dump resumable training-state every N ticks")
    p.add_argument("--max_wall_s", type=float, default=None,
                   help="dump state and exit cleanly at the first tick "
                        "boundary past this wall budget (resume-friendly "
                        "alternative to an outer `timeout` SIGTERM)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--xflip", type=int, default=1)
    p.add_argument("--resume_state", type=str, default=None)
    p.add_argument("--bf16", type=int, default=1)
    return p.parse_args(argv)


def main(args):
    logger.configure(dir="./logs/")
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    cm = tuple(int(x) for x in args.channel_mult.split(","))

    if args.data and os.path.exists(args.data):
        ds = EDMImageDataset(args.data, resolution=args.resolution,
                             use_labels=bool(args.cond), xflip=bool(args.xflip))
    else:
        logger.log("WARNING: no data path — synthetic dataset (smoke mode)")
        ds = SyntheticEDMDataset(args.resolution,
                                 label_dim=10 if args.cond else 0)
    label_dim = ds.label_dim if args.cond else 0

    aug_cfg = None
    if args.augment > 0:
        aug_cfg = AugmentConfig(p=args.augment, xflip=1e8, yflip=1, scale=1,
                                rotate_frac=1, aniso=1, translate_frac=1)
    augment_dim = aug_cfg.label_dim if aug_cfg else 0

    if args.arch == "adm":
        cfg = DhariwalUNetConfig(img_resolution=args.resolution,
                                 model_channels=args.model_channels,
                                 channel_mult=cm, num_blocks=args.num_blocks,
                                 dropout=args.dropout, label_dim=label_dim,
                                 augment_dim=augment_dim)
        model = DhariwalUNet(cfg, dtype=dtype)
    else:
        cfg = SongUNetConfig(
            img_resolution=args.resolution, model_channels=args.model_channels,
            channel_mult=cm, num_blocks=args.num_blocks, dropout=args.dropout,
            label_dim=label_dim, augment_dim=augment_dim,
            embedding_type="positional" if args.arch == "ddpmpp" else "fourier",
            channel_mult_noise=1 if args.arch == "ddpmpp" else 2,
            encoder_type="standard" if args.arch == "ddpmpp" else "residual",
            resample_filter=(1, 1) if args.arch == "ddpmpp" else (1, 3, 3, 1))
        model = SongUNet(cfg, dtype=dtype)

    precond = {"vp": VPPrecond(), "ve": VEPrecond(), "edm": EDMPrecond()}[args.precond]
    loss_cfg = LOSSES[args.precond]()

    res = args.resolution
    x0 = jnp.zeros((1, res, res, 3))
    nl0 = jnp.ones((1,))
    init_kwargs = {}
    if label_dim:
        init_kwargs["class_labels"] = jnp.zeros((1, label_dim))
    if augment_dim:
        init_kwargs["augment_labels"] = jnp.zeros((1, augment_dim))
    params = model.init(jax.random.PRNGKey(args.seed), x0, nl0, **init_kwargs)

    micro = args.batch_gpu or args.batch
    assert args.batch % micro == 0, \
        f"--batch {args.batch} must divide by --batch_gpu {micro} " \
        "(cur_nimg/EMA/lr-ramp account batch_size images per step; the " \
        "reference training loop asserts the same)"
    rounds = max(args.batch // micro, 1)
    loop_cfg = EDMLoopConfig(
        total_kimg=args.duration_kimg, batch_size=args.batch,
        num_accumulation_rounds=rounds, lr=args.lr,
        ema_halflife_kimg=args.ema_halflife_kimg,
        kimg_per_tick=args.kimg_per_tick, snapshot_ticks=args.snapshot_ticks,
        state_dump_ticks=args.state_dump_ticks, max_wall_s=args.max_wall_s,
        run_dir=args.run_dir, seed=args.seed)

    state, tx = create_edm_train_state(params, loop_cfg)
    if args.resume_state and os.path.exists(args.resume_state):
        # restore INTO the live state template: without `target`, orbax
        # returns the optax state as raw nested dicts/lists (NamedTuple
        # structure lost) and the first tx.update crashes on `state.mu`
        import numpy as np
        try:
            data = load_pytree(args.resume_state,
                               target={"params": state.params,
                                       "opt_state": state.opt_state,
                                       "ema_params": state.ema_params,
                                       "cur_nimg": np.asarray(0)})
            ema = data["ema_params"]
        except Exception:
            # pre-round-4 dumps lack ema_params; restarting the EMA from the
            # restored params is the closest available state (restarting it
            # from the fresh random init — the old behavior — contaminates
            # every snapshot for ~the EMA halflife after resume)
            data = load_pytree(args.resume_state,
                               target={"params": state.params,
                                       "opt_state": state.opt_state,
                                       "cur_nimg": np.asarray(0)})
            ema = jax.tree_util.tree_map(jnp.copy, data["params"])
            logger.log("resume-state has no ema_params (old dump) — "
                       "EMA restarted from the restored params")
        state = state.replace(params=data["params"], opt_state=data["opt_state"],
                              ema_params=ema,
                              cur_nimg=jnp.asarray(int(data["cur_nimg"])))
        logger.log("resumed from", args.resume_state)

    def precond_apply(p, x, sigma, labels, aug_labels, dropout_key):
        kw = {}
        if label_dim:
            kw["class_labels"] = labels
        if augment_dim:
            kw["augment_labels"] = aug_labels
        rngs = {"dropout": dropout_key} if dropout_key is not None else None
        return precond(
            lambda z, t, **k: model.apply(p, z, t, deterministic=False,
                                          rngs=rngs, **k),
            x, sigma, **kw)

    train_step = make_edm_train_step(loss_cfg, precond_apply, tx, loop_cfg,
                                     augment_cfg=aug_cfg)
    data_iter = infinite_batches(ds, micro, rounds, seed=args.seed)
    data_iter = ((jnp.asarray(x), jnp.asarray(l)) for x, l in data_iter)
    edm_training_loop(state, train_step, data_iter, loop_cfg,
                      key=jax.random.PRNGKey(args.seed))
    logger.log("training done")


if __name__ == "__main__":
    main(get_args())
