"""From-scratch DDPM/iDDPM training CLI for the ADM-family UNets.

The reference ecosystem loads OpenAI-pretrained ADM checkpoints
(reference image_sample.py:145); it ships no trainer for them. This CLI
closes the loop for self-hosted studies: the iDDPM hybrid objective
(train/ddpm_training.py) on models/adm_unet.ADMUNet built from the same
config schema the sampling CLIs use (configs/config.py "openai" models),
with the EDM stack's tick/snapshot/resume loop.

Usage:
  python -m nlc_tpu.cli.ddpm_train --config cifar10_adm --data <dir> \
      --run_dir runs/adm32 --duration_kimg 300 --batch 128
Snapshots are orbax dirs (network-snapshot-XXXXXX, {"ema": variables})
loadable by image_sample/run_image_experiment via --load_eps.
"""
from __future__ import annotations

import argparse
import os

import numpy as np

import jax
import jax.numpy as jnp

from ..configs.config import get_config
from ..data.edm_dataset import EDMImageDataset, SyntheticEDMDataset, infinite_batches
from ..io.checkpoints import load_pytree
from ..models.factory import create_sigma_eps_model
from ..train.ddpm_training import make_ddpm_tables, make_ddpm_hybrid_loss
from ..train.edm_training import (EDMLoopConfig, create_edm_train_state,
                                  make_train_step_from_loss, edm_training_loop)
from ..utils import logger


def get_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=str, default="cifar10_adm",
                   help="builtin config name or YAML path ('openai' model)")
    p.add_argument("--data", type=str, default=None, help="dir or .zip")
    p.add_argument("--run_dir", type=str, default="ddpm-runs/00000")
    p.add_argument("--duration_kimg", type=int, default=300)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--batch_gpu", type=int, default=None)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--lr_rampup_kimg", type=int, default=0)
    p.add_argument("--ema_halflife_kimg", type=float, default=50)
    p.add_argument("--vlb_weight", type=float, default=1e-3)
    p.add_argument("--kimg_per_tick", type=int, default=50)
    p.add_argument("--snapshot_ticks", type=int, default=1)
    p.add_argument("--state_dump_ticks", type=int, default=1)
    p.add_argument("--max_wall_s", type=float, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--xflip", type=int, default=1)
    p.add_argument("--resume_state", type=str, default=None)
    p.add_argument("--bf16", type=int, default=1)
    return p.parse_args(argv)


def main(args):
    logger.configure(dir="./logs/")
    config = get_config(args.config)
    mcfg = config.model
    assert mcfg.type == "openai", "ddpm_train trains the ADM family"
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    res = config.data.image_size

    model, _head, ucfg = create_sigma_eps_model(
        image_size=mcfg.image_size, num_channels=mcfg.num_channels,
        num_res_blocks=mcfg.num_res_blocks,
        channel_mult=mcfg.get("channel_mult", ""),
        learn_sigma=mcfg.get("learn_sigma", True),
        attention_resolutions=mcfg.get("attention_resolutions", "16"),
        num_heads=mcfg.get("num_heads", 1),
        num_head_channels=mcfg.get("num_head_channels", -1),
        use_scale_shift_norm=mcfg.get("use_scale_shift_norm", False),
        dropout=mcfg.get("dropout", 0.0),
        resblock_updown=mcfg.get("resblock_updown", False),
        use_new_attention_order=mcfg.get("use_new_attention_order", False),
        feat_layer=mcfg.get("feat_layer", 1), dtype=dtype)
    learn_var = bool(mcfg.get("learn_sigma", True))

    tables = make_ddpm_tables(
        config.diffusion.num_diffusion_timesteps,
        schedule=config.diffusion.beta_schedule,
        beta_start=config.diffusion.get("beta_start", 1e-4),
        beta_end=config.diffusion.get("beta_end", 0.02))

    if args.data and os.path.exists(args.data):
        ds = EDMImageDataset(args.data, resolution=res,
                             use_labels=False, xflip=bool(args.xflip))
    else:
        logger.log("WARNING: no data path — synthetic dataset (smoke mode)")
        ds = SyntheticEDMDataset(res, label_dim=0)

    x0 = jnp.zeros((1, res, res, 3))
    t0 = jnp.zeros((1,))
    params = jax.jit(model.init)(jax.random.PRNGKey(args.seed), x0, t0)

    micro = args.batch_gpu or args.batch
    assert args.batch % micro == 0, \
        f"--batch {args.batch} must divide by --batch_gpu {micro} " \
        "(cur_nimg/EMA/lr-ramp account batch_size images per step)"
    rounds = max(args.batch // micro, 1)
    loop_cfg = EDMLoopConfig(
        total_kimg=args.duration_kimg, batch_size=args.batch,
        num_accumulation_rounds=rounds, lr=args.lr,
        lr_rampup_kimg=args.lr_rampup_kimg,
        ema_halflife_kimg=args.ema_halflife_kimg, ema_rampup_ratio=0.05,
        kimg_per_tick=args.kimg_per_tick, snapshot_ticks=args.snapshot_ticks,
        state_dump_ticks=args.state_dump_ticks, max_wall_s=args.max_wall_s,
        run_dir=args.run_dir, seed=args.seed)

    state, tx = create_edm_train_state(params, loop_cfg)
    if args.resume_state and os.path.exists(args.resume_state):
        data = load_pytree(args.resume_state,
                           target={"params": state.params,
                                   "opt_state": state.opt_state,
                                   "ema_params": state.ema_params,
                                   "cur_nimg": np.asarray(0)})
        state = state.replace(params=data["params"],
                              opt_state=data["opt_state"],
                              ema_params=data["ema_params"],
                              cur_nimg=jnp.asarray(int(data["cur_nimg"])))
        logger.log("resumed from", args.resume_state)

    def model_apply(p, xt, t, dropout_key):
        rngs = {"dropout": dropout_key} if dropout_key is not None else None
        return model.apply(p, xt.astype(dtype), t, deterministic=False,
                           rngs=rngs)

    loss_elem = make_ddpm_hybrid_loss(tables, model_apply,
                                      learn_var=learn_var,
                                      vlb_weight=args.vlb_weight)
    train_step = make_train_step_from_loss(loss_elem, tx, loop_cfg)
    data_iter = infinite_batches(ds, micro, rounds, seed=args.seed)
    data_iter = ((jnp.asarray(x), jnp.asarray(l)) for x, l in data_iter)
    edm_training_loop(state, train_step, data_iter, loop_cfg,
                      key=jax.random.PRNGKey(args.seed))
    logger.log("training done")


if __name__ == "__main__":
    main(get_args())
