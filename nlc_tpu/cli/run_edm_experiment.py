"""Sigma-head trainer CLI for EDM backbones.

Public-flag parity with reference run_edm_experiment.py: cifar10/ffhq pkl
checkpoints, --sigma_sampler {edm,random}, --loss_weighted, EDM-style noise
perturbation; evaluation samples with the Heun sampler in base and
pred_partial styles (reference experiments.py:1034-1049).

Usage: python -m nlc_tpu.cli.run_edm_experiment --config cifar10 ...
"""
from __future__ import annotations

import argparse
import os

import numpy as np

import jax
import jax.numpy as jnp

from ..configs.config import get_config, dump_args
from ..data import load_training_data
from ..engine.edm import EDMModelBundle, EDMSamplerConfig, build_edm_sampler
from ..engine.loops import set_norm_maxmin
from ..eval.fid import FIDComputer
from ..io.edm_convert import convert_song_unet
from ..io.edm_pickle import load_edm_state_dict
from ..models.factory import create_edm_sigma_eps_model
from ..models.song_unet import SongUNet, EDMPrecond
from ..parallel.mesh import make_data_mesh, replicate, shard_batch
from ..train import create_sigma_train_state
from ..train.edm_sigma_trainer import EDMTrainConfig, make_edm_sigma_train_step
from ..train.loop import TrainLoopConfig, run_sigma_training
from ..train.sigma_trainer import PerturbCoefficients
from ..utils import logger
from ..utils.image_io import save_batch
from .edm_image_sample import EDM_CONFIGS

EDM_TRAIN_DEFAULTS = {
    "cifar10": ("models/edm-cifar10-32x32-uncond-vp.pkl",
                "fid/cifar10-32x32.npz", 54.63, 0.0, 18),
    "ffhq": ("models/edm-ffhq-64x64-uncond-vp.pkl",
             "fid/ffhq-64x64.npz", 102.0, 0.0, 40),
}


def get_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=str, default="cifar10",
                   choices=["cifar10", "ffhq"])
    p.add_argument("--config_path", type=str, default=None)
    p.add_argument("--sigma_sampler", type=str, default="edm",
                   choices=["edm", "random"])
    p.add_argument("--loss_weighted", type=int, default=0)
    p.add_argument("--sigma_loss", type=str, default="mse",
                   choices=["mae", "mse", "huber"])
    p.add_argument("--sigma_block", type=int, default=2)
    p.add_argument("--sigma_dropout", type=float, default=0.1)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--weight_decay", type=float, default=0.0)
    p.add_argument("--ema_rate", type=float, default=0.9995)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--epoch", type=int, default=500)
    p.add_argument("--iter_per_epoch", type=int, default=500)
    p.add_argument("--eval_per_epoch", type=int, default=100)
    p.add_argument("--save_per_epoch", type=int, default=100)
    p.add_argument("--eta1_min", type=float, default=-0.5)
    p.add_argument("--eta1_scale", type=float, default=1.0)
    p.add_argument("--eta2_min", type=float, default=0.0)
    p.add_argument("--eta2_scale", type=float, default=0.0)
    p.add_argument("--num_timesteps", type=int, default=None)
    p.add_argument("--start_sigma", type=float, default=80)   # eval sigma grid
    p.add_argument("--end_sigma", type=float, default=0.002)
    p.add_argument("--result_dir", type=str, default="results")
    p.add_argument("--seed", type=int, default=2023)
    p.add_argument("--load_eps", type=str, default=None)
    p.add_argument("--load_folder", type=str, default=None,
                   help="reuse an existing run dir under result_dir instead "
                        "of allocating a new numbered one")
    p.add_argument("--resume_model", type=str, default=None)
    p.add_argument("--resume_ema_model", type=str, default=None)
    p.add_argument("--resume_optim", type=str, default=None)
    p.add_argument("--fid_target", type=str, default=None)
    p.add_argument("--inception_ckpt", type=str, default=None)
    p.add_argument("--data_dir", type=str, default=None)
    p.add_argument("--store_dir", type=str, default="store")
    p.add_argument("--bf16", type=int, default=1)
    p.add_argument("--use_sigma_fp16", type=int, default=0,
                   help="train the sigma head in bf16 (TPU analog of the "
                        "reference's fp16 torso)")
    # accepted for reference-script compatibility; jax-native equivalents
    p.add_argument("--device", type=str, default=None)        # jax picks devices
    p.add_argument("--dist_train", type=int, default=1)       # mesh DP is automatic
    p.add_argument("--feat_layer", type=int, default=1)       # dead in reference EDM path too
    p.add_argument("--microbatch", type=int, default=128)     # TPU fits the full batch
    args = p.parse_args(argv)

    args.result_dir = os.path.join(args.result_dir, args.config)
    cfg_path = os.path.join(args.store_dir, "config",
                            (args.config_path or args.config) + ".yml")
    config = get_config(cfg_path) if os.path.exists(cfg_path) \
        else EDM_CONFIGS[args.config]
    eps, fid, nmax, nmin, steps = EDM_TRAIN_DEFAULTS[args.config]
    args.load_eps = args.load_eps or os.path.join(args.store_dir, eps)
    args.fid_target = args.fid_target or os.path.join(args.store_dir, fid)
    args.norm_max, args.norm_min = nmax, nmin
    if args.num_timesteps is None:
        args.num_timesteps = steps
    return args, config


def main(args, config):
    logger.configure(dir="./logs/")
    if args.load_folder is not None:   # reference :123-141 resume-into-run-dir
        save_dir = os.path.join(args.result_dir, str(args.load_folder))
    else:
        i = 0
        while os.path.exists(os.path.join(args.result_dir, str(i))):
            i += 1
        save_dir = os.path.join(args.result_dir, str(i))
    os.makedirs(save_dir, exist_ok=True)
    dump_args(args, os.path.join(save_dir, "args.json"))

    # --bf16 controls the frozen eps torso; --use_sigma_fp16 independently
    # lowers only the sigma head (reference run_edm_experiment.py:192-195)
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    sigma_dtype = jnp.bfloat16 if (args.bf16 or args.use_sigma_fp16) \
        else jnp.float32
    m = config.model
    model, head, ucfg = create_edm_sigma_eps_model(
        img_resolution=m.img_resolution, model_channels=m.get("model_channels", 128),
        channel_mult=m.get("channel_mult", [1, 2, 2, 2]),
        num_blocks=m.get("num_blocks", 4),
        attn_resolutions=m.get("attn_resolutions", [16]),
        dropout=m.get("dropout", 0.1), sigma_block=args.sigma_block,
        sigma_dropout=args.sigma_dropout, dtype=dtype, sigma_dtype=sigma_dtype)
    res = m.img_resolution

    if args.load_eps and os.path.exists(args.load_eps):
        if os.path.isdir(args.load_eps):   # orbax dir (e.g. edm_train snapshot)
            from ..io.checkpoints import load_pytree
            tree = load_pytree(args.load_eps)
            if "ema" in tree:
                tree = tree["ema"]
            frozen_params = tree if "params" in tree else {"params": tree}
        else:
            sd = load_edm_state_dict(args.load_eps)
            frozen_params = {"params": convert_song_unet(sd, ucfg)}
        logger.log("loaded eps from", args.load_eps)
    else:
        frozen_params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                   jnp.zeros((1, res, res, 3)), jnp.zeros((1,)))
        logger.log("WARNING: random frozen eps (smoke mode)")

    svars = head.init(jax.random.PRNGKey(args.seed),
                      jnp.zeros((1,) + ucfg.feat_shape), deterministic=False,
                      use_running_average=False)
    from ..io.checkpoints import resume_sigma_state
    state, tx = resume_sigma_state(
        svars,
        lambda v: create_sigma_train_state(v, lr=args.lr,
                                           weight_decay=args.weight_decay),
        args.resume_model, args.resume_ema_model, args.resume_optim,
        log=logger.log)

    def encode_fn(p, z, t):
        return model.apply(p, z, t, method=SongUNet.encode)

    def sigma_apply(variables, feat, rngs=None):
        out, mut = head.apply(variables, feat, deterministic=False,
                              use_running_average=False, rngs=rngs,
                              mutable=["batch_stats"])
        return out, mut["batch_stats"]

    train_step = make_edm_sigma_train_step(
        encode_fn, sigma_apply, tx, loss_name=args.sigma_loss,
        ema_rate=args.ema_rate,
        perturb=PerturbCoefficients(args.eta1_min, args.eta1_scale,
                                    args.eta2_min, args.eta2_scale),
        cfg=EDMTrainConfig(sigma_sampler=args.sigma_sampler,
                           loss_weighted=bool(args.loss_weighted)))

    mesh = make_data_mesh(args.batch_size)
    frozen_params = replicate(mesh, frozen_params)
    state = replicate(mesh, state)
    raw_iter = load_training_data(args.data_dir, args.batch_size, res,
                                  seed=args.seed)
    data_iter = ((shard_batch(mesh, 2 * x - 1 if x.max() <= 1 else x), y)
                 for x, y in raw_iter)

    fid = None
    if args.fid_target and os.path.exists(args.fid_target):
        fid = FIDComputer(target=args.fid_target)

    bundle = EDMModelBundle(
        forward=lambda p, z, t: model.apply(p, z, t),
        encode=encode_fn, sigma=lambda v, f: head.apply(v, f),
        precond=EDMPrecond())
    nmin, nmax = set_norm_maxmin((res, res, 3), args.norm_min, args.norm_max)
    base_fn = build_edm_sampler(bundle, EDMSamplerConfig(
        num_steps=args.num_timesteps, sigma_max=args.start_sigma,
        sigma_min=args.end_sigma, style="base,base"), (res, res, 3))
    pred_fn = build_edm_sampler(bundle, EDMSamplerConfig(
        num_steps=args.num_timesteps, sigma_max=args.start_sigma,
        sigma_min=args.end_sigma, style="pred_partial,pred_partial",
        norm_eps="110", refine_prior_sigma=True, norm_max=nmax, norm_min=nmin),
        (res, res, 3))

    def eval_fn(st, epoch):
        out = {}
        for style, fn, use_ema in [("base", base_fn, False), ("pred", pred_fn, True)]:
            sv = {"params": st.ema_params if use_ema else st.params,
                  "batch_stats": st.batch_stats}
            images_dir = os.path.join(save_dir, "images", f"{style}_ep{epoch}")
            for b in range(max((args.batch_size * 8) // args.batch_size, 1)):
                seeds = jnp.arange(b * args.batch_size, (b + 1) * args.batch_size)
                sample = fn(frozen_params, sv, seeds)
                save_batch(np.asarray(sample), images_dir, b)
            if fid is not None:
                out["fid" if style == "base" else "fid_pred"] = \
                    fid.fid_of_dir(images_dir)
                out["fid_backend"] = fid.backend
        return out

    loop_cfg = TrainLoopConfig(epochs=args.epoch, iter_per_epoch=args.iter_per_epoch,
                               eval_per_epoch=args.eval_per_epoch,
                               save_per_epoch=args.save_per_epoch,
                               save_dir=save_dir)
    run_sigma_training(state, train_step, frozen_params, data_iter, loop_cfg,
                       eval_fn=eval_fn, key=jax.random.PRNGKey(args.seed))
    logger.log("training done")


if __name__ == "__main__":
    a, c = get_args()
    main(a, c)
