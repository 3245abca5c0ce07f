"""Sigma-model trainer CLI (ADM / DDIM backbones).

Public-flag parity with reference run_image_experiment.py (:23-136): same
flag names and per-config defaults (store/models checkpoint paths, norm_max
calibrations). The distributed story is jax-native: one process per host,
batch sharded over the mesh 'data' axis, params replicated — replacing the
reference's mpirun + NCCL DDP path (--dist_train/--n_dp are accepted and
ignored with a note; scaling is controlled by the jax runtime).

Usage: python -m nlc_tpu.cli.run_image_experiment --config cifar10 ...
"""
from __future__ import annotations

import argparse
import os

import numpy as np

import jax
import jax.numpy as jnp

from ..configs.config import get_config, dump_args
from ..data import load_training_data
from ..engine import ModelBundle
from ..engine.loops import set_norm_maxmin
from ..eval.fid import FIDComputer
from ..io.adm_convert import convert_adm_unet
from ..io.torch_convert import load_torch_state_dict, convert_ddim_unet
from ..models.adm_unet import ADMUNet
from ..models.ddim_unet import DDIMUNet
from ..models.factory import create_sigma_eps_model, create_simple_sigma_eps_model
from ..parallel.mesh import make_data_mesh, replicate, shard_batch
from ..sched import get_sampler
from ..train import create_sigma_train_state, make_sigma_train_step
from ..train.loop import TrainLoopConfig, run_sigma_training, make_denoise_eval_fn
from ..train.sigma_trainer import PerturbCoefficients
from ..utils import logger

TRAIN_DEFAULTS = {
    "cifar10": ("store/models/ADM_cifar10_baseline.pt",
                "store/fid/fid_cifar10_train.npz", 54.70, 0.0),
    "imagenet": ("store/models/256x256_diffusion_uncond.pt",
                 "store/fid/fid_imagenet.npz", 440.0, 0.0),
    "celeba_hq": ("store/models/celeba_hq.ckpt",
                  "store/fid/fid_celebahq_1k_orig.npz", 397.0, 0.0),
    "celeba": ("store/models/celeba64_ckpt.pth",
               "store/fid/fid_celeba_train.npz", 110.0, 0.0),
}


def get_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=str, default="cifar10",
                   choices=["cifar10", "imagenet", "celeba_hq", "celeba"])
    p.add_argument("--config_path", type=str, default=None)
    p.add_argument("--norm_eps", type=int, default=1)
    p.add_argument("--sampler", type=str, default="ddim",
                   choices=["ddpm", "ddim", "ge", "ddim_simple"])
    p.add_argument("--num_timesteps", type=int, default=10)
    p.add_argument("--max_T", type=int, default=990)
    p.add_argument("--start_sigma", type=float, default=80)
    p.add_argument("--end_sigma", type=float, default=0.0)
    p.add_argument("--sigma_style", type=str, default="Linear",
                   choices=["Linear", "DDIM", "Scaled"])
    p.add_argument("--sampler_var", type=str, default="fixedsmall",
                   choices=["learned", "fixedsmall", "fixedlarge", "none"])
    p.add_argument("--eta", type=float, default=0.0)
    p.add_argument("--final_alpha_one", type=int, default=1)
    p.add_argument("--sigma_loss", type=str, default="mse",
                   choices=["mae", "mse", "huber"])
    p.add_argument("--sigma_block", type=int, default=3)
    p.add_argument("--sigma_dropout", type=float, default=0.1)
    p.add_argument("--feat_layer", type=int, default=1)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--weight_decay", type=float, default=0.0)
    p.add_argument("--ema_rate", type=float, default=0.9995)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--microbatch", type=int, default=64)  # accepted; TPU fits full batch
    p.add_argument("--epoch", type=int, default=500)
    p.add_argument("--iter_per_epoch", type=int, default=500)
    p.add_argument("--eval_per_epoch", type=int, default=100)
    p.add_argument("--save_per_epoch", type=int, default=100)
    p.add_argument("--eta1_min", type=float, default=-0.5)
    p.add_argument("--eta1_scale", type=float, default=1.0)
    p.add_argument("--eta2_min", type=float, default=0.0)
    p.add_argument("--eta2_scale", type=float, default=0.0)
    p.add_argument("--result_dir", type=str, default="results")
    p.add_argument("--dist_train", type=int, default=1)   # accepted; jax-native DP
    p.add_argument("--n_dp", type=int, default=2)         # accepted; mesh decides
    p.add_argument("--seed", type=int, default=2023)
    p.add_argument("--load_folder", type=str, default=None)
    p.add_argument("--load_eps", type=str, default=None)
    p.add_argument("--fid_target", type=str, default=None)
    p.add_argument("--inception_ckpt", type=str, default=None)
    p.add_argument("--data_dir", type=str, default=None)
    p.add_argument("--store_dir", type=str, default="store")
    p.add_argument("--resume_model", type=str, default=None)
    p.add_argument("--resume_ema_model", type=str, default=None)
    p.add_argument("--resume_optim", type=str, default=None)
    p.add_argument("--bf16", type=int, default=1)
    p.add_argument("--use_sigma_fp16", type=int, default=0)
    p.add_argument("--continuous_t", type=int, default=0)
    # accepted for reference-script compatibility (dead or jax-native there too)
    p.add_argument("--device", type=str, default=None)
    p.add_argument("--refine_sigma", type=int, default=0)  # unused by reference trainer
    args = p.parse_args(argv)

    if args.config_path is None:
        args.config_path = args.config
    args.result_dir = os.path.join(args.result_dir, args.config)

    cfg_path = os.path.join(args.store_dir, "config", args.config_path + ".yml")
    config = get_config(cfg_path if os.path.exists(cfg_path) else
                        ("celeba_ddim" if args.config == "celeba" else
                         "celeba_hq" if args.config == "celeba_hq" else
                         "cifar10_adm" if args.config == "cifar10" else "imagenet"))
    config.model.sigma_block = args.sigma_block
    config.model.sigma_dropout = args.sigma_dropout
    config.model.feat_layer = args.feat_layer

    eps, fid, nmax, nmin = TRAIN_DEFAULTS[args.config]
    args.load_eps = args.load_eps or os.path.join(args.store_dir, *eps.split("/")[1:])
    args.fid_target = args.fid_target or os.path.join(args.store_dir,
                                                      *fid.split("/")[1:])
    args.norm_max, args.norm_min = nmax, nmin
    return args, config


def main(args, config):
    logger.configure(dir="./logs/")
    # run-dir allocation: --load_folder resumes INTO the named run dir
    # (run_edm_experiment.py semantics — chunked-resume callers depend on
    # later chunks overwriting the same dir's checkpoints); otherwise
    # auto-increment (reference :147-165). Previously --load_folder was
    # parsed but ignored here, so a resumed chunk silently wrote its
    # checkpoints to a NEW dir while callers kept reading the old one.
    if args.load_folder is not None:
        save_dir = os.path.join(args.result_dir, args.load_folder)
    else:
        i = 0
        while os.path.exists(os.path.join(args.result_dir, str(i))):
            i += 1
        save_dir = os.path.join(args.result_dir, str(i))
    os.makedirs(save_dir, exist_ok=True)
    dump_args(args, os.path.join(save_dir, "args.json"))
    logger.log("run dir:", save_dir)

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    mcfg = config.model
    if mcfg.type == "openai":
        model, head, ucfg = create_sigma_eps_model(
            image_size=mcfg.image_size, num_channels=mcfg.num_channels,
            num_res_blocks=mcfg.num_res_blocks,
            channel_mult=mcfg.get("channel_mult", ""),
            learn_sigma=mcfg.get("learn_sigma", False),
            attention_resolutions=mcfg.get("attention_resolutions", "16"),
            num_heads=mcfg.get("num_heads", 1),
            num_head_channels=mcfg.get("num_head_channels", -1),
            use_scale_shift_norm=mcfg.get("use_scale_shift_norm", False),
            dropout=mcfg.get("dropout", 0.0),
            resblock_updown=mcfg.get("resblock_updown", False),
            use_new_attention_order=mcfg.get("use_new_attention_order", False),
            sigma_block=args.sigma_block, sigma_dropout=args.sigma_dropout,
            feat_layer=args.feat_layer, dtype=dtype)
        convert = convert_adm_unet
        encode_method = ADMUNet.encode
    else:
        model, head, ucfg = create_simple_sigma_eps_model(config, dtype=dtype)
        convert = convert_ddim_unet
        encode_method = DDIMUNet.encode

    res = config.data.image_size
    if args.load_eps and os.path.exists(args.load_eps):
        if os.path.isdir(args.load_eps):   # orbax dir
            from ..io.checkpoints import load_pytree
            tree = load_pytree(args.load_eps)
            if "ema" in tree:              # network-snapshot-* layout
                tree = tree["ema"]
            frozen_params = tree if "params" in tree else {"params": tree}
        else:
            sd = load_torch_state_dict(args.load_eps)
            frozen_params = {"params": convert(sd, ucfg)}
        logger.log("loaded eps from", args.load_eps)
    else:
        frozen_params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                   jnp.zeros((1, res, res, 3)), jnp.zeros((1,)))
        logger.log("WARNING: random frozen eps model (smoke mode)")

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

    sampler = get_sampler(args.sampler, config.diffusion.num_diffusion_timesteps,
                          args.num_timesteps,
                          beta_schedule=config.diffusion.beta_schedule,
                          sigma_style=args.sigma_style,
                          set_alpha_to_one=bool(args.final_alpha_one),
                          start_sigma=args.start_sigma, end_sigma=args.end_sigma,
                          sampler_var=args.sampler_var, eta=args.eta,
                          continuous_t=bool(args.continuous_t))

    def encode_fn(p, z, t):
        return model.apply(p, z, t, method=encode_method)

    def sigma_apply(variables, feat, rngs=None):
        out, mut = head.apply(variables, feat, deterministic=False,
                              use_running_average=False, rngs=rngs,
                              mutable=["batch_stats"])
        return out, mut["batch_stats"]

    train_step = make_sigma_train_step(
        sampler.schedule, encode_fn, sigma_apply, tx, loss_name=args.sigma_loss,
        ema_rate=args.ema_rate,
        perturb=PerturbCoefficients(args.eta1_min, args.eta1_scale,
                                    args.eta2_min, args.eta2_scale),
        max_T=args.max_T)

    mesh = make_data_mesh(args.batch_size)
    frozen_params = replicate(mesh, frozen_params)
    state = replicate(mesh, state)

    raw_iter = load_training_data(args.data_dir, args.batch_size, res,
                                  seed=args.seed)
    data_iter = ((shard_batch(mesh, x), y) for x, y in raw_iter)

    fid = None
    if args.fid_target and os.path.exists(args.fid_target):
        extractor = None
        if args.inception_ckpt and os.path.exists(args.inception_ckpt):
            from ..eval.inception import make_inception_extractor
            extractor = make_inception_extractor(args.inception_ckpt)
        fid = FIDComputer(target=args.fid_target, extractor=extractor)

    bundle = ModelBundle(
        forward=lambda p, z, t: model.apply(p, z, t),
        encode=encode_fn,
        sigma=lambda v, f: head.apply(v, f),
        learn_epsvar=mcfg.get("learn_sigma", False) if mcfg.type == "openai" else False)
    nmin, nmax = set_norm_maxmin((res, res, 3), args.norm_min, args.norm_max)
    eval_fn = make_denoise_eval_fn(sampler, bundle, frozen_params, (res, res, 3),
                                   save_dir, fid, sample_size=args.batch_size * 8,
                                   batch_size=args.batch_size, norm_max=nmax,
                                   norm_min=nmin)

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
