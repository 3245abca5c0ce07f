"""EDM Heun sampling CLI with noise-level correction.

Public-flag parity with reference edm_image_sample.py (:19-108): sigma_type
sub-step style pairs, norm_eps bit-string, eps_ratio/eps_scale blending,
sigma_style EDM|Linear, per-config norm defaults (cifar10 54.63, ffhq 102.0),
StackedRandomGenerator-style per-sample seeding, and PNG-skip resume.

Checkpoints: EDM persistence pickles load standalone via io.edm_pickle; sigma
heads load from torch .pt files via io.edm_convert.

Usage: python -m nlc_tpu.cli.edm_image_sample --config cifar10 ...
"""
from __future__ import annotations

import argparse
import json
import math
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from ..configs.config import get_config, dump_args, load_args, ConfigDict
from ..engine.edm import EDMModelBundle, EDMSamplerConfig, build_edm_sampler
from ..engine.loops import set_norm_maxmin
from ..eval import FIDComputer
from ..io.edm_convert import convert_song_unet, convert_edm_sigma_head
from ..io.edm_pickle import load_edm_state_dict
from ..io.torch_convert import load_torch_state_dict
from ..models.factory import create_edm_sigma_eps_model
from ..models.song_unet import SongUNet, EDMPrecond
from ..utils import logger
from ..utils.image_io import save_batch, batch_exists


EDM_CONFIGS = {
    "cifar10": ConfigDict.from_nested({
        "model": {"img_resolution": 32, "in_channels": 3, "out_channels": 3,
                  "model_channels": 128, "channel_mult": [2, 2, 2],
                  "num_blocks": 4, "attn_resolutions": [16], "dropout": 0.13,
                  "embedding_type": "positional", "encoder_type": "standard",
                  "decoder_type": "standard", "resample_filter": [1, 1]},
        "data": {"dataset": "CIFAR10", "image_size": 32, "channels": 3},
    }),
    "ffhq": ConfigDict.from_nested({
        "model": {"img_resolution": 64, "in_channels": 3, "out_channels": 3,
                  "model_channels": 128, "channel_mult": [1, 2, 2, 2],
                  "num_blocks": 4, "attn_resolutions": [16], "dropout": 0.05,
                  "embedding_type": "positional", "encoder_type": "standard",
                  "decoder_type": "standard", "resample_filter": [1, 1]},
        "data": {"dataset": "FFHQ", "image_size": 64, "channels": 3},
    }),
}


def get_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=str, default="cifar10",
                   choices=["cifar10", "ffhq"])
    p.add_argument("--config_path", type=str, default=None)
    p.add_argument("--sampler", type=str, default="edm",
                   choices=["edm", "ddim", "euler"])
    p.add_argument("--sigma_type", type=str, default="pred_partial,pred")
    p.add_argument("--norm_eps", type=str, default="00")
    p.add_argument("--num_timesteps", type=int, default=18)
    p.add_argument("--start_sigma", type=float, default=80)
    p.add_argument("--end_sigma", type=float, default=0.002)
    p.add_argument("--sigma_data", type=float, default=0.5)
    p.add_argument("--sigma_style", type=str, default="EDM",
                   choices=["Linear", "EDM"])
    p.add_argument("--eps_ratio", type=float, default=0.5)
    p.add_argument("--eps_scale", type=float, default=1.0)
    # Restart sampling (arXiv:2306.14878) — beyond-parity extension:
    # 't_min,t_max,K,n[;...]' intervals (engine/restart.py)
    p.add_argument("--restart", type=str, default="")
    p.add_argument("--restart_S_noise", type=float, default=1.0)
    p.add_argument("--no_eps_scale", action="store_true",
                   help="use cosine-similarity rescale (reference eps_scale=None)")
    p.add_argument("--eta", type=float, default=1.0)
    p.add_argument("--refine_sigma", type=int, default=0)
    p.add_argument("--S_churn", type=float, default=0.0)
    p.add_argument("--use_second_order", type=int, default=1)
    p.add_argument("--batch_size", type=int, default=200)
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--result_dir", type=str, default="results")
    p.add_argument("--test_dir", type=str, default="temp")
    p.add_argument("--sample_size", type=int, default=5000)
    p.add_argument("--save_folder", type=str, default=None)
    p.add_argument("--save_flag", type=str, default="0")
    p.add_argument("--sample_overwrite", type=int, default=0)
    p.add_argument("--load_folder", type=str, default=None)
    p.add_argument("--load_eps", type=str, default=None)
    p.add_argument("--load_sigma", type=str, default=None)
    p.add_argument("--fid_target", type=str, default=None)
    p.add_argument("--inception_ckpt", type=str, default=None)
    p.add_argument("--store_dir", type=str, default="store")
    p.add_argument("--device", type=str, default=None)  # accepted; jax picks devices
    p.add_argument("--sigma_block", type=int, default=2)
    p.add_argument("--sigma_dropout", type=float, default=0.0)
    p.add_argument("--bf16", type=int, default=1)
    p.add_argument("--quant", type=str, default="",
                   help="W8A8 int8 backend for the UNet's stride-1 3x3 convs "
                        "(ops/quant.py: conv|taps|im2col|pallas|auto, optional "
                        "@threshold suffix); empty = bf16")
    args = p.parse_args(argv)

    # args.json rehydration from a prior sigma-training run
    if args.load_folder is not None:
        run_dir = os.path.join(args.result_dir, args.config, args.load_folder)
        aj = os.path.join(run_dir, "args.json")
        if os.path.exists(aj):
            saved = load_args(aj)
            args.load_eps = args.load_eps or saved.get("load_eps")
            args.fid_target = args.fid_target or saved.get("fid_target")
            args.sigma_block = saved.get("sigma_block", args.sigma_block)
            args.sigma_dropout = saved.get("sigma_dropout", args.sigma_dropout)

    cfg_path = os.path.join(args.store_dir, "config",
                            (args.config_path or args.config) + ".yml")
    if os.path.exists(cfg_path):
        config = get_config(cfg_path)
    else:
        config = EDM_CONFIGS[args.config]

    # per-config defaults (reference :93-106)
    if args.config == "cifar10":
        args.norm_max, args.norm_min = 54.63, 0.0
    elif args.config == "ffhq":
        args.norm_max, args.norm_min = 102.0, 0.0
        args.load_eps = args.load_eps or os.path.join(
            args.store_dir, "models", "edm-ffhq-64x64-uncond-vp.pkl")
        args.fid_target = args.fid_target or os.path.join(
            args.store_dir, "fid", "ffhq-64x64.npz")
    return args, config


def build(args, config):
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    m = config.model
    model, head, ucfg = create_edm_sigma_eps_model(
        img_resolution=m.img_resolution, in_channels=m.get("in_channels", 3),
        out_channels=m.get("out_channels", 3),
        model_channels=m.get("model_channels", 128),
        channel_mult=m.get("channel_mult", [1, 2, 2, 2]),
        num_blocks=m.get("num_blocks", 4),
        attn_resolutions=m.get("attn_resolutions", [16]),
        dropout=m.get("dropout", 0.1),
        embedding_type=m.get("embedding_type", "positional"),
        encoder_type=m.get("encoder_type", "standard"),
        decoder_type=m.get("decoder_type", "standard"),
        resample_filter=m.get("resample_filter", [1, 1]),
        sigma_block=args.sigma_block, sigma_dropout=args.sigma_dropout,
        dtype=dtype, quant_backend=getattr(args, "quant", "") or None)

    res = m.img_resolution
    if args.load_eps and os.path.exists(args.load_eps):
        if os.path.isdir(args.load_eps):   # orbax dir (converter / trainer
            from ..io.checkpoints import load_pytree  # snapshot output)
            tree = load_pytree(args.load_eps)
            if "ema" in tree:              # network-snapshot-* layout
                tree = tree["ema"]
            params = tree if "params" in tree else {"params": tree}
        else:
            if args.load_eps.endswith(".pkl"):
                sd = load_edm_state_dict(args.load_eps)
            else:
                sd = load_torch_state_dict(args.load_eps)
            params = {"params": convert_song_unet(sd, ucfg)}
        logger.log(f"loaded eps model from {args.load_eps}")
    else:
        params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, res, res, 3)),
                            jnp.zeros((1,)))
        logger.log("WARNING: no eps checkpoint — random init (smoke mode)")
    if args.load_sigma and os.path.exists(args.load_sigma):
        if os.path.isdir(args.load_sigma):
            from ..io.checkpoints import load_pytree
            tree = load_pytree(args.load_sigma)
            svars = {"params": tree["params"],
                     "batch_stats": tree.get("batch_stats", {})}
        else:
            ssd = load_torch_state_dict(args.load_sigma)
            sp, sbs = convert_edm_sigma_head(ssd, ucfg.feat_shape[0],
                                             ucfg.feat_shape[2], args.sigma_block)
            svars = {"params": sp, "batch_stats": sbs}
        logger.log(f"loaded sigma model from {args.load_sigma}")
    else:
        svars = head.init(jax.random.PRNGKey(1),
                          jnp.zeros((1,) + ucfg.feat_shape))
        logger.log("WARNING: no sigma checkpoint — random init (smoke mode)")

    bundle = EDMModelBundle(
        forward=lambda p, z, t: model.apply(p, z, t),
        encode=lambda p, z, t: model.apply(p, z, t, method=SongUNet.encode),
        sigma=lambda v, f: head.apply(v, f),
        precond=EDMPrecond(sigma_data=args.sigma_data),
        forward_and_encode=lambda p, z, t: model.apply(
            p, z, t, method=SongUNet.forward_and_encode),
    )
    return bundle, params, svars, ucfg


def main(args, config):
    logger.configure(dir="./logs/")
    if args.save_folder is not None:
        args.test_dir = args.save_folder
    else:
        root = os.path.join(args.test_dir, args.config)
        i = 0
        while os.path.exists(os.path.join(root, str(i))):
            i += 1
        args.test_dir = os.path.join(root, str(i))
    os.makedirs(args.test_dir, exist_ok=True)
    dump_args(args, os.path.join(args.test_dir, "args.json"))

    bundle, params, svars, ucfg = build(args, config)

    # data-parallel sampling over all local devices that divide the batch
    # (no-op on one chip; per-sample seeding keeps images packing-invariant)
    from ..parallel.mesh import make_data_mesh, replicate, shard_batch
    mesh = make_data_mesh(args.batch_size)
    n_dp = int(np.prod(mesh.devices.shape))
    if n_dp > 1:
        logger.log(f"data-parallel sampling over {n_dp} devices")
        params = replicate(mesh, params)
        svars = replicate(mesh, svars)
    res = config.model.img_resolution
    dim = res * res * 3
    nmin, nmax = set_norm_maxmin((res, res, 3), args.norm_min, args.norm_max)
    scfg = EDMSamplerConfig(
        num_steps=args.num_timesteps, sigma_min=args.end_sigma,
        sigma_max=args.start_sigma, S_churn=args.S_churn,
        sigma_scheduler=args.sigma_style, style=args.sigma_type,
        norm_eps=args.norm_eps + "0" * (3 - len(args.norm_eps)),
        refine_prior_sigma=bool(args.refine_sigma), eps_ratio=args.eps_ratio,
        eps_scale=None if args.no_eps_scale else args.eps_scale,
        use_second_order=bool(args.use_second_order), norm_max=nmax,
        norm_min=nmin)
    if args.restart:
        from ..engine.restart import build_restart_sampler, parse_restart_spec
        intervals = parse_restart_spec(args.restart)
        logger.log("restart sampling:", intervals)
        sample_fn = build_restart_sampler(bundle, scfg, intervals,
                                          (res, res, 3),
                                          S_noise_restart=args.restart_S_noise)
    else:
        sample_fn = build_edm_sampler(bundle, scfg, (res, res, 3))

    fid = None
    if args.fid_target and os.path.exists(args.fid_target):
        extractor = None
        if args.inception_ckpt and os.path.exists(args.inception_ckpt):
            from ..eval.inception import make_inception_extractor
            extractor = make_inception_extractor(args.inception_ckpt)
        fid = FIDComputer(target=args.fid_target, extractor=extractor)

    images_dir = os.path.join(args.test_dir, args.save_flag, "images")
    os.makedirs(images_dir, exist_ok=True)
    n_batches = math.ceil(args.sample_size / args.batch_size)
    # pipelined: PNG writes of batch i overlap device compute of batch i+1
    pending = None
    for i in range(n_batches + 1):
        nxt = None
        if i < n_batches:
            if batch_exists(images_dir, i, args.batch_size) \
                    and not args.sample_overwrite:
                logger.log(f"skip batch {i}")
                continue
            # per-sample seeds = global sample indices
            # (StackedRandomGenerator parity)
            seeds = jnp.arange(i * args.batch_size, (i + 1) * args.batch_size)
            if n_dp > 1:
                seeds = shard_batch(mesh, seeds)
            nxt = (i, sample_fn(params, svars, seeds), time.time())
        if pending is not None:
            j, sample, t1 = pending
            sample.block_until_ready()
            logger.log(f"done batches:{j}/{n_batches} time {time.time()-t1:.2f}s")
            save_batch(np.asarray(sample), images_dir, j)
        pending = nxt
    if pending is not None:
        j, sample, t1 = pending
        sample.block_until_ready()
        logger.log(f"done batches:{j}/{n_batches} time {time.time()-t1:.2f}s")
        save_batch(np.asarray(sample), images_dir, j)

    log_dict = {}
    if fid is not None:
        log_dict["fid"] = fid.fid_of_dir(images_dir)
        log_dict["fid_backend"] = fid.backend
        if not fid.is_inception:
            log_dict["fid_note"] = "fallback embedding — relative only"
    with open(os.path.join(args.test_dir, args.save_flag, "results.json"), "w") as f:
        json.dump(log_dict, f)
    logger.log(log_dict)
    logger.log("evaluate done")
    return log_dict


if __name__ == "__main__":
    a, c = get_args()
    main(a, c)
