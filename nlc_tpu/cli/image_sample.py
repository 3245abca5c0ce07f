"""Sampling / restoration CLI — the flagship evaluation entry point.

Public-flag parity with reference image_sample.py (:32-279): same flag names,
choices, method presets (:183-268), per-dataset defaults (:143-181),
run-dir auto-increment (:725-731), args.json persistence, PNG-skip resume,
and results.json metric dumps. Asset paths (configs, checkpoints, fid stats,
masks) follow the same store/ layout but are all overridable.

Differences by design:
  * the whole sampling loop is one jitted lax.scan per batch (engine.loops);
  * checkpoints are torch files converted on load (io.torch_convert) or
    orbax-native;
  * FID uses eval.fid with Inception weights when provided, else the labeled
    fallback embedding.

Usage: python -m nlc_tpu.cli.image_sample --config celeba_hq --method base ...
"""
from __future__ import annotations

import argparse
import json
import math
import os
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..configs import apply_method_preset, apply_dataset_defaults
from ..configs.config import get_config, dump_args, load_args
from ..data import get_eval_dataset, batch_iterator
from ..engine import (DenoiseConfig, ModelBundle,
                      init_noise)
from ..engine.loops import set_norm_maxmin
from ..eval import calculate_ssim, FIDComputer
from ..io.adm_convert import convert_adm_unet, convert_adm_sigma_head
from ..io.torch_convert import (load_torch_state_dict, convert_ddim_unet,
                                convert_sigma_head)
from ..models.adm_unet import ADMUNet
from ..models.ddim_unet import DDIMUNet
from ..models.factory import create_sigma_eps_model, create_simple_sigma_eps_model
from ..operators import get_constraint_function
from ..sched import get_sampler
from ..sched.redesign import redesign_sigma_tail
from ..utils import logger
from ..utils.image_io import save_batch, batch_exists, save_image, from_minus1_1

CONSTRAINTS = ["none", "sr_bicubic", "sr_averagepooling", "deblur_gauss",
               "colorization", "cs_walshhadamard", "inpainting", "inpainting_half"]
SAMPLERS = ["ddpm", "ddim", "ge", "ddim_simple", "ddim_orig", "ddpm_orig",
            "ddim_simple_orig", "ddim_simple_drag"]
METHOD_CHOICES = ["default", "base", "pred_denoise_base", "pred_denoise_proj",
                  "pred_denoise_proj_arbit", "pred_proj",
                  "pred_denoise_base_nonorm", "pred_denoise_base_norefine",
                  "pred_partial_denoise_base"]


def get_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=str, default="cifar10",
                   choices=["cifar10", "imagenet", "celeba", "celeba_hq"])
    p.add_argument("--config_path", type=str, default="cifar10_adm")
    p.add_argument("--constraint", type=str, default="none", choices=CONSTRAINTS)
    p.add_argument("--constraint_proj", type=str, default="svd",
                   choices=["none", "simple", "svd", "simple_gd", "svd_gd", "ddrm"])
    p.add_argument("--constraint_scale", type=float, default=4.0)
    p.add_argument("--constraint_lr", type=float, default=10)
    p.add_argument("--constraint_iter", type=int, default=10)
    p.add_argument("--constraint_loss", type=str, default="l1", choices=["l1", "l2"])
    p.add_argument("--prior_xt", type=int, default=0)

    p.add_argument("--norm_eps", type=int, default=0)
    p.add_argument("--sigma_type", type=str, default="pred",
                   choices=["base", "pred", "pred_partial", "pred_fast"])
    p.add_argument("--sampling", type=str, default="project",
                   choices=["denoise", "project"])
    p.add_argument("--norm_init_noise", type=int, default=0)
    p.add_argument("--redesign_sigma", type=int, default=1)
    p.add_argument("--min_sigma", type=float, default=0.003)
    p.add_argument("--max_sigma", type=float, default=0.02)
    p.add_argument("--sigma_gamma", type=float, default=1.0)
    p.add_argument("--cycle_size", type=int, default=10)
    p.add_argument("--max_T", type=int, default=10)
    p.add_argument("--sampler", type=str, default="ddim_simple_orig", choices=SAMPLERS)
    p.add_argument("--num_timesteps", type=int, default=100)
    p.add_argument("--start_sigma", type=float, default=100)
    p.add_argument("--end_sigma", type=float, default=0)
    p.add_argument("--start_t", type=int, default=-1)
    p.add_argument("--end_t", type=int, default=-1)
    p.add_argument("--sigma_style", type=str, default="DDIM",
                   choices=["Linear", "DDIM", "Scaled"])
    p.add_argument("--linear_scale", type=float, default=1.0)
    p.add_argument("--sampler_var", type=str, default="learned",
                   choices=["learned", "fixedsmall", "fixedlarge", "none"])
    p.add_argument("--eta", type=float, default=0.85)
    p.add_argument("--new_eta", type=float, default=None)
    p.add_argument("--refine_sigma", type=int, default=1)
    p.add_argument("--continuous_t", type=int, default=1)
    p.add_argument("--final_alpha_one", type=int, default=1)
    p.add_argument("--time_shift", type=int, default=0)
    p.add_argument("--sigma_estimate", type=str, default="1000")
    p.add_argument("--sigma_pred_threshold", type=int, default=960)
    p.add_argument("--clip_fn", type=str, default="none",
                   choices=["none", "clamp", "dynamic"])
    p.add_argument("--recal_sigma_prev", type=int, default=1)
    p.add_argument("--batch_size", type=int, default=10)
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--result_dir", type=str, default="results")
    p.add_argument("--test_dir", type=str, default="temp2")
    p.add_argument("--sample_size", type=int, default=1000)
    p.add_argument("--save_folder", type=str, default=None)
    p.add_argument("--save_flag", type=str, default="0")
    p.add_argument("--sample_overwrite", type=int, default=0)
    p.add_argument("--load_folder", type=str, default=None)
    p.add_argument("--load_eps", type=str, default=None)
    p.add_argument("--load_sigma", type=str, default=None)
    p.add_argument("--fid_target", type=str, default=None)
    p.add_argument("--inception_ckpt", type=str, default=None)
    p.add_argument("--data_dir", type=str, default=None)
    p.add_argument("--mask_dir", type=str, default="store/inp_masks")
    p.add_argument("--store_dir", type=str, default="store")
    p.add_argument("--device", type=str, default=None)  # accepted; jax picks devices
    p.add_argument("--method", type=str, default="pred_denoise_base",
                   choices=METHOD_CHOICES)
    p.add_argument("--return_log", type=int, default=0)
    # parallel-in-time (Picard) sampling — beyond-parity latency extension
    # (engine/parallel_sampler.py): W window points evaluated as one batched
    # UNet call, K iterations per window; K=W is bit-exact sequential DDIM.
    # Deterministic unconstrained sampling only (eta 0, sigma_type base).
    p.add_argument("--parallel_window", type=int, default=0)
    p.add_argument("--picard_iters", type=int, default=0)
    p.add_argument("--bf16", type=int, default=1)
    # W8A8 int8 interior convs (ops/quant.py), same surface as
    # edm_image_sample --quant; '' keeps the bf16 loop
    p.add_argument("--quant", type=str, default="",
                   help="int8 conv backend: conv|taps|im2col|pallas|auto, "
                        "optional @N resolution floor (e.g. auto, conv@64)")

    args = p.parse_args(argv)
    if args.config_path is None:
        args.config_path = args.config

    # rehydrate training-run args when a run dir exists (args.json round-trip)
    if args.load_folder is not None:
        run_dir = os.path.join(args.result_dir, args.config_path, args.load_folder)
        args_json = os.path.join(run_dir, "args.json")
        if os.path.exists(args_json):
            saved = load_args(args_json)
            args.load_eps = args.load_eps or saved.get("load_eps")
            args.fid_target = args.fid_target or saved.get("fid_target")
            args.sigma_block = saved.get("sigma_block", 2)
            args.sigma_dropout = saved.get("sigma_dropout", 0.0)
    if not hasattr(args, "sigma_block"):
        args.sigma_block = 2
        args.sigma_dropout = 0.0

    # sigma_estimate string -> normalized 4-rate vector
    rates = [float(x) for x in args.sigma_estimate]
    while len(rates) < 4:
        rates.append(0.0)
    s = sum(rates)
    rates = [round(r / s, 2) for r in rates]
    rates[0] += 1 - sum(rates)
    args.sigma_estimate_rate = rates

    cfg_path = os.path.join(args.store_dir, "config", args.config_path + ".yml")
    config = get_config(cfg_path if os.path.exists(cfg_path) else args.config_path)

    apply_dataset_defaults(args)
    apply_method_preset(args)
    return args, config


def build_models_and_params(args, config):
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    mcfg = config.model
    if mcfg.type == "openai":
        model, head, ucfg = create_sigma_eps_model(
            image_size=mcfg.image_size, num_channels=mcfg.num_channels,
            num_res_blocks=mcfg.num_res_blocks,
            channel_mult=mcfg.get("channel_mult", ""),
            learn_sigma=mcfg.get("learn_sigma", False),
            class_cond=mcfg.get("class_cond", False),
            attention_resolutions=mcfg.get("attention_resolutions", "16"),
            num_heads=mcfg.get("num_heads", 1),
            num_head_channels=mcfg.get("num_head_channels", -1),
            num_heads_upsample=mcfg.get("num_heads_upsample", -1),
            use_scale_shift_norm=mcfg.get("use_scale_shift_norm", False),
            dropout=mcfg.get("dropout", 0.0),
            resblock_updown=mcfg.get("resblock_updown", False),
            use_new_attention_order=mcfg.get("use_new_attention_order", False),
            sigma_block=args.sigma_block, sigma_dropout=args.sigma_dropout,
            feat_layer=mcfg.get("feat_layer", 1), dtype=dtype,
            quant_backend=getattr(args, "quant", "") or None)
        convert_unet = partial(convert_adm_unet, config=ucfg)
        convert_head_fn = lambda sd: convert_adm_sigma_head(
            sd, ucfg.feat_shape[0], ucfg.feat_shape[2], args.sigma_block)
        learn_epsvar = mcfg.get("learn_sigma", False)
        encode_method = ADMUNet.encode
    else:
        config.model.sigma_block = args.sigma_block
        config.model.sigma_dropout = args.sigma_dropout
        model, head, ucfg = create_simple_sigma_eps_model(
            config, dtype=dtype,
            quant_backend=getattr(args, "quant", "") or None)
        convert_unet = partial(convert_ddim_unet, config=ucfg)
        hcfg = type("H", (), {"dim": ucfg.feat_shape[0],
                              "channels": ucfg.feat_shape[2],
                              "n_blocks": args.sigma_block})
        convert_head_fn = lambda sd: convert_sigma_head(sd, hcfg)
        learn_epsvar = False
        encode_method = DDIMUNet.encode

    res = config.data.image_size
    x0 = jnp.zeros((1, res, res, 3))
    t0 = jnp.zeros((1,))
    if args.load_eps and os.path.exists(args.load_eps):
        if os.path.isdir(args.load_eps):   # orbax dir (convert_checkpoint
            from ..io.checkpoints import load_pytree  # or ddpm_train snapshot)
            tree = load_pytree(args.load_eps)
            if "ema" in tree:              # network-snapshot-* layout
                tree = tree["ema"]
            params = tree if "params" in tree else {"params": tree}
        else:
            sd = load_torch_state_dict(args.load_eps)
            params = {"params": convert_unet(sd)}
        logger.log(f"loaded eps model from {args.load_eps}")
    else:
        params = jax.jit(model.init)(jax.random.PRNGKey(0), x0, t0)
        logger.log("WARNING: no eps checkpoint — random init (smoke mode)")
    if args.load_sigma and os.path.exists(args.load_sigma):
        if os.path.isdir(args.load_sigma):   # orbax dir (trainer checkpoints)
            from ..io.checkpoints import load_pytree
            tree = load_pytree(args.load_sigma)
            svars = {"params": tree["params"],
                     "batch_stats": tree.get("batch_stats", {})}
        else:
            ssd = load_torch_state_dict(args.load_sigma)
            sp, sbs = convert_head_fn(ssd)
            svars = {"params": sp, "batch_stats": sbs}
        logger.log(f"loaded sigma model from {args.load_sigma}")
    else:
        feat = jnp.zeros((1,) + ucfg.feat_shape)
        svars = head.init(jax.random.PRNGKey(1), feat)
        logger.log("WARNING: no sigma checkpoint — random init (smoke mode)")

    bundle = ModelBundle(
        forward=lambda p, z, t: model.apply(p, z, t),
        encode=lambda p, z, t: model.apply(p, z, t, method=encode_method),
        sigma=lambda v, f: head.apply(v, f),
        learn_epsvar=learn_epsvar,
        forward_and_encode=lambda p, z, t: model.apply(
            p, z, t, method="forward_and_encode"),
    )
    return bundle, params, svars, ucfg


def make_fid_fn(args):
    extractor = None
    if args.inception_ckpt and os.path.exists(args.inception_ckpt):
        from ..eval.inception import make_inception_extractor
        extractor = make_inception_extractor(args.inception_ckpt)
    target = args.fid_target if args.fid_target and os.path.exists(args.fid_target) \
        else None
    if target is None:
        return None
    return FIDComputer(target=target, extractor=extractor)


def evaluate_unconstraint(args, sampler, run_fn, images_dir, data_shape, fid):
    n_batches = math.ceil(args.sample_size / args.batch_size)
    log_dict = {}
    return_lists = []
    res_pkl_path = os.path.join(args.test_dir, args.save_flag, "results_dump.pkl")
    # pipelined: dispatch batch i+1 before materializing/saving batch i, so
    # host-side PNG encoding overlaps device compute (jax dispatch is async)
    pending = None     # (index, device sample, logs)
    todo = [i for i in range(n_batches)
            if args.sample_overwrite
            or not batch_exists(images_dir, i, args.batch_size)]
    for skipped in sorted(set(range(n_batches)) - set(todo)):
        logger.log(f"skip batch {skipped}")
    for pos, i in enumerate(todo + [None]):
        if i is not None:
            seeds = jnp.arange(i * args.batch_size, (i + 1) * args.batch_size)
            xT = init_noise(sampler, seeds, data_shape,
                            bool(args.norm_init_noise))
            t1 = time.time()
            with logger.profile_kv("sample"):
                sample, logs = run_fn(xT, seeds)
            nxt = (i, sample, logs, t1)
        else:
            nxt = None
        if pending is None:
            pending = nxt
            continue
        i, sample, logs, t1 = pending
        pending = nxt
        sample.block_until_ready()
        logger.log(f"batch {i}/{n_batches} time: {time.time()-t1:.2f}s")
        save_batch(np.asarray(sample), images_dir, i)
        if args.return_log and logs:
            # per-step trajectory dump (reference image_sample.py:557-560:
            # z/eps/x0_prec/x0_postc/sigma lists -> joblib pkl)
            import joblib
            return_lists.append(
                {k: np.asarray(v) for k, v in logs.items()})
            joblib.dump(return_lists, res_pkl_path)
            logger.log("res pkl save done", i, res_pkl_path)
    if fid is not None:
        log_dict["fid"] = fid.fid_of_dir(images_dir)
        log_dict["fid_backend"] = fid.backend
        if not fid.is_inception:
            log_dict["fid_note"] = "fallback embedding (no inception ckpt) — relative only"
    return log_dict


def evaluate_constraint(args, config, sampler, make_run_fn, images_dir,
                        transform_dir, cf, fid):
    ds = get_eval_dataset(config.data.dataset, args.data_dir,
                          config.data.image_size,
                          category=getattr(config.data, "category", None))
    loader = batch_iterator(ds, args.batch_size, shuffle=True, seed=args.seed)
    mse_l, psnr_l, ssim_l, cf_l, cb_l, co_l = [], [], [], [], [], []
    n_batches = math.ceil(min(len(ds), args.sample_size) / args.batch_size)
    run_fn = make_run_fn(cf)   # jitted once; y is a traced argument
    def _finish(i, x01, batch_x, y, sample, t1):
        """Host-side post-processing for one completed batch (PNG writes +
        PSNR/SSIM/constraint metrics)."""
        sample.block_until_ready()
        logger.log(f"batch {i}/{n_batches} time: {time.time()-t1:.2f}s")
        sample01 = np.asarray(from_minus1_1(np.asarray(sample)))
        save_batch(np.asarray(sample), images_dir, i)
        mse = np.mean((sample01 - x01) ** 2, axis=(1, 2, 3))
        psnr = 10 * np.log10(1.0 / np.maximum(mse, 1e-12))
        ssim = [calculate_ssim(np.round(sample01[j] * 255).astype(np.uint8),
                               np.round(x01[j] * 255).astype(np.uint8),
                               crop_border=0) for j in range(len(x01))]
        x_hat = jnp.asarray(2 * sample01 - 1.0)
        cfv, cbv = cf.loss(x_hat, y)
        co = np.abs(np.asarray(x_hat) - np.asarray(batch_x)).reshape(len(x01), -1).sum(1)
        mse_l.extend(mse.tolist()); psnr_l.extend(psnr.tolist())
        ssim_l.extend(ssim)
        cf_l.extend(np.asarray(cfv).tolist()); cb_l.extend(np.asarray(cbv).tolist())
        co_l.extend(co.tolist())
        logger.log(f"done {i}/{n_batches} psnr={np.mean(psnr_l):.3f} "
                   f"ssim={np.mean(ssim_l):.4f} const={np.mean(cf_l):.3f}")

    # pipelined like evaluate_unconstraint: the next batch is dispatched
    # before the current one's host metrics/PNG writes run
    pending = None
    for i, (x01, _) in enumerate(loader):
        if i * args.batch_size >= args.sample_size:
            break
        batch_x = jnp.asarray(2 * x01 - 1.0)
        if batch_exists(images_dir, i, len(x01)) and not args.sample_overwrite:
            logger.log(f"skip batch {i}")
            continue
        y = cf.transform(batch_x)
        apy = cf.inv_transform(y)
        if transform_dir:
            for j in range(len(x01)):
                save_image(np.asarray(from_minus1_1(np.asarray(apy[j]))),
                           os.path.join(transform_dir, f"Apy_00-{i:05}-{j:03}.png"))
                save_image(x01[j],
                           os.path.join(transform_dir, f"orig_00-{i:05}-{j:03}.png"))
        seeds = jnp.arange(i * args.batch_size, i * args.batch_size + len(x01))
        if args.prior_xt:
            noise = jax.random.normal(jax.random.PRNGKey(int(seeds[0])), apy.shape)
            xT = apy + sampler.sampling_sigmas[0] * noise
        else:
            xT = init_noise(sampler, seeds, batch_x.shape[1:],
                            bool(args.norm_init_noise))
        t1 = time.time()
        sample, _ = run_fn(xT, seeds, y)
        if pending is not None:
            _finish(*pending)
        pending = (i, x01, batch_x, y, sample, t1)
    if pending is not None:
        _finish(*pending)
    log_dict = {"mse": float(np.mean(mse_l)), "psner": float(np.mean(psnr_l)),
                "ssim": float(np.mean(ssim_l)),
                "const_f_loss": float(np.mean(cf_l)),
                "const_b_loss": float(np.mean(cb_l)),
                "const_orig_loss": float(np.mean(co_l))}
    if fid is not None:
        log_dict["fid"] = fid.fid_of_dir(images_dir)
        log_dict["fid_backend"] = fid.backend
    log_dict["full_log"] = {"psnr": psnr_l, "mse": mse_l, "ssim": ssim_l,
                            "const_forward": cf_l, "const_backward": cb_l,
                            "const_orig_loss": co_l}
    return log_dict


def main(args, config):
    logger.configure(dir="./logs/")
    # run-dir allocation with auto-increment (reference :725-731)
    if args.save_folder is not None:
        args.test_dir = args.save_folder
        os.makedirs(args.test_dir, exist_ok=True)
    else:
        root = os.path.join(args.test_dir, args.config, args.constraint)
        i = 0
        while os.path.exists(os.path.join(root, str(i))):
            i += 1
        args.test_dir = os.path.join(root, str(i))
        os.makedirs(args.test_dir, exist_ok=True)
    dump_args(args, os.path.join(args.test_dir, "args.json"))
    logger.log("args:", vars(args))

    bundle, params, svars, ucfg = build_models_and_params(args, config)

    # data-parallel sampling over all local devices that divide the batch
    # (a no-op on one chip; per-sample RNG keeps images bit-identical
    # regardless of sharding)
    from ..parallel.mesh import make_data_mesh, replicate, shard_batch
    mesh = make_data_mesh(args.batch_size)
    n_dp = int(np.prod(mesh.devices.shape))
    if n_dp > 1:
        logger.log(f"data-parallel sampling over {n_dp} devices")
        params = replicate(mesh, params)
        svars = replicate(mesh, svars)

    def _shard(*arrays):
        return shard_batch(mesh, arrays) if n_dp > 1 else arrays

    dcfg_diff = config.diffusion
    sampler = get_sampler(
        args.sampler, dcfg_diff.num_diffusion_timesteps, args.num_timesteps,
        beta_start=dcfg_diff.get("beta_start", 1e-4),
        beta_end=dcfg_diff.get("beta_end", 0.02),
        beta_schedule=dcfg_diff.beta_schedule, sigma_style=args.sigma_style,
        set_alpha_to_one=bool(args.final_alpha_one), start_sigma=args.start_sigma,
        end_sigma=args.end_sigma, sampler_var=args.sampler_var,
        continuous_t=bool(args.continuous_t), linear_scale=args.linear_scale,
        eta=args.eta, norm_eps=bool(args.norm_eps), start_t=args.start_t,
        end_t=args.end_t)
    if args.redesign_sigma and args.max_T > args.num_timesteps:
        logger.log("redesign sigma", args.num_timesteps, args.max_T)
        sampler = redesign_sigma_tail(sampler, args.max_T, args.num_timesteps,
                                      args.min_sigma, args.max_sigma,
                                      args.sigma_gamma, args.cycle_size)

    res = config.data.image_size
    data_shape = (res, res, 3)
    nmin, nmax = set_norm_maxmin(data_shape, args.norm_min, args.norm_max)
    dn_cfg = DenoiseConfig(
        style=args.sigma_type, norm_eps=bool(args.norm_eps),
        refine_prior_sigma=bool(args.refine_sigma),
        sigma_pred_threshold=args.sigma_pred_threshold, new_eta=args.new_eta,
        clip_fn=args.clip_fn, norm_max=nmax, norm_min=nmin,
        time_shift=args.time_shift, return_log=bool(args.return_log),
        sigma_estimate_rate=tuple(args.sigma_estimate_rate),
        recal_sigma_prev=bool(args.recal_sigma_prev), max_T=args.max_T)

    from ..engine.loops import denoise_loop, projection_loop
    loop = projection_loop if args.sampling == "project" else denoise_loop

    def make_run_fn(cf=None):
        """Unconstrained: fn(xT, seeds). Constrained: fn(xT, seeds, y) with y
        traced, so one compile serves every batch."""
        if args.parallel_window > 0 and (cf is not None
                                         or args.sampling == "project"):
            # never silently substitute a different sampler for constrained
            # or projection runs — the flag only covers the plain ODE
            raise SystemExit("--parallel_window supports unconstrained "
                             "--sampling denoise only")
        if cf is None and args.parallel_window > 0:
            from ..engine.parallel_sampler import build_picard_sampler
            n_steps = len(np.asarray(sampler.timesteps)) - 1
            if n_steps % args.parallel_window != 0:
                raise SystemExit(f"--parallel_window must divide the "
                                 f"{n_steps}-step grid")
            if args.eta != 0 or args.sigma_type != "base":
                logger.log("WARNING: parallel sampling integrates the "
                           "deterministic base ODE; eta/sigma_type ignored")
            iters = args.picard_iters or max(1, args.parallel_window // 2)
            run_p = build_picard_sampler(sampler, bundle.forward,
                                         window=args.parallel_window,
                                         iters=iters,
                                         learn_epsvar=bundle.learn_epsvar)
            return lambda xT, seeds: (run_p(params, _shard(xT)[0]), {})
        if cf is None:
            jitted = jax.jit(lambda p, sv, xT, seeds: loop(
                sampler, bundle, dn_cfg, p, sv, xT, seeds))
            return lambda xT, seeds: jitted(params, svars, *_shard(xT, seeds))

        def run(p, sv, xT, seeds, y):
            cfn = cf.make_constrain_fn(y, lam=cf.lr)
            closs = lambda x0: cf.loss(x0, y)[0]
            return loop(sampler, bundle, dn_cfg, p, sv, xT, seeds,
                        constrain_fn=cfn, constrain_loss=closs)

        jitted = jax.jit(run)
        return lambda xT, seeds, y: jitted(params, svars,
                                           *_shard(xT, seeds, y))

    fid = make_fid_fn(args)
    images_dir = os.path.join(args.test_dir, args.save_flag, "images")
    os.makedirs(images_dir, exist_ok=True)

    if args.constraint == "none":
        log_dict = evaluate_unconstraint(args, sampler, make_run_fn(), images_dir,
                                         data_shape, fid)
    else:
        mask = None
        mask_path = os.path.join(args.mask_dir,
                                 "mask_half.npy" if args.constraint == "inpainting_half"
                                 else "mask.npy")
        if os.path.exists(mask_path):
            mask = np.load(mask_path)
        constraint_name = ("inpainting_ddnm"
                           if args.constraint == "inpainting" and mask is not None
                           else "inpainting_random"
                           if args.constraint.startswith("inpainting") and mask is None
                           else args.constraint)
        cf = get_constraint_function(
            constraint_name, args.constraint_proj, image_size=res, channels=3,
            fn_scale=args.constraint_scale, lr=args.constraint_lr,
            n_gd_iter=args.constraint_iter, gd_loss=args.constraint_loss,
            mask=mask, seed=args.seed)
        cf.lr = 1.0 if args.constraint_proj in ("simple", "svd") else args.constraint_lr
        transform_dir = os.path.join(args.test_dir, args.save_flag, "transform")
        os.makedirs(transform_dir, exist_ok=True)
        log_dict = evaluate_constraint(args, config, sampler, make_run_fn,
                                       images_dir, transform_dir, cf, fid)

    with open(os.path.join(args.test_dir, args.save_flag, "results.json"), "w") as f:
        json.dump(log_dict, f)
    slim = {k: v for k, v in log_dict.items() if k != "full_log"}
    logger.log(slim)
    logger.log("evaluate done")
    return log_dict


if __name__ == "__main__":
    a, c = get_args()
    main(a, c)
