"""Restoration-CNN training CLI (BasicSR parity).

Options-driven like the reference (basicsr/train.py:28-73 parse_options +
main loop :146 ff): a YAML file with network_g / datasets / train / val / path
sections drives dynamic arch instantiation, the training loop, periodic
validation with PSNR/SSIM, and checkpointing. --launcher is accepted for flag
parity (jax-native DP replaces pytorch/slurm process groups).

Usage: python -m nlc_tpu.cli.basicsr_train -opt options.yml
"""
from __future__ import annotations

import argparse
import os
import time

import numpy as np
import yaml

import jax
import jax.numpy as jnp

from ..restoration.data import PairedImageDataset, SyntheticPairedDataset, paired_loader
from ..restoration.model import RestorationModel
from ..restoration.prefetch import wrap_prefetch
from ..utils import logger


def parse_options(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("-opt", type=str, required=True, help="options YAML")
    p.add_argument("--launcher", type=str, default="none",
                   choices=["none", "pytorch", "slurm"])  # parity; jax-native DP
    p.add_argument("--local_rank", type=int, default=0)
    args = p.parse_args(argv)
    with open(args.opt) as f:
        opt = yaml.safe_load(f)
    opt["opt_path"] = args.opt
    return opt


def build_dataset(dopt: dict, phase: str):
    if dopt is None or dopt.get("type") == "synthetic" or \
            not os.path.isdir(dopt.get("dataroot_gt", "")):
        return SyntheticPairedDataset(size=dopt.get("gt_size", 32) if dopt else 32)
    if dopt.get("type") in ("video", "VideoTestDataset", "Vimeo90KDataset",
                            "REDSDataset"):
        from ..restoration.data import VideoClipDataset
        return VideoClipDataset(dopt["dataroot_gt"], dopt["dataroot_lq"],
                                num_frame=dopt.get("num_frame", 3),
                                padding=dopt.get("padding", "reflection"))
    if dopt.get("type") in ("stereo", "PairedStereoImageDataset"):
        from ..restoration.data import StereoPairedDataset
        return StereoPairedDataset(
            dopt["dataroot_gt"], dopt["dataroot_lq"],
            gt_size=dopt.get("gt_size", 64), scale=dopt.get("scale", 2),
            phase=phase, use_flip=dopt.get("use_flip", True),
            use_rot=dopt.get("use_rot", False))
    return PairedImageDataset(
        dataroot_gt=dopt["dataroot_gt"], dataroot_lq=dopt["dataroot_lq"],
        gt_size=dopt.get("gt_size", 256), scale=dopt.get("scale", 1),
        phase=phase, use_flip=dopt.get("use_flip", True),
        use_rot=dopt.get("use_rot", True))


def main(opt):
    logger.configure(dir="./logs/")
    exp_root = opt.get("path", {}).get("experiments_root",
                                       os.path.join("experiments",
                                                    opt.get("name", "run")))
    os.makedirs(exp_root, exist_ok=True)
    # reference train.py:init_tb_loggers — wandb (if configured) must start
    # before tb so sync_tensorboard catches the event dir
    if (opt.get("logger", {}).get("wandb") or {}).get("project") is not None:
        from ..utils.logger import init_wandb_logger
        init_wandb_logger(opt)

    model = RestorationModel(opt)
    dtrain = opt.get("datasets", {}).get("train")
    dval = opt.get("datasets", {}).get("val")
    train_ds = build_dataset(dtrain, "train")
    val_ds = build_dataset(dval, "val") if dval is not None else None

    batch = (dtrain or {}).get("batch_size_per_gpu", 8)
    enlarge = (dtrain or {}).get("dataset_enlarge_ratio", 1)
    # uint8 native batches: 4x smaller host->device transfers, normalized
    # inside the jitted step (measured input-wait fix, logs/r3)
    # seed from manual_seed so augmentation draws (crop/flip) follow the
    # config seed on the native path too, like the reference's seeded workers
    train_iter = paired_loader(train_ds, batch, enlarge_ratio=enlarge,
                               infinite=True, native_dtype="uint8",
                               seed=opt.get("manual_seed", 0))
    # prefetch_mode: ~|cpu|cuda — reference prefetch_dataloader.py parity;
    # 'cuda' maps to the device prefetcher (H2D overlapped with compute)
    train_iter, prefetcher = wrap_prefetch(train_iter, dtrain)

    lq0, _ = train_ds[0]
    state = model.init_state(jnp.zeros((1,) + lq0.shape))
    resume_path = opt.get("path", {}).get("resume_state")
    if resume_path and os.path.exists(resume_path):
        state = model.resume(resume_path, template=state)
        logger.log("resumed from", resume_path, "at step", int(state.step))

    total_iter = opt.get("train", {}).get("total_iter", 1000)
    val_freq = opt.get("val", {}).get("val_freq", total_iter)
    save_freq = opt.get("logger", {}).get("save_checkpoint_freq", total_iter)
    print_freq = opt.get("logger", {}).get("print_freq", 100)

    key = jax.random.PRNGKey(opt.get("manual_seed", 0))
    t0 = time.time()
    input_wait = 0.0  # host time blocked waiting for the next batch
    # step is tracked on the HOST (one fetch at entry supports resume):
    # fetching state.step every iteration forces 2 device round-trips per
    # step, which on the tunneled backend serializes dispatch against the
    # ~28 ms round trip (same fix as train/edm_training.py). Between
    # print/val/save points, fence every 32 steps so the async dispatch
    # queue stays bounded.
    it = int(state.step)
    while it < total_iter:
        tw = time.perf_counter()
        lq, gt = next(train_iter)
        input_wait += time.perf_counter() - tw
        state, loss = model.train_step(state, jnp.asarray(lq), jnp.asarray(gt),
                                       jax.random.fold_in(key, it))
        it += 1
        if it % 32 == 0 and it % print_freq != 0:
            float(loss)
        if it % print_freq == 0:
            # the host-tracked counter assumes train_step advances state.step
            # by exactly 1; any conditional-step logic added later would
            # desync RNG fold_in and checkpoint names from the device step —
            # assert while the device is being synced anyway
            assert int(state.step) == it, (int(state.step), it)
            elapsed = time.time() - t0
            frac = input_wait / max(elapsed, 1e-9)
            logger.log(f"iter {it}/{total_iter} loss {float(loss):.5f} "
                       f"({elapsed:.1f}s, input_wait_frac {frac:.3f})")
            logger.logkv("input_wait_frac", frac)
        if val_ds is not None and it % val_freq == 0:
            metrics = model.validate(state.params,
                                     paired_loader(val_ds, 1, shuffle=False),
                                     max_batches=8, step=it)
            logger.log(f"validation @ {it}: {metrics}")
        if it % save_freq == 0 or it >= total_iter:
            assert int(state.step) == it, (int(state.step), it)
            model.save(state, exp_root)
            logger.log("saved checkpoint at", it)
    if val_ds is not None:
        metrics = model.validate(state.params,
                                 paired_loader(val_ds, 1, shuffle=False),
                                 max_batches=8, step=int(state.step))
        logger.log("final validation:", metrics)
        if model.best_tracker.best:
            logger.log("best metrics:", model.best_tracker.summary())
        return state, metrics
    return state, {}


if __name__ == "__main__":
    main(parse_options())
