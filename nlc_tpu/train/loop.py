"""Full sigma-head training loop: epochs, periodic FID eval, checkpointing.

Parity with reference ImageExperiment.train (src/experiments.py:632-753) and
EDMImageExperiment.train_edm (:963-1082): per-iter jitted step, per-epoch
loss logs, eval epochs sampling with both 'base' and 'pred' styles + FID,
per-epoch checkpoints, and the train_logs.tsv summary. Data-parallel over the
mesh; host 0 does IO.
"""
from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Callable, Iterator, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..engine import DenoiseConfig, ModelBundle, denoise_loop, init_noise
from ..engine.edm import EDMSamplerConfig
from ..eval.fid import FIDComputer
from ..io.checkpoints import save_sigma_checkpoint
from ..parallel.mesh import is_primary
from ..utils import logger
from ..utils.image_io import save_batch
from .sigma_trainer import SigmaTrainState


@dataclass
class TrainLoopConfig:
    epochs: int = 101
    iter_per_epoch: int = 1000
    eval_per_epoch: int = 100
    save_per_epoch: int = 100
    eval_sample_size: int = 512
    eval_batch_size: int = 64
    save_dir: str = "./run"


def run_sigma_training(state: SigmaTrainState, train_step: Callable,
                       frozen_params, data_iter: Iterator, cfg: TrainLoopConfig,
                       eval_fn: Optional[Callable] = None,
                       key=None) -> SigmaTrainState:
    """eval_fn(state, epoch) -> dict of metrics (called on eval epochs)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    os.makedirs(cfg.save_dir, exist_ok=True)
    logs = {"epoch": [], "loss": [], "fid": [], "fid_sigma_ped": []}
    losses = []
    jitted = jax.jit(train_step, donate_argnums=(0,))
    for ep in range(cfg.epochs):
        ep_losses = []
        t0 = time.time()
        for i in range(cfg.iter_per_epoch):
            batch_x, _ = next(data_iter)
            state, metrics = jitted(state, frozen_params, jnp.asarray(batch_x), key)
            if i % 100 == 0:
                loss = float(metrics["loss"])
                ep_losses.append(loss)
                logger.logkv_mean("loss", loss)
                logger.log(f"epoch={ep} iter={i} loss={loss:.5f}")
        losses += ep_losses
        logger.logkv("epoch", ep)
        logger.logkv("sec_per_epoch", time.time() - t0)
        logger.dumpkvs()

        # periodicity matches the reference exactly (experiments.py:703,721:
        # `ep % period == 0 or ep == epochs-1`, so period fires at ep 0 too);
        # period <= 0 is an extension the reference never passes: eval fully
        # off / save final-epoch-only (needed by resumable chunked drivers,
        # where an ep-0 periodic save would clobber the previous chunk's
        # fixed-name optim_state mid-chunk)
        if eval_fn is not None and cfg.eval_per_epoch > 0 and (
                ep % cfg.eval_per_epoch == 0 or ep == cfg.epochs - 1):
            ev = eval_fn(state, ep)
            logs["epoch"].append(ep)
            logs["loss"].append(float(np.mean(ep_losses)) if ep_losses else 0.0)
            logs["fid"].append(ev.get("fid", 0.0))
            logs["fid_sigma_ped"].append(ev.get("fid_pred", 0.0))
            logger.log(f"--- epoch {ep}: {ev}")
        if (cfg.save_per_epoch > 0 and ep % cfg.save_per_epoch == 0) \
                or ep == cfg.epochs - 1:
            save_sigma_checkpoint(cfg.save_dir, ep, state)
            logger.log(f"saved checkpoint at epoch {ep}")

    if is_primary() and logs["epoch"]:
        import csv
        with open(os.path.join(cfg.save_dir, "train_logs.tsv"), "w") as f:
            w = csv.writer(f, delimiter="\t")
            w.writerow(["epoch", "loss", "fid", "fid_sigma_ped"])
            for row in zip(logs["epoch"], logs["loss"], logs["fid"],
                           logs["fid_sigma_ped"]):
                w.writerow(row)
        np.savetxt(os.path.join(cfg.save_dir, "train_losses.txt"),
                   np.asarray(losses))
        _plot_curves(cfg.save_dir, logs, losses)
    return state


def _plot_curves(save_dir: str, logs: dict, losses) -> None:
    """Loss/FID curve PNGs next to the TSV (reference experiments.py:725-753
    matplotlib dumps); skipped silently when matplotlib is unavailable."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return
    fig, ax = plt.subplots(1, 2, figsize=(10, 4))
    ax[0].plot(losses)
    ax[0].set_title("train loss")
    ax[0].set_xlabel("iter")
    ax[1].plot(logs["epoch"], logs["fid"], label="fid")
    ax[1].plot(logs["epoch"], logs["fid_sigma_ped"], label="fid_pred")
    ax[1].set_title("fid")
    ax[1].set_xlabel("epoch")
    ax[1].legend()
    fig.tight_layout()
    fig.savefig(os.path.join(save_dir, "train_curves.png"), dpi=100)
    plt.close(fig)


def make_denoise_eval_fn(sampler, bundle: ModelBundle, frozen_params,
                         data_shape, save_dir: str, fid: Optional[FIDComputer],
                         sample_size: int, batch_size: int, norm_max: float,
                         norm_min: float):
    """Evaluate with base and pred styles + FID (reference :703-719)."""
    base_cfg = DenoiseConfig(style="base")
    pred_cfg = DenoiseConfig(style="pred", norm_eps=True, norm_max=norm_max,
                             norm_min=norm_min)

    base_fn = jax.jit(lambda p, sv, xT, seeds: denoise_loop(
        sampler, bundle, base_cfg, p, sv, xT, seeds))
    pred_fn = jax.jit(lambda p, sv, xT, seeds: denoise_loop(
        sampler, bundle, pred_cfg, p, sv, xT, seeds))

    def eval_fn(state: SigmaTrainState, epoch: int) -> dict:
        out = {}
        for style, fn, params_key in [("base", base_fn, "params"),
                                      ("pred", pred_fn, "ema")]:
            svars = {"params": state.ema_params if params_key == "ema"
                     else state.params, "batch_stats": state.batch_stats}
            images_dir = os.path.join(save_dir, "images",
                                      f"{style}_samples_ep{epoch}")
            n_batches = max(sample_size // batch_size, 1)
            for i in range(n_batches):
                seeds = jnp.arange(i * batch_size, (i + 1) * batch_size)
                xT = init_noise(sampler, seeds, data_shape)
                sample, _ = fn(frozen_params, svars, xT, seeds)
                save_batch(np.asarray(sample), images_dir, i)
            if fid is not None:
                val = fid.fid_of_dir(images_dir)
                out["fid" if style == "base" else "fid_pred"] = val
                out["fid_backend"] = fid.backend
        return out

    return eval_fn
