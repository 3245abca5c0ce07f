"""Restoration model wrapper: training step, EMA, tiled ('grids') inference,
validation with metrics — the counterpart of BasicSR's
ImageRestorationModel/BaseModel (reference basicsr/models/base_model.py:63-331,
image_restoration_model.py:109-381).

The torch version wires DDP + per-rank metric reduction; here the train step
jits over the data mesh, validation shards the set round-robin by process
(image_restoration_model.py:271-273) and reduces per-rank metric sums with a
cross-process all-gather (`_cross_process_sum`, the counterpart of its
torch.distributed.reduce at :364), so every process sees the global means.
Load-time key-diff reporting and best-metric tracking follow
base_model.py:227-289 and the val bookkeeping around
image_restoration_model.py:256-381.
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..eval import calculate_psnr, calculate_ssim
from ..io.checkpoints import save_pytree, load_pytree
from .archs import define_network
from .losses import build_loss
from .lr_schedulers import build_scheduler


@struct.dataclass
class RestorationTrainState:
    params: Any
    opt_state: Any
    ema_params: Any
    step: jnp.ndarray


def flatten_param_paths(tree) -> Dict[str, np.ndarray]:
    """Param pytree -> {dot.path: leaf} for state-dict-style key comparison."""
    flat = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        name = ".".join(str(getattr(k, "key", getattr(k, "idx", k)))
                        for k in path)
        flat[name] = leaf
    return flat


def _cross_process_sum(values: np.ndarray) -> np.ndarray:
    """Sum a small metric vector across processes (the counterpart of the
    reference's torch.distributed.reduce of stacked metric tensors,
    image_restoration_model.py:358-364 / base_model.py:331-349). Every
    process gets the global sum (all-reduce rather than reduce-to-rank-0:
    rank 0 is the only writer anyway, and symmetric results keep the JAX
    single-controller model simple)."""
    values = np.asarray(values, np.float64)
    if jax.process_count() == 1:
        return values
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(values),
                      np.float64).sum(axis=0)


class BestMetricTracker:
    """Track the best value per metric across validations
    (higher-is-better for psnr/ssim, lower for niqe/lpips/fid)."""

    LOWER_BETTER = ("niqe", "lpips", "fid", "loss", "mse")

    def __init__(self):
        self.best: Dict[str, float] = {}
        self.best_iter: Dict[str, int] = {}

    def update(self, metrics: Dict[str, float], step: int) -> Dict[str, bool]:
        improved = {}
        for name, value in metrics.items():
            lower = any(name.lower().startswith(p) for p in self.LOWER_BETTER)
            prev = self.best.get(name)
            is_best = (prev is None or
                       (value < prev if lower else value > prev))
            if is_best:
                self.best[name] = float(value)
                self.best_iter[name] = int(step)
            improved[name] = is_best
        return improved

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {k: {"value": self.best[k], "iter": self.best_iter[k]}
                for k in self.best}


class RestorationModel:
    def __init__(self, opt: dict):
        self.opt = opt
        self.net = define_network(opt["network_g"])
        train_opt = opt.get("train", {})
        self.mixup = bool(train_opt.get("mixup", False))
        self.loss_fn = build_loss(train_opt.get("pixel_opt",
                                                {"type": "PSNRLoss"}))
        self.base_lr = train_opt.get("optim_g", {}).get("lr", 1e-3)
        sched_opt = train_opt.get("scheduler")
        self.lr_sched = build_scheduler(sched_opt) if sched_opt else (lambda s: 1.0)
        self.ema_decay = float(train_opt.get("ema_decay", 0.0))
        betas = train_opt.get("optim_g", {}).get("betas", (0.9, 0.999))
        wd = train_opt.get("optim_g", {}).get("weight_decay", 0.0)
        self.tx = optax.adamw(learning_rate=1.0, b1=betas[0], b2=betas[1],
                              weight_decay=wd)
        # archs can declare frozen sub-trees (PANet's CLIP tower — the
        # reference sets requires_grad_(False) on it, PANet_arch.py:245)
        self.frozen_prefixes = tuple(getattr(self.net, "frozen_prefixes", ()))
        self.best_tracker = BestMetricTracker()
        self._jit_step = None
        self._jit_test = None

    def _mask_frozen(self, updates):
        if not self.frozen_prefixes:
            return updates

        def mask(path, u):
            keys = tuple(str(getattr(k, "key", k)) for k in path)
            if any(k.startswith(self.frozen_prefixes) for k in keys):
                return jnp.zeros_like(u)
            return u
        return jax.tree_util.tree_map_with_path(mask, updates)

    # ---- init / state ----
    def init_state(self, sample_lq: jnp.ndarray, seed: int = 0
                   ) -> RestorationTrainState:
        params = self.net.init(jax.random.PRNGKey(seed), sample_lq)
        return RestorationTrainState(
            params=params, opt_state=self.tx.init(params["params"]),
            ema_params=jax.tree_util.tree_map(jnp.copy, params), step=jnp.asarray(0))

    # ---- training ----
    def train_step(self, state: RestorationTrainState, lq, gt, key):
        if self._jit_step is None:
            def step_fn(state, lq, gt, key, lr_mult):
                # uint8 batches normalize on-device: the host ships 4x
                # fewer bytes and the /255 fuses into the first conv
                # (round-3 input-wait measurement, logs/r3/input_wait2.log)
                if lq.dtype == jnp.uint8:
                    lq = lq.astype(jnp.float32) / 255.0
                if gt.dtype == jnp.uint8:
                    gt = gt.astype(jnp.float32) / 255.0
                if self.mixup:
                    lam = jax.random.beta(key, 1.2, 1.2)
                    perm = jax.random.permutation(jax.random.fold_in(key, 1),
                                                  lq.shape[0])
                    lq = lam * lq + (1 - lam) * lq[perm]
                    gt = lam * gt + (1 - lam) * gt[perm]

                def loss_of(p):
                    pred = self.net.apply({"params": p}, lq, deterministic=False)
                    return self.loss_fn(pred, gt)

                loss, grads = jax.value_and_grad(loss_of)(state.params["params"])
                updates, opt_state = self.tx.update(grads, state.opt_state,
                                                    state.params["params"])
                updates = jax.tree_util.tree_map(
                    lambda u: u * lr_mult * self.base_lr, updates)
                updates = self._mask_frozen(updates)
                new_p = optax.apply_updates(state.params["params"], updates)
                params = {**state.params, "params": new_p}
                if self.ema_decay > 0:
                    ema = jax.tree_util.tree_map(
                        lambda e, p: e * self.ema_decay + p * (1 - self.ema_decay),
                        state.ema_params, params)
                else:
                    ema = params
                return RestorationTrainState(params=params, opt_state=opt_state,
                                             ema_params=ema,
                                             step=state.step + 1), loss

            self._jit_step = jax.jit(step_fn, donate_argnums=(0,))
        lr_mult = self.lr_sched(int(state.step))
        return self._jit_step(state, lq, gt, key, jnp.asarray(lr_mult))

    # ---- inference ----
    def test(self, params, lq: jnp.ndarray) -> jnp.ndarray:
        if self._jit_test is None:
            self._jit_test = jax.jit(
                lambda p, x: self.net.apply(p, x, deterministic=True))
        return self._jit_test(params, lq)

    def test_grids(self, params, lq: jnp.ndarray, crop_size: int,
                   overlap: float = 0.5) -> jnp.ndarray:
        """Tiled inference with overlapping crops + count-averaged stitching
        (reference image_restoration_model.py grids/grids_inverse :109-188)."""
        b, h, w, c = lq.shape
        step = max(int(crop_size * (1 - overlap)), 1)
        out = np.zeros((b, h, w, c), np.float32)
        cnt = np.zeros((1, h, w, 1), np.float32)
        ys = sorted({min(y, h - crop_size) for y in range(0, h, step)})
        xs = sorted({min(x, w - crop_size) for x in range(0, w, step)})
        for y in ys:
            for x in xs:
                patch = lq[:, y:y + crop_size, x:x + crop_size, :]
                pred = np.asarray(self.test(params, patch))
                out[:, y:y + crop_size, x:x + crop_size, :] += pred
                cnt[:, y:y + crop_size, x:x + crop_size, :] += 1
        return jnp.asarray(out / cnt)

    # ---- validation ----
    def validate(self, params, loader, use_grids: bool = False,
                 crop_size: int = 256, max_batches: Optional[int] = None,
                 step: Optional[int] = None) -> Dict[str, float]:
        """Distributed validation (image_restoration_model.py:256-381):
        batches are sharded round-robin across processes (idx % world == rank,
        reference :272-273), per-rank metric SUMS + count are reduced
        cross-process, and the global mean is returned on every process.
        When `step` is given, best-metric tracking updates too."""
        rank, world = jax.process_index(), jax.process_count()
        sums = np.zeros(3, np.float64)        # psnr_sum, ssim_sum, cnt
        for i, (lq, gt) in enumerate(loader):
            if max_batches is not None and i >= max_batches:
                break
            if i % world != rank:
                continue
            lq = jnp.asarray(lq)
            pred = (self.test_grids(params, lq, crop_size) if use_grids
                    else self.test(params, lq))
            pred01 = np.clip(np.asarray(pred), 0, 1)
            for j in range(len(gt)):
                a = (pred01[j] * 255).round().astype(np.uint8)
                bb = (np.asarray(gt[j]) * 255).round().astype(np.uint8)
                sums += (calculate_psnr(a, bb, crop_border=0),
                         calculate_ssim(a, bb, crop_border=0), 1.0)
        total = _cross_process_sum(sums)
        cnt = max(total[2], 1.0)
        metrics = {"psnr": float(total[0] / cnt), "ssim": float(total[1] / cnt)}
        if step is not None:
            improved = self.best_tracker.update(metrics, step)
            metrics["is_best"] = improved
            metrics["best"] = self.best_tracker.summary()
        return metrics

    def reduce_loss_dict(self, loss_dict: Dict[str, Any]) -> Dict[str, float]:
        """Average a loss dict across processes for logging
        (base_model.py:331-356 reduce_loss_dict)."""
        keys = sorted(loss_dict)
        vals = np.asarray([float(np.mean(np.asarray(loss_dict[k])))
                           for k in keys], np.float64)
        total = _cross_process_sum(vals)
        return {k: float(v / jax.process_count())
                for k, v in zip(keys, total)}

    # ---- checkpointing (save_network/resume parity, base_model.py:195-330) ----
    def save(self, state: RestorationTrainState, path: str, label: str = "net_g"):
        save_pytree({"params": state.params, "ema_params": state.ema_params,
                     "opt_state": state.opt_state,
                     "step": np.asarray(int(state.step))},
                    os.path.join(path, f"{label}_{int(state.step)}"))

    def resume(self, path: str,
               template: RestorationTrainState = None) -> RestorationTrainState:
        """Pass `template` (a live state from init_state) so the optax state
        restores into its typed NamedTuple containers — without a target,
        orbax returns raw nested dicts and the first tx.update crashes on
        `state.mu` (same fix as cli/edm_train.py --resume_state)."""
        target = None
        if template is not None:
            target = {"params": template.params,
                      "ema_params": template.ema_params,
                      "opt_state": template.opt_state,
                      "step": np.asarray(0)}
        data = load_pytree(path, target=target)
        return RestorationTrainState(
            params=data["params"], ema_params=data["ema_params"],
            opt_state=data["opt_state"], step=jnp.asarray(int(data["step"])))

    def load_network(self, current_params, path: str, strict: bool = True,
                     param_key: str = "params", log=None):
        """Load a checkpoint's param tree into `current_params` with the
        reference's key-diff report (base_model.py:227-289):

        * keys present on only one side are listed as warnings;
        * strict=True raises on any difference (load_state_dict strict);
        * strict=False loads the intersection, skipping shape mismatches
          (each skip logged), keeping current values elsewhere.

        Returns (params, report) where report = {missing, unexpected,
        size_mismatch} (sorted dot-path lists).
        """
        log = log or (lambda msg: print(msg, flush=True))
        data = load_pytree(path)
        loaded = data.get(param_key, data) if isinstance(data, dict) else data
        cur_flat = flatten_param_paths(current_params)
        new_flat = flatten_param_paths(loaded)
        missing = sorted(set(cur_flat) - set(new_flat))
        unexpected = sorted(set(new_flat) - set(cur_flat))
        if missing or unexpected:
            log("Current net - loaded net:")
            for k in missing:
                log(f"  {k}")
            log("Loaded net - current net:")
            for k in unexpected:
                log(f"  {k}")
        size_mismatch = []
        merged = dict(cur_flat)
        for k in set(cur_flat) & set(new_flat):
            if np.shape(cur_flat[k]) != np.shape(new_flat[k]):
                size_mismatch.append(k)
                log(f"Size different, ignore [{k}]: crt_net: "
                    f"{np.shape(cur_flat[k])}; load_net: {np.shape(new_flat[k])}")
            else:
                merged[k] = new_flat[k]
        size_mismatch.sort()
        report = {"missing": missing, "unexpected": unexpected,
                  "size_mismatch": size_mismatch}
        if strict and (missing or unexpected or size_mismatch):
            raise ValueError(f"checkpoint/network key mismatch: {report}")
        # rebuild the tree with loaded leaves in current structure
        leaves_by_path = merged
        def replace(path, leaf):
            name = ".".join(str(getattr(k, "key", getattr(k, "idx", k)))
                            for k in path)
            new = leaves_by_path[name]
            return jnp.asarray(new).astype(np.asarray(leaf).dtype) \
                if np.shape(new) == np.shape(leaf) else leaf
        params = jax.tree_util.tree_map_with_path(replace, current_params)
        return params, report
