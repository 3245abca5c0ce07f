"""LR schedules (reference basicsr/models/lr_scheduler.py): MultiStepRestartLR,
LinearLR, VibrateLR, CosineAnnealingRestartLR — as optax-compatible
step -> multiplier schedules (multiply by base lr at the optimizer)."""
from __future__ import annotations

import math
from typing import Sequence

import numpy as np


def multi_step_restart(milestones: Sequence[int], gamma: float = 0.1,
                       restarts: Sequence[int] = (0,),
                       restart_weights: Sequence[float] = (1,)):
    milestones = sorted(milestones)
    restarts = list(restarts)
    weights = list(restart_weights)

    def sched(step):
        w = 1.0
        for r, rw in zip(restarts, weights):
            if step >= r:
                w = rw
        last_restart = max([r for r in restarts if step >= r] + [0])
        n = sum(1 for m in milestones if last_restart + m <= step)
        return w * gamma ** n

    return sched


def linear_lr(total_iter: int):
    def sched(step):
        return max(1.0 - step / total_iter, 0.0)
    return sched


def vibrate_lr(total_iter: int):
    """BasicSR VibrateLR: decaying triangular oscillation."""
    def sched(step):
        frac = step / total_iter
        f = 0.1
        if frac < 3 / 8:
            f = 1 - frac * 8 / 3
        elif frac < 5 / 8:
            f = 0.2
        T = total_iter // 80
        if T <= 0:
            return f
        Th = T // 2
        t = step % T
        f2 = t / Th if t < Th else 2 - t / Th
        return max(f * f2, 0.1 * f)
    return sched


def cosine_annealing_restart(periods: Sequence[int],
                             restart_weights: Sequence[float] = (1,),
                             eta_min: float = 1e-7, base_lr: float = 1.0):
    cum = np.cumsum([0] + list(periods))

    def sched(step):
        idx = int(np.searchsorted(cum[1:], step, side="right"))
        idx = min(idx, len(periods) - 1)
        w = restart_weights[idx]
        t = step - cum[idx]
        T = periods[idx]
        return (eta_min + w * 0.5 * (base_lr - eta_min)
                * (1 + math.cos(math.pi * t / T))) / base_lr

    return sched


def build_scheduler(opt: dict):
    opt = dict(opt)
    name = opt.pop("type")
    if name == "MultiStepLR" or name == "MultiStepRestartLR":
        return multi_step_restart(**opt)
    if name == "LinearLR":
        return linear_lr(opt["total_iter"])
    if name == "VibrateLR":
        return vibrate_lr(opt["total_iter"])
    if name == "CosineAnnealingRestartLR":
        return cosine_annealing_restart(**opt)
    if name == "TrueCosineAnnealingLR":
        T = opt.get("T_max")
        return lambda step: 0.5 * (1 + math.cos(math.pi * min(step, T) / T))
    raise NotImplementedError(name)
