"""Restoration losses (reference basicsr/models/losses/losses.py):
L1, MSE, PSNRLoss (scaled negative PSNR)."""
from __future__ import annotations

import math

import jax.numpy as jnp


def L1Loss(pred, target, loss_weight: float = 1.0):
    return loss_weight * jnp.abs(pred - target).mean()


def MSELoss(pred, target, loss_weight: float = 1.0):
    return loss_weight * ((pred - target) ** 2).mean()


def PSNRLoss(pred, target, loss_weight: float = 1.0):
    """-PSNR/10 in natural-log form (BasicSR PSNRLoss: loss_weight * 0.5 *
    log(mse) scaled so minimizing maximizes PSNR)."""
    scale = 10 / math.log(10)
    mse = ((pred - target) ** 2).mean(axis=(1, 2, 3))
    return loss_weight * scale * jnp.log(mse + 1e-8).mean()


LOSSES = {"L1Loss": L1Loss, "MSELoss": MSELoss, "PSNRLoss": PSNRLoss}


def build_loss(opt: dict):
    opt = dict(opt)
    name = opt.pop("type")
    weight = opt.pop("loss_weight", 1.0)
    fn = LOSSES[name]
    return lambda p, t: fn(p, t, loss_weight=weight)
