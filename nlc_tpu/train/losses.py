"""Training losses for the sigma head (reference src/experiments.py:23-40 +
src/utils.py normalized variants)."""
from __future__ import annotations

import jax.numpy as jnp

from ..utils.norms import normalize, cosine_distance


def _mse(a, b):
    return jnp.mean((a - b) ** 2)


def _mae(a, b):
    return jnp.mean(jnp.abs(a - b))


def _huber(a, b, delta: float = 1.0):
    d = jnp.abs(a - b)
    return jnp.mean(jnp.where(d < delta, 0.5 * d ** 2 / delta, d - 0.5 * delta))


def _norm_mse(a, b):
    return _mse(normalize(a), normalize(b))


def _norm_huber(a, b):
    return _huber(normalize(a), normalize(b))


def _mse_norm_mse(a, b):
    return 0.5 * (_norm_mse(a, b) + _mse(a, b))


def _cosine(a, b):
    return jnp.mean(cosine_distance(a, b))


_LOSSES = {
    "mse": _mse, "l2": _mse,
    "mae": _mae, "l1": _mae,
    "huber": _huber,
    "cosine": _cosine,
    "norm_mse": _norm_mse,
    "norm_huber": _norm_huber,
    "mse_norm_mse": _mse_norm_mse,
}


def get_loss(name: str, reduction: str = "mean"):
    """reduction='none' returns elementwise values for weighted losses
    (the EDM trainer's loss_weighted path, reference experiments.py:1017-1021)."""
    if name not in _LOSSES:
        raise NotImplementedError(f"unknown loss {name!r}")
    if reduction == "none" and name in ("mse", "l2"):
        return lambda a, b: (a - b) ** 2
    if reduction == "none" and name in ("mae", "l1"):
        return lambda a, b: jnp.abs(a - b)
    if reduction == "none" and name == "huber":
        return lambda a, b: jnp.where(jnp.abs(a - b) < 1.0,
                                      0.5 * (a - b) ** 2, jnp.abs(a - b) - 0.5)
    return _LOSSES[name]
