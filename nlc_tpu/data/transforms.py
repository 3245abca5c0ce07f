"""Dataset-level tensor transforms.

Parity with reference datasets/utils + datasets/__init__.py:223-254
(data_transform / inverse_data_transform): uniform/gaussian dequantization,
[0,1] -> [-1,1] rescaling, logit transform with lambda, and their inverses.
Operates on NHWC float arrays in [0,1].
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class DataTransformConfig:
    uniform_dequantization: bool = False
    gaussian_dequantization: bool = False
    rescaled: bool = True            # X -> 2X - 1
    logit_transform: bool = False
    lambda_logit: float = 1e-6


def data_transform(x: jnp.ndarray, cfg: DataTransformConfig,
                   key=None) -> jnp.ndarray:
    if cfg.uniform_dequantization:
        assert key is not None
        x = (x * 255.0 + jax.random.uniform(key, x.shape)) / 256.0
    if cfg.gaussian_dequantization:
        assert key is not None
        x = x + jax.random.normal(key, x.shape) * 0.01
    if cfg.logit_transform:
        lam = cfg.lambda_logit
        x = lam + (1 - 2 * lam) * x
        return jnp.log(x) - jnp.log1p(-x)
    if cfg.rescaled:
        return 2 * x - 1.0
    return x


def inverse_data_transform(x: jnp.ndarray, cfg: DataTransformConfig) -> jnp.ndarray:
    if cfg.logit_transform:
        x = jax.nn.sigmoid(x)
        lam = cfg.lambda_logit
        x = (x - lam) / (1 - 2 * lam)
    elif cfg.rescaled:
        x = (x + 1.0) / 2.0
    return jnp.clip(x, 0.0, 1.0)
