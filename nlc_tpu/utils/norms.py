"""Vector-norm helpers shared by samplers and the sigma-head training loss.

Behavior parity: reference `src/utils.py` / `src/schedulers.py:7-12` (normalize
to the sqrt(dim) sphere) and `vector_norm` (per-sample flattened L2 norm).
"""
from __future__ import annotations

import math

import jax.numpy as jnp


def vector_norm(x: jnp.ndarray, keepdims: bool = False) -> jnp.ndarray:
    """Per-sample L2 norm over all non-batch axes.

    Returns shape (B,) or, with keepdims, (B, 1, ..., 1) matching x's rank.
    """
    b = x.shape[0]
    flat = x.reshape(b, -1)
    n = jnp.linalg.norm(flat, axis=1)
    if keepdims:
        n = n.reshape((b,) + (1,) * (x.ndim - 1))
    return n


def normalize(x: jnp.ndarray, inp_dim: int | None = None, eps: float = 1e-12) -> jnp.ndarray:
    """Rescale each sample onto the sqrt(dim) sphere (reference schedulers.py:7)."""
    if inp_dim is None:
        inp_dim = int(x[0].size)
    denom = jnp.clip(vector_norm(x, keepdims=True), min=eps)
    return math.sqrt(inp_dim) * x / denom


def cosine_similarity(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Per-sample cosine similarity over flattened non-batch axes -> (B,)."""
    bsz = a.shape[0]
    af = a.reshape(bsz, -1)
    bf = b.reshape(bsz, -1)
    na = jnp.clip(jnp.linalg.norm(af, axis=1), min=eps)
    nb = jnp.clip(jnp.linalg.norm(bf, axis=1), min=eps)
    return jnp.sum(af * bf, axis=1) / (na * nb)


def cosine_distance(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return 1.0 - cosine_similarity(a, b)
