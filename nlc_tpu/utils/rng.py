"""Deterministic per-sample RNG streams.

The reference's `StackedRandomGenerator` (src/experiments.py:71-85) seeds one
torch Generator per sample so that image i is bit-identical regardless of how
samples are batched. JAX's counter-based PRNG makes this free: fold the sample
seed into a key, then fold in a draw counter. Unlike torch generators this is
also order-independent and shard-friendly — each device computes its own
samples' noise with no host state.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


class SampleRNG:
    """Per-sample deterministic noise streams.

    seeds: int array (B,) — typically the global sample indices.
    Each call-site passes a distinct `stream` counter (like the reference's
    sequential generator draws) so repeated draws differ.
    """

    def __init__(self, seeds: jnp.ndarray | Sequence[int]):
        self.seeds = jnp.asarray(seeds, dtype=jnp.uint32)

    def _keys(self, stream: int) -> jnp.ndarray:
        def mk(seed):
            return jax.random.fold_in(jax.random.PRNGKey(0), seed)

        keys = jax.vmap(mk)(self.seeds)
        return jax.vmap(lambda k: jax.random.fold_in(k, stream))(keys)

    def randn(self, shape: Tuple[int, ...], stream: int = 0, dtype=jnp.float32) -> jnp.ndarray:
        """Standard normal of shape (B, *sample_shape); shape[0] must equal len(seeds)."""
        assert shape[0] == self.seeds.shape[0], (shape, self.seeds.shape)
        keys = self._keys(stream)
        return jax.vmap(lambda k: jax.random.normal(k, shape[1:], dtype))(keys)

    def randint(self, lo: int, hi: int, shape: Tuple[int, ...], stream: int = 0) -> jnp.ndarray:
        assert shape[0] == self.seeds.shape[0]
        keys = self._keys(stream)
        return jax.vmap(lambda k: jax.random.randint(k, shape[1:], lo, hi))(keys)


def step_noise(key: jax.Array, step: jax.Array, shape, dtype=jnp.float32) -> jnp.ndarray:
    """Noise for sampler step `step` — used inside lax.scan bodies."""
    return jax.random.normal(jax.random.fold_in(key, step), shape, dtype)


def per_sample_step_noise(seeds: jnp.ndarray, step: jax.Array, sample_shape, stream: int = 0,
                          dtype=jnp.float32) -> jnp.ndarray:
    """Per-sample noise that folds in both the sample seed and the step index.

    Deterministic per (seed, step, stream) — the scan-compatible version of
    SampleRNG.randn. Traced `step` is fine: fold_in accepts tracers.
    """
    def mk(seed):
        k = jax.random.fold_in(jax.random.PRNGKey(0), seed)
        k = jax.random.fold_in(k, stream)
        k = jax.random.fold_in(k, step)
        return jax.random.normal(k, sample_shape, dtype)

    return jax.vmap(mk)(jnp.asarray(seeds, dtype=jnp.uint32))
