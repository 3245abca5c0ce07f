"""Tensor-parallel param sharding for the UNet families (beyond parity).

The reference is data-parallel only (SURVEY.md §2.4); this module adds an
optional 'model' mesh axis so the 552M-param ADM-256 UNet (and larger) can
shard its weight matrices across chips. The design is GSPMD-first: we only
annotate PARAMETER shardings — conv kernels and dense matrices shard their
output-feature dimension over the model axis — and let XLA propagate
activation shardings and insert the all-gathers/reduce-scatters over ICI.
No per-layer communication code exists, matching how jax.sharding is meant
to be used.

Rules (channels-last layouts everywhere in this framework):
  * conv kernels (H, W, Cin, Cout): shard Cout when divisible;
  * dense kernels (Cin, Cout): shard Cout when divisible;
  * biases / norm scales (Cout,): shard when divisible (they follow the
    output-feature dim of their producer);
  * anything smaller than min_size stays replicated — tiny tensors cost
    more to reshard than to copy.

Zero-init output convs, time-embedding MLPs, and sigma heads all fall out
of the same rules. Use with a 2-D mesh: Mesh(devices.reshape(d, m),
('data', 'model')); batch stays sharded over 'data' via data_sharding.
"""
from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def tp_param_sharding(params: Any, mesh: Mesh, axis: str = "model",
                      min_size: int = 2 ** 15) -> Any:
    """Pytree of NamedShardings mirroring `params` (see module doc)."""
    tp = mesh.shape[axis]

    def rule(x) -> NamedSharding:
        shape = np.shape(x)
        if tp > 1 and len(shape) >= 1 and np.prod(shape) >= min_size \
                and shape[-1] % tp == 0:
            return NamedSharding(
                mesh, P(*([None] * (len(shape) - 1)), axis))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(rule, params)


def apply_tp_sharding(params: Any, mesh: Mesh, axis: str = "model",
                      min_size: int = 2 ** 15) -> Any:
    """device_put `params` with tensor-parallel shardings."""
    sh = tp_param_sharding(params, mesh, axis=axis, min_size=min_size)
    return jax.tree_util.tree_map(jax.device_put, params, sh)


def tp_sharding_summary(params: Any, mesh: Mesh, axis: str = "model",
                        min_size: int = 2 ** 15) -> dict:
    """How much of the param bytes actually shard — for logging/tests."""
    sh = tp_param_sharding(params, mesh, axis=axis, min_size=min_size)
    total = 0
    sharded = 0
    for x, s in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(
                        sh, is_leaf=lambda v: isinstance(v, NamedSharding))):
        n = int(np.prod(np.shape(x)))
        total += n
        if s.spec and s.spec[-1] == axis:
            sharded += n
    return {"total_params": total, "sharded_params": sharded,
            "sharded_fraction": sharded / max(total, 1)}


def fsdp_param_sharding(params: Any, mesh: Mesh, axis: str = "data",
                        min_size: int = 2 ** 15) -> Any:
    """FSDP/ZeRO-style sharding: same output-feature rules, but over the DATA
    axis of a 1-D mesh. Each chip holds 1/N of every large tensor; XLA
    all-gathers weights where used and reduce-scatters gradients — the GSPMD
    formulation of fully-sharded data parallel. Combine with data_sharding on
    the batch."""
    return tp_param_sharding(params, mesh, axis=axis, min_size=min_size)


def apply_fsdp_sharding(params: Any, mesh: Mesh, axis: str = "data",
                        min_size: int = 2 ** 15) -> Any:
    sh = fsdp_param_sharding(params, mesh, axis=axis, min_size=min_size)
    return jax.tree_util.tree_map(jax.device_put, params, sh)
