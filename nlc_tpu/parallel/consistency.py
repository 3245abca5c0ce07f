"""Replica-consistency checking.

Parity with reference torch_utils/misc.py:180-194 (check_ddp_consistency):
verify replicated parameters really are identical on every device/host. With
jax sharding, per-device divergence cannot arise inside jit (SPMD), but
host-side state divergence (e.g. differently-seeded inits before replicate)
can — this check catches it.
"""
from __future__ import annotations

from typing import List

import numpy as np

import jax


def check_replica_consistency(tree, atol: float = 0.0) -> List[str]:
    """Return the list of leaf paths whose per-device shards differ.

    For replicated arrays compares every addressable shard against the first;
    multi-host runs additionally compare across processes via allgather on a
    content hash.
    """
    bad: List[str] = []
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in leaves:
        name = "/".join(str(p) for p in path)
        shards = getattr(leaf, "addressable_shards", None)
        if shards and len(shards) > 1:
            ref = np.asarray(shards[0].data)
            for s in shards[1:]:
                if not np.allclose(ref, np.asarray(s.data), atol=atol, rtol=0):
                    bad.append(name)
                    break
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        local_hash = np.asarray(
            [np.asarray(l).astype(np.float64).sum() for _, l in leaves])
        all_hashes = multihost_utils.process_allgather(local_hash)
        diff = np.abs(all_hashes - all_hashes[0]).max(axis=0)
        for i, (path, _) in enumerate(leaves):
            if diff[i] > atol:
                name = "/".join(str(p) for p in path)
                if name not in bad:
                    bad.append(name)
    return bad
