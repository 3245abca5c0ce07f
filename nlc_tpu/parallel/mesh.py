"""Device mesh + sharding runtime — the TPU-native counterpart of the
reference's three distributed bootstraps (src/dist_util.py:21-45 MPI/NCCL,
torch_utils/distributed.py:14-32 torchrun env, basicsr/utils/dist_util.py:17-64
pytorch/slurm launchers).

On TPU there is no backend plumbing to write: `jax.distributed.initialize()`
wires up multi-host, `Mesh` + `NamedSharding` declare the layout, and XLA emits
ICI/DCN collectives. The reference's collective surface maps as:

    sync_params broadcast          -> replicated NamedSharding (params)
    DDP gradient all-reduce        -> jax.lax.pmean inside jit / sharded grads
    dist.barrier()                 -> implicit in collective compilation
    rank-sharded dataset           -> host_local_batch / process_index slicing
    rank-0 checkpoint + barrier    -> is_primary() guard around host I/O
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator: Optional[str] = None, num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host bootstrap. No-op for single-process runs.

    Counterpart of dist_util.setup_dist (reference src/dist_util.py:21-45):
    instead of MPI-broadcasting a rendezvous address into env vars and creating
    an NCCL process group, JAX discovers peers from the TPU runtime (or the
    explicit coordinator address) once per process.
    """
    if coordinator is None and not os.environ.get("JAX_COORDINATOR_ADDRESS"):
        return
    # NOTE: do not probe jax.process_count() here — it initializes the local
    # backend, after which distributed.initialize refuses to run.
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:  # already wired up by the runtime / earlier call
        # jax 0.9's double-init messages: "distributed.initialize should
        # only be called once." and "jax.distributed.initialize() must be
        # called before any JAX computations are executed." — neither
        # contains "already" (older releases' wording did)
        msg = str(e).lower()
        if not any(s in msg for s in ("already", "only be called once",
                                      "before any jax")):
            raise
        # The message text alone can't distinguish "already initialized"
        # from "local backend was touched before init" (ADVICE r2); verify
        # the cluster actually has the requested size rather than silently
        # degrading a misconfigured multi-process run to single-process.
        if num_processes is not None and jax.process_count() != num_processes:
            raise RuntimeError(
                f"init_distributed({num_processes} processes) swallowed "
                f"'{e}', but jax.process_count()={jax.process_count()} — "
                "the local backend was initialized before "
                "jax.distributed.initialize could run (import order bug), "
                "so this process would execute desynced") from e


def make_mesh(axes: Sequence[str] = ("data",), shape: Optional[Sequence[int]] = None,
              devices=None) -> Mesh:
    """Build a device mesh. Default: 1-D 'data' mesh over all devices.

    The reference's only parallelism is data-parallel (SURVEY.md §2.4); a 1-D
    mesh covers parity. `axes`/`shape` leave room for a model axis later.
    """
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axes) - 1)
    devices = devices.reshape(tuple(shape))
    return Mesh(devices, tuple(axes))


def make_data_mesh(batch_size: int, devices=None) -> Mesh:
    """1-D data mesh over the largest device count that divides batch_size —
    keeps tiny smoke batches runnable on big virtual meshes."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    while n > 1 and batch_size % n != 0:
        n -= 1
    return make_mesh(("data",), devices=devices[:n])


def data_sharding(mesh: Mesh, ndim: int, axis: str = "data") -> NamedSharding:
    """Shard axis 0 (batch) over the data mesh axis; replicate the rest."""
    spec = P(axis, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a host batch with axis-0 sharded over the data axis."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, data_sharding(mesh, np.ndim(x))), batch
    )


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params, scheduler tables) across the mesh."""
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def is_primary() -> bool:
    """Host I/O guard — counterpart of `dist.get_rank() == 0` checks."""
    return jax.process_index() == 0


def host_local_batch(global_indices: np.ndarray) -> np.ndarray:
    """Shard sample indices across processes (reference src/image_dataset.py:66-70
    shards the dataset by MPI rank; here each host takes a strided slice)."""
    return global_indices[jax.process_index():: jax.process_count()]
