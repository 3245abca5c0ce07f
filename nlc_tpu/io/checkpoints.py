"""Checkpoint save/load (orbax) + reference-format export.

Parity with the reference's sigma-training checkpoint layout
(src/experiments.py:238-252): per-epoch sigma_ckpt_{ep}, ema_sigma_ckpt_{ep},
optim_state — written by the primary host only. Our files are orbax pytree
directories instead of torch .pt; load_torch_state_dict + converters cover
ingesting the reference's torch checkpoints.
"""
from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save_pytree(tree: Any, path: str) -> None:
    """Collective pytree save — EVERY process must call it.

    Orbax elects the primary host as the writer and runs internal cross-host
    barriers; an early return on rank>0 would desync those barriers and
    deadlock rank 0. This is the counterpart of the reference's rank-0
    torch.save + dist.barrier() (experiments.py:238-252), with the
    rank gating owned by orbax instead of the caller."""
    path = os.path.abspath(path)
    cp = _checkpointer()
    tree = jax.tree_util.tree_map(np.asarray, tree)
    cp.save(path, tree, force=True)


def load_pytree(path: str, target: Any = None) -> Any:
    """Restore an orbax pytree. Pass `target` (a template tree of the same
    structure, e.g. a live optax state) to restore into typed containers
    (NamedTuples etc.) instead of raw nested dicts."""
    cp = _checkpointer()
    if target is None:
        return cp.restore(os.path.abspath(path))
    return cp.restore(os.path.abspath(path), item=target)


def resume_sigma_state(svars: Any, create_state, resume_model: str = None,
                       resume_ema_model: str = None, resume_optim: str = None,
                       log=print):
    """Apply the reference's three sigma-training resume flags
    (run_image_experiment.py:73-75): model variables, EMA params, optimizer
    state (restored into typed optax containers). `create_state` maps the
    (possibly resumed) variables to (state, tx); shared by the ADM/DDIM and
    EDM trainer CLIs."""
    import jax.numpy as jnp

    if resume_model and os.path.exists(resume_model):
        svars = load_pytree(resume_model)
        log("resumed sigma model from", resume_model)
    state, tx = create_state({"params": svars["params"],
                              "batch_stats": svars.get("batch_stats", {})})
    if resume_ema_model and os.path.exists(resume_ema_model):
        ema = load_pytree(resume_ema_model)
        state = state.replace(ema_params=ema["params"])
        log("resumed ema from", resume_ema_model)
    if resume_optim and os.path.exists(resume_optim):
        opt = load_pytree(resume_optim, target={"opt_state": state.opt_state,
                                                "step": state.step})
        state = state.replace(opt_state=opt["opt_state"],
                              step=jnp.asarray(opt["step"]))
        log("resumed optimizer from", resume_optim)
    return state, tx


def save_sigma_checkpoint(save_dir: str, epoch: int, state) -> None:
    """SigmaTrainState -> sigma_ckpt_{ep} / ema_sigma_ckpt_{ep} / optim_state."""
    save_pytree({"params": state.params, "batch_stats": state.batch_stats},
                os.path.join(save_dir, f"sigma_ckpt_{epoch}"))
    save_pytree({"params": state.ema_params, "batch_stats": state.batch_stats},
                os.path.join(save_dir, f"ema_sigma_ckpt_{epoch}"))
    save_pytree({"opt_state": state.opt_state, "step": state.step},
                os.path.join(save_dir, "optim_state"))


def load_sigma_variables(path: str) -> dict:
    """Load either an orbax dir (ours) or a torch .pt (reference format) into
    {'params', 'batch_stats'} — the caller supplies the converter for torch."""
    return load_pytree(path)
