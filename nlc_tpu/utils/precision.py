"""Mixed-precision policy + dynamic loss scaling.

Counterpart of reference src/fp16_util.py (MixedPrecisionTrainer :164-253):
on TPU the default policy is bf16 activations / fp32 params+norms, which
needs NO loss scaling — that is what every model/trainer here does. For
completeness (and for fp16-style experiments) DynamicLossScale reproduces the
reference's semantics: scale the loss by 2^lg_scale, skip the step and halve
the scale on non-finite gradients, grow the scale by `growth` per good step
(reference :192-224, lg_loss_scale start 20 -> here configurable, default
matching the reference's INITIAL_LOG_LOSS_SCALE).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class DynamicLossScale:
    lg_scale: jnp.ndarray            # log2 of the loss scale
    growth: float = struct.field(pytree_node=False, default=1e-3)

    @classmethod
    def create(cls, initial_lg_scale: float = 20.0, growth: float = 1e-3):
        return cls(lg_scale=jnp.asarray(initial_lg_scale, jnp.float32),
                   growth=growth)

    @property
    def scale(self) -> jnp.ndarray:
        return 2.0 ** self.lg_scale

    def scale_loss(self, loss):
        return loss * self.scale

    def unscale_grads(self, grads):
        inv = 1.0 / self.scale
        return jax.tree_util.tree_map(lambda g: g * inv, grads)

    def check_and_update(self, grads) -> Tuple[jnp.ndarray, "DynamicLossScale"]:
        """-> (grads_finite, new_scale). On overflow: halve (lg -= 1); else
        grow by `growth` (reference :205-224)."""
        finite = jnp.all(jnp.asarray(
            [jnp.isfinite(g).all() for g in jax.tree_util.tree_leaves(grads)]))
        new_lg = jnp.where(finite, self.lg_scale + self.growth, self.lg_scale - 1.0)
        return finite, self.replace(lg_scale=new_lg)


def apply_updates_if_finite(params, updates, finite):
    """Skip the optimizer step on overflow (the reference's took_step=False)."""
    import optax
    new_params = optax.apply_updates(params, updates)
    return jax.tree_util.tree_map(
        lambda n, o: jnp.where(finite, n, o), new_params, params)


def cast_floating(tree, dtype):
    """Cast floating leaves (the reference's convert_module_to_f16 analogue)."""
    def cast(x):
        if jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x
    return jax.tree_util.tree_map(cast, tree)
