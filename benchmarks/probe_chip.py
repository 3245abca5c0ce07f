"""Chip-health probe: a 1024x1024 jitted matmul, host-fetch fenced.

Exit 0 = plane healthy. Run under `timeout 150` — on a wedged plane the
fetch never returns (CLAUDE.md wedge diagnosis). Kept in-repo because the
/tmp copies used by earlier queues were erased by each VM re-image.
"""
import numpy as np
import jax
import jax.numpy as jnp


def main():
    x = jnp.ones((1024, 1024), jnp.bfloat16)
    y = jax.jit(lambda a: a @ a)(x)
    s = float(np.asarray(y[0, 0]))
    print("probe ok", jax.devices(), s)


if __name__ == "__main__":
    main()
