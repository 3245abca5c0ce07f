"""Diagnose the <=32^2 small-spatial rate floor (VERDICT r2 #4).

docs/BENCHMARKS.md measured every conv backend collapsing to ~50-65 TF/s at
<=32^2 spatial, and showed a *pre-materialized* im2col int8 matmul at exactly
the floor shape — (8192, 4608) x (4608, 512) — running at 76 TF/s, 5x below
the same op at 4096^3. That isolates the floor to the matmul shape itself
(M = batch*spatial = 8192, K = 9*cin = 4608, N = cout = 512), not to conv
lowering. ~18% of flagship step FLOPs sit below this floor, costing ~74 ms
of every 214 ms bf16 step (reference hot loop: src/experiments.py:399-460).

This probe varies one axis at a time to find which dimension the floor
tracks, because each answer implies a different implementable fix:
  * rate rises with M  -> raising the bench batch (B=16/32) recovers it
                          whole-loop; grid-folding images into one spatial
                          plane does NOT (it keeps M fixed).
  * rate rises with N  -> widen cout by fusing sibling convs (not generally
                          implementable in the UNet) — document as floor.
  * rate rises with K  -> nothing implementable (K fixed by 9*cin).
  * conv (1,H*g,W*g,C) beats conv (g^2,H,W,C) at equal FLOPs -> XLA's
    direct-conv tiling (not im2col) prefers large spatial: implement a
    grid-fold conv wrapper for the <=32^2 layers.

Methodology (axon tunnel, CLAUDE.md): one jitted lax.scan of REPS
applications cycling over >=8 distinct operand stacks (a loop-invariant op
gets hoisted and times one exec/N); every timing fenced by a host fetch.

Run on the chip: python benchmarks/floorprobe.py [--quick]
Appends one JSON line per probe to logs/r3/floorprobe.jsonl.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir,
                   "logs", "r3", "floorprobe.jsonl")


def _rate(flops1, prog, args, reps):
    import numpy as np
    t0 = time.time()
    np.asarray(prog(*args))
    compile_s = time.time() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        np.asarray(prog(*args))
        best = min(best, time.time() - t0)
    per = best / reps
    return {"ms": round(per * 1e3, 3), "tf_s": round(flops1 / per / 1e12, 1),
            "compile_s": round(compile_s, 1)}


def matmul_probe(m, k, n, dtype_name):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    dtype = jnp.int8 if dtype_name == "int8" else jnp.bfloat16
    acc = jnp.int32 if dtype_name == "int8" else jnp.float32
    rng = np.random.RandomState(0)
    if dtype_name == "int8":
        x = jnp.asarray(rng.randint(-127, 128, (m, k)), dtype)
        ws = jnp.asarray(rng.randint(-127, 128, (8, k, n)), dtype)
    else:
        x = jnp.asarray(rng.randn(m, k), dtype)
        ws = jnp.asarray(rng.randn(8, k, n) * 0.02, dtype)
    flops1 = 2 * m * k * n
    reps = max(8, min(128, int(0.3 / max(flops1 / 100e12, 1e-6))))

    @jax.jit
    def prog(x, ws):
        def body(c, i):
            y = lax.dot_general(x, ws[i % 8], (((1,), (0,)), ((), ())),
                                preferred_element_type=acc)
            return c + y.astype(jnp.float32).mean(), None
        out, _ = lax.scan(body, jnp.float32(0), jnp.arange(reps))
        return out

    r = _rate(flops1, prog, (x, ws), reps)
    r.update(kind="matmul", m=m, k=k, n=n, dtype=dtype_name, reps=reps)
    return r


def conv_probe(batch, h, w, cin, cout, dtype_name, padding="SAME", tag=""):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    rng = np.random.RandomState(0)
    if dtype_name == "int8":
        x = jnp.asarray(rng.randint(-127, 128, (batch, h, w, cin)), jnp.int8)
        ws = jnp.asarray(rng.randint(-127, 128, (8, 3, 3, cin, cout)),
                         jnp.int8)
        acc = jnp.int32
    else:
        x = jnp.asarray(rng.randn(batch, h, w, cin), jnp.bfloat16)
        ws = jnp.asarray(rng.randn(8, 3, 3, cin, cout) * 0.05, jnp.bfloat16)
        acc = jnp.float32
    oh, ow = (h, w) if padding == "SAME" else (h - 2, w - 2)
    flops1 = 2 * 9 * cin * cout * oh * ow * batch
    reps = max(8, min(128, int(0.3 / max(flops1 / 100e12, 1e-6))))

    @jax.jit
    def prog(x, ws):
        def body(c, i):
            y = lax.conv_general_dilated(
                x, ws[i % 8], (1, 1), padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=acc)
            return c + y.astype(jnp.float32).mean(), None
        out, _ = lax.scan(body, jnp.float32(0), jnp.arange(reps))
        return out

    r = _rate(flops1, prog, (x, ws), reps)
    r.update(kind="conv", batch=batch, h=h, w=w, cin=cin, cout=cout,
             dtype=dtype_name, padding=padding, tag=tag, reps=reps)
    return r


def probes(quick):
    # floor reproduction + M scaling (im2col rows = batch*spatial)
    for m in ([8192, 32768] if quick else [4096, 8192, 16384, 32768, 65536]):
        yield lambda m=m: matmul_probe(m, 4608, 512, "int8")
        yield lambda m=m: matmul_probe(m, 4608, 512, "bf16")
    # N scaling at the floor M
    for n in [1024, 2048] if quick else [1024, 2048, 4096]:
        yield lambda n=n: matmul_probe(8192, 4608, n, "int8")
    # K scaling at the floor M
    if not quick:
        for k in [1152, 2304, 9216]:
            yield lambda k=k: matmul_probe(8192, k, 512, "int8")
        # transposed orientation: narrow-M instead of narrow-N
        yield lambda: matmul_probe(512, 4608, 8192, "int8")
    # conv batch scaling at the 32^2 floor layer
    for b in ([8, 32] if quick else [8, 16, 32, 64]):
        yield lambda b=b: conv_probe(b, 32, 32, 512, 512, "int8")
        yield lambda b=b: conv_probe(b, 32, 32, 512, 512, "bf16")
    # grid-fold: same FLOPs as (8,32,32) laid out as one (136,68) plane
    # (4x2 grid of 34^2 zero-padded tiles, VALID conv == per-tile SAME conv)
    yield lambda: conv_probe(1, 136, 68, 512, 512, "int8", "VALID", "grid4x2")
    yield lambda: conv_probe(1, 136, 68, 512, 512, "bf16", "VALID", "grid4x2")
    # 16^2 floor layer + its grid-fold
    if not quick:
        yield lambda: conv_probe(8, 16, 16, 1024, 1024, "int8")
        yield lambda: conv_probe(1, 72, 36, 1024, 1024, "int8", "VALID",
                                 "grid4x2")
        # reference point: the 64^2 layer already above the floor
        yield lambda: conv_probe(8, 64, 64, 512, 512, "int8")


def main():
    quick = "--quick" in sys.argv
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    for thunk in probes(quick):
        try:
            r = thunk()
        except Exception as e:  # record and continue — device faults on
            r = {"error": f"{type(e).__name__}: {e}"[:200]}
        line = json.dumps(r)
        print(line, flush=True)
        with open(OUT, "a") as fh:
            fh.write(line + "\n")


if __name__ == "__main__":
    main()


