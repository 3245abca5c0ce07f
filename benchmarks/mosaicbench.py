"""Mosaic (Pallas) matmul rate probe: does an int8 dot inside a Pallas
kernel reach the MXU's int8 rate on this chip?

XLA's lax.dot_general hits 379.6 TF/s int8 vs 155.4 TF/s bf16 here
(docs/BENCHMARKS.md). The fused int8 conv kernel (ops/quant_pallas.py) is
built from in-kernel dot_generals, so its ceiling is whatever Mosaic
delivers for the same op — measured here in isolation, both for a plain
(M,K)x(K,N) 2-D dot and for the conv kernel's rank-3 window shape.

Methodology: scan-of-reps inside one jitted program + host-fetch fencing
(the axon tunnel's ~28 ms dispatch floor swallows single-kernel timings).

Run on the chip: python benchmarks/mosaicbench.py
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir,
                   "logs", "r2", "mosaicbench.jsonl")


def _record(r):
    line = json.dumps(r)
    print(line, flush=True)
    with open(OUT, "a") as fh:
        fh.write(line + "\n")


def bench_pallas_mm(m, k, n, dtype_name, reps=16, tile=512):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax
    from jax.experimental import pallas as pl

    in_dtype = jnp.int8 if dtype_name == "int8" else jnp.bfloat16
    acc_dtype = jnp.int32 if dtype_name == "int8" else jnp.float32
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randint(-127, 127, (m, k)), in_dtype)
    bs = jnp.asarray(rng.randint(-127, 127, (8, k, n)), in_dtype)

    def kernel(a_ref, b_ref, o_ref):
        o_ref[...] = lax.dot_general(
            a_ref[...], b_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=acc_dtype)

    def mm(a, b):
        return pl.pallas_call(
            kernel,
            grid=(m // tile,),
            in_specs=[pl.BlockSpec((tile, k), lambda i: (i, 0)),
                      pl.BlockSpec((k, n), lambda i: (0, 0))],
            out_specs=pl.BlockSpec((tile, n), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((m, n), acc_dtype),
        )(a, b)

    @jax.jit
    def prog(a, bs):
        def body(acc, i):
            y = mm(a, bs[i % 8])
            return acc + y.astype(jnp.float32).mean(), None
        acc, _ = lax.scan(body, jnp.float32(0), jnp.arange(reps))
        return acc

    t0 = time.time()
    np.asarray(prog(a, bs))
    compile_s = time.time() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        np.asarray(prog(a, bs))
        best = min(best, time.time() - t0)
    per = best / reps
    flops = 2 * m * k * n
    return {"kind": f"pallas_mm_{dtype_name}", "m": m, "k": k, "n": n,
            "ms": round(per * 1e3, 3), "tf_s": round(flops / per / 1e12, 1),
            "compile_s": round(compile_s, 1)}


def bench_pallas_convshape(dtype_name, reps=32):
    """The conv kernel's actual in-kernel op: rank-3 window (TH, W, Cin)
    contracted with (Cin, Cout) over the minor axis, 9 taps accumulated."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax
    from jax.experimental import pallas as pl

    th, w, cin, cout = 32, 256, 256, 256
    in_dtype = jnp.int8 if dtype_name == "int8" else jnp.bfloat16
    acc_dtype = jnp.int32 if dtype_name == "int8" else jnp.float32
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(-127, 127, (8, th + 2, w + 8, cin)), in_dtype)
    wq = jnp.asarray(rng.randint(-127, 127, (8, 3, 3, cin, cout)), in_dtype)

    def kernel(x_ref, w_ref, o_ref):
        acc = jnp.zeros((th, w, cout), acc_dtype)
        for dy in range(3):
            for dx in range(3):
                win = x_ref[0, dy:dy + th, dx:dx + w, :]
                acc = acc + lax.dot_general(
                    win, w_ref[0, dy, dx],
                    (((2,), (0,)), ((), ())),
                    preferred_element_type=acc_dtype)
        o_ref[0] = acc

    def conv(xb, wb):
        return pl.pallas_call(
            kernel,
            grid=(8,),
            in_specs=[pl.BlockSpec((1, th + 2, w + 8, cin),
                                   lambda i: (i, 0, 0, 0)),
                      pl.BlockSpec((1, 3, 3, cin, cout),
                                   lambda i: (i % 8, 0, 0, 0, 0))],
            out_specs=pl.BlockSpec((1, th, w, cout), lambda i: (i, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((8, th, w, cout), acc_dtype),
        )(xb, wb)

    # weights stacked 8-deep and indexed by the SCAN counter — with both
    # operands loop-invariant XLA hoists the conv out of the scan and the
    # harness times dispatch_floor/reps (the trap documented in
    # docs/BENCHMARKS.md "Methodology")
    wstack = jnp.stack([jnp.roll(wq, s, axis=0) for s in range(8)])

    @jax.jit
    def prog(x, wstack):
        def body(acc, i):
            y = conv(x, wstack[i % 8])
            return acc + y.astype(jnp.float32).mean(), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(reps))
        return acc

    t0 = time.time()
    np.asarray(prog(x, wstack))
    compile_s = time.time() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        np.asarray(prog(x, wstack))
        best = min(best, time.time() - t0)
    per = best / reps
    flops = 2 * 9 * cin * cout * th * w * 8
    return {"kind": f"pallas_convshape_{dtype_name}",
            "ms": round(per * 1e3, 3), "tf_s": round(flops / per / 1e12, 1),
            "compile_s": round(compile_s, 1)}


def main():
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    for fn, args in [
        (bench_pallas_mm, (4096, 4096, 4096, "bf16")),
        (bench_pallas_mm, (4096, 4096, 4096, "int8")),
        (bench_pallas_convshape, ("bf16",)),
        (bench_pallas_convshape, ("int8",)),
    ]:
        try:
            r = fn(*args)
        except Exception as e:
            r = {"kind": f"{fn.__name__}{args}",
                 "error": f"{type(e).__name__}: {e}"[:300]}
        _record(r)


if __name__ == "__main__":
    main()
