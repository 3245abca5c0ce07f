"""Per-shape int8-vs-bf16 convolution microbenchmark on the real chip.

The flagship 256^2 ADM step is ~100% conv FLOPs (all routed through
ops/quant.QuantConv when quantized), so whole-loop int8 throughput is
decided per conv shape. This times every backend at the step's hot shapes
(the QuantConv trace of the flagship config).

Methodology (both are axon-tunnel specific, CLAUDE.md):
  * one jitted program runs a lax.scan of REPS conv applications over a
    stack of distinct weights — a single conv per dispatch measures only
    the ~30 ms tunnel round-trip (observed: a 128^2 conv "takes" the same
    wall time as a 4x-bigger 256^2 one);
  * every timing is fenced by a host fetch (block_until_ready is
    unreliable over the tunnel).

Run on the chip: python benchmarks/convbench.py [--quick]
Appends one JSON line per (shape, backend) to logs/r2/convbench.jsonl.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir,
                   "logs", "r2", "convbench.jsonl")

# (res, cin, cout, ksz) from the flagship QuantConv trace, weighted by the
# dominant FLOP contributors; batch matches the bench (8).
SHAPES = [
    (256, 256, 256, 3),   # 18x per fwd — the single biggest FLOP bucket
    (128, 256, 256, 3),   # 18x
    (64, 512, 512, 3),    # 16x
    (32, 512, 512, 3),    # 18x
    (16, 1024, 1024, 3),  # 16x
    (64, 256, 512, 3),    # level transition
    (128, 512, 256, 3),   # decoder transition
    (256, 512, 256, 1),   # decoder skip 1x1
    (32, 1024, 512, 1),   # skip 1x1
]
BACKENDS = ["bf16", "conv", "taps", "im2col", "pallas"]


def bench_one(res, cin, cout, ksz, backend, batch=8):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax
    from nlc_tpu.ops.quant import int8_conv

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(batch, res, res, cin), jnp.bfloat16)
    ws = jnp.asarray(rng.randn(8, ksz, ksz, cin, cout) * 0.05, jnp.float32)
    b = jnp.zeros((cout,), jnp.float32)

    flops1 = 2 * ksz * ksz * cin * cout * res * res * batch
    # pick scan length so the program runs >= ~300 ms at an assumed 100 TF/s
    # (amortizes the tunnel dispatch); weights cycle over 8 distinct copies
    reps = max(8, min(64, int(0.3 / max(flops1 / 100e12, 1e-5))))

    if backend == "bf16":
        def one(xc, w):
            y = lax.conv_general_dilated(
                xc, w.astype(jnp.bfloat16), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            return (y + b.astype(jnp.float32)).astype(jnp.bfloat16)
    else:
        def one(xc, w):
            return int8_conv(xc, w, b, (1, 1), "SAME", backend=backend,
                             out_dtype=jnp.bfloat16)

    @jax.jit
    def prog(x, ws):
        def body(acc, i):
            y = one(x, ws[i % 8])
            # scalar carry keeps iterations ordered without extra HBM traffic
            return acc + y.astype(jnp.float32).mean(), None
        acc, _ = lax.scan(body, jnp.float32(0), jnp.arange(reps))
        return acc

    t0 = time.time()
    np.asarray(prog(x, ws))
    compile_s = time.time() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        np.asarray(prog(x, ws))
        best = min(best, time.time() - t0)
    per = best / reps
    return {"res": res, "cin": cin, "cout": cout, "ksz": ksz,
            "backend": backend, "reps": reps, "ms": round(per * 1e3, 3),
            "tf_s": round(flops1 / per / 1e12, 1),
            "compile_s": round(compile_s, 1)}


def main():
    quick = "--quick" in sys.argv
    shapes = SHAPES[:3] if quick else SHAPES
    only = os.environ.get("NLC_CONVBENCH_BACKENDS")
    if only:
        global BACKENDS
        BACKENDS = [b for b in BACKENDS if b in only.split(",")]
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    for shape in shapes:
        for backend in BACKENDS:
            if backend == "pallas" and shape[3] != 3:
                continue
            try:
                r = bench_one(*shape, backend)
            except Exception as e:  # record and continue — device faults on
                r = {"res": shape[0], "cin": shape[1], "cout": shape[2],
                     "ksz": shape[3], "backend": backend,
                     "error": f"{type(e).__name__}: {e}"[:200]}
            line = json.dumps(r)
            print(line, flush=True)
            with open(OUT, "a") as fh:
                fh.write(line + "\n")


if __name__ == "__main__":
    main()
