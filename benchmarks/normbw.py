"""Achieved-HBM-bandwidth probe for the GroupNorm(+FiLM+SiLU) chain.

The round-4 itemization (benchmarks/stepparts.py) measured the norm bucket
at ~80 ms/step (bf16: 214 -> 134 with norms ablated) while a bytes model of
the flagship's norm sites (2 reads + 1 write per site over ~55 site
executions/step, dominated by 256^2 x 256ch at B=8) predicts a ~20-40 ms
floor at realistic HBM rates. Either the chain runs far under achievable
bandwidth (tiling headroom the fused Pallas pair failed to claim), or the
whole-loop ablation delta includes scheduling/pipelining effects that no
norm kernel can recover. This probe separates the two by timing each site
shape STANDALONE against a same-shape copy yardstick:

  copy        y = x + 1                      (1R + 1W, the practical BW ceiling)
  reduce      per-channel sum over H,W       (1R, reduction-engine ceiling)
  xla_chain   reference GroupNorm+FiLM+SiLU  (the bf16 loop's chain)
  pallas_bf16 ops/groupnorm_pallas 2-pass    (what the loop would run if forced)
  pallas_int8 same, int8-emitting            (the int8 loop's actual kernel)
  xla_int8    reference chain + absmax + quantize (the unfused int8 chain)

Interpretation: if pallas/xla chain ms ~= 1.5x copy ms (3 passes vs 2), the
kernels are at the memory floor and the residual whole-loop bucket is not
recoverable by a better norm kernel; a large gap means tile-level headroom.

Methodology per CLAUDE.md: one jitted lax.scan per cell over 8 distinct
input stacks indexed by the loop counter (loop-invariant ops get hoisted),
fenced by a host fetch of an array leaf.

Run on the chip: python benchmarks/normbw.py [--quick]
Appends one JSON line per (shape, variant) to
benchmarks/measurements/r4/normbw.jsonl.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "measurements", "r4", "normbw.jsonl")

# (res, ch) from the flagship's 44-site probe list
# (measurements/r4/fusedprobe_done.txt), largest-traffic first. B=8.
SHAPES = [
    (256, 256),
    (128, 512),
    (128, 256),
    (64, 512),
    (32, 1024),
]
VARIANTS = ["copy", "reduce", "xla_chain", "pallas_bf16", "pallas_int8",
            "xla_int8"]


def bench_one(res, ch, variant, batch=8, groups=32):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax
    from nlc_tpu.ops.groupnorm_pallas import _fused_impl

    rng = np.random.RandomState(0)
    xs = jnp.asarray(rng.randn(8, batch, res, res, ch), jnp.bfloat16)
    gamma = jnp.asarray(rng.randn(ch) * 0.1 + 1.0, jnp.float32)
    beta = jnp.asarray(rng.randn(ch) * 0.1, jnp.float32)
    fs = jnp.asarray(rng.randn(batch, ch) * 0.1, jnp.float32)
    fh = jnp.asarray(rng.randn(batch, ch) * 0.1, jnp.float32)

    bytes_1pass = batch * res * res * ch * 2           # one bf16 sweep
    # bytes model per variant: reads at bf16, int8 write = half a bf16 read
    model_bytes = {
        "copy": 2.0, "reduce": 1.0, "xla_chain": 3.0, "pallas_bf16": 3.0,
        "pallas_int8": 2.5, "xla_int8": 4.0,           # +absmax R, int8 W+R?
    }[variant] * bytes_1pass

    if variant == "copy":
        def one(x):
            return (x + jnp.bfloat16(1.0)).astype(jnp.float32).mean()
    elif variant == "reduce":
        def one(x):
            return x.astype(jnp.float32).sum(axis=(1, 2)).mean()
    else:
        use_pallas = variant.startswith("pallas")
        quant = variant.endswith("int8")

        def one(x):
            out = _fused_impl(x, gamma, beta, fs, fh, groups, 1e-5,
                              "silu", quant, use_pallas, False)
            y = out[0] if quant else out
            return y.astype(jnp.float32).mean()

    # target ~0.6 s per program at an assumed 300 GB/s
    reps = max(16, min(256, int(0.6 / max(model_bytes / 300e9, 1e-6))))

    @jax.jit
    def prog(xs):
        def body(acc, i):
            return acc + one(xs[i % 8]), None
        acc, _ = lax.scan(body, jnp.float32(0), jnp.arange(reps))
        return acc

    t0 = time.time()
    np.asarray(prog(xs))
    compile_s = time.time() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        np.asarray(prog(xs))
        best = min(best, time.time() - t0)
    per = best / reps
    return {"res": res, "ch": ch, "batch": batch, "variant": variant,
            "reps": reps, "ms": round(per * 1e3, 4),
            "gb_s_model": round(model_bytes / per / 1e9, 1),
            "model_passes": model_bytes / bytes_1pass,
            "compile_s": round(compile_s, 1)}


def main():
    quick = "--quick" in sys.argv
    shapes = SHAPES[:2] if quick else SHAPES
    env_shapes = os.environ.get("NLC_NORMBW_SHAPES")  # e.g. "32:256,16:512"
    if env_shapes:
        shapes = [tuple(int(v) for v in s.split(":"))
                  for s in env_shapes.split(",")]
    only = os.environ.get("NLC_NORMBW_VARIANTS")
    variants = ([v for v in VARIANTS if v in only.split(",")] if only
                else VARIANTS)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    done = set()
    if os.path.exists(OUT):                     # resumable, like fusedprobe
        with open(OUT) as fh:
            for line in fh:
                try:
                    r = json.loads(line)
                    done.add((r.get("res"), r.get("ch"), r.get("variant")))
                except (ValueError, KeyError):
                    pass
    for res, ch in shapes:
        for variant in variants:
            if (res, ch, variant) in done:
                print(f"skip {res},{ch},{variant} (done)", flush=True)
                continue
            try:
                r = bench_one(res, ch, variant)
            except Exception as e:
                r = {"res": res, "ch": ch, "variant": variant,
                     "error": f"{type(e).__name__}: {e}"[:200]}
            line = json.dumps(r)
            print(line, flush=True)
            with open(OUT, "a") as fh:
                fh.write(line + "\n")
    print("NORMBW_DONE", flush=True)


if __name__ == "__main__":
    main()
