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

  copy        acc += x + 1                   (the practical BW ceiling)
  reduce      per-channel sum over N,H,W     (1R, reduction-engine ceiling)
  xla_chain   reference GroupNorm+FiLM+SiLU  (the bf16 loop's chain)
  pallas_bf16 ops/groupnorm_pallas 2-pass    (what the loop would run if forced)
  pallas_int8 same, int8-emitting            (the int8 loop's actual kernel)
  xla_int8    reference chain + absmax + quantize (the unfused int8 chain)

Every materializing variant is fenced through a same-shape accumulator
carry (see bench_one) so XLA cannot elide the output write; the stated
per-variant pass model includes the accumulator's +2 passes. The host
fetch that fences each timed call must be a SMALL dependent slice of the
accumulator, not the accumulator itself: the first capture of this probe
fetched the full 268 MB carry and timed the tunnel's ~20 MB/s stdio
streaming rate (~13 s per call, "13.7 GB/s copy"), not the device
(quarantined in normbw_badfence.jsonl; BENCHMARKS "timing traps" #4).
Interpretation: compare each variant's achieved GB/s (gb_s_model) against
copy's — parity means the chain is at the memory floor and the residual
whole-loop norm bucket is not recoverable by a better norm kernel; a
large gap means tile-level headroom the fused pair failed to claim.

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

OUT = os.environ.get(
    "NLC_NORMBW_OUT",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "measurements", "r4", "normbw.jsonl"))

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
    # The output of every materializing variant is fenced by adding it into
    # a same-shape bf16 accumulator carried through the scan: a scalar
    # `.mean()` fence would let XLA fuse the elementwise work into the
    # reduction and ELIDE the output write entirely (the "copy" yardstick
    # would silently become a pure read). The accumulator costs every such
    # variant the same +2 passes (R acc + W acc), stated in the model:
    #   copy         R x, R acc, W acc                                  = 3
    #   reduce       R x (small per-channel output, no acc)             = 1
    #   xla_chain    stats R x; apply(+acc) R x, R acc, W acc           = 4
    #   pallas_bf16  kernel stats R + apply R + W y; acc R y,R acc,W acc= 6
    #   pallas_int8  same, y int8 (W .5, R .5)                          = 5
    #   xla_int8     stats R; apply+absmax R x, W y; quant R y, W q(.5);
    #                acc R q(.5), R acc, W acc                          = 7
    # (int8 sweeps counted at half a bf16 pass)
    model_passes = {
        "copy": 3.0, "reduce": 1.0, "xla_chain": 4.0, "pallas_bf16": 6.0,
        "pallas_int8": 5.0, "xla_int8": 7.0,
    }[variant]
    model_bytes = model_passes * bytes_1pass

    use_pallas = variant.startswith("pallas")
    quant = variant.endswith("int8")

    if variant == "copy":
        def one(x, acc):
            return acc + (x + jnp.bfloat16(1.0))
    elif variant == "reduce":
        def one(x, acc):
            return acc + x.astype(jnp.float32).sum(axis=(0, 1, 2))
    elif variant == "xla_int8":
        # the unfused int8 chain as the loop ran it pre-fusion: reference
        # norm chain, then a standalone absmax reduce + quantize pass
        def one(x, acc):
            y = _fused_impl(x, gamma, beta, fs, fh, groups, 1e-5,
                            "silu", False, False, False)
            s = jnp.maximum(jnp.max(jnp.abs(y)).astype(jnp.float32) / 127.0,
                            1e-12)
            q = jnp.clip(jnp.round(y.astype(jnp.float32) / s),
                         -127, 127).astype(jnp.int8)
            return acc + q.astype(jnp.bfloat16) * s.astype(jnp.bfloat16)
    else:
        def one(x, acc):
            out = _fused_impl(x, gamma, beta, fs, fh, groups, 1e-5,
                              "silu", quant, use_pallas, False)
            if quant:
                y, qs = out
                y = (y.astype(jnp.bfloat16)
                     * qs.reshape(-1, 1, 1, 1).astype(jnp.bfloat16))
            else:
                y = out
            return acc + y

    acc0 = (jnp.zeros((ch,), jnp.float32) if variant == "reduce"
            else jnp.zeros(xs.shape[1:], jnp.bfloat16))
    # target ~1.4 s device time per program at an assumed 700 GB/s so the
    # per-call tunnel round trip (~28 ms) and the tiny fence fetch stay <2%
    reps = max(16, min(1024, int(1.4 / max(model_bytes / 700e9, 1e-6))))

    @jax.jit
    def prog(xs, acc0):
        def body(acc, i):
            return one(xs[i % 8], acc), None
        acc, _ = lax.scan(body, acc0, jnp.arange(reps))
        return acc

    def fence(out):
        # fetch a small DEPENDENT slice — fetching the full (B,H,W,C) carry
        # times the tunnel's ~20 MB/s streaming, not the device (docstring)
        np.asarray(out.ravel()[:256])

    t0 = time.time()
    fence(prog(xs, acc0))
    compile_s = time.time() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        fence(prog(xs, acc0))
        best = min(best, time.time() - t0)
    per = best / reps
    return {"res": res, "ch": ch, "batch": batch, "variant": variant,
            "fence": "slice256", "reps": reps, "ms": round(per * 1e3, 4),
            "gb_s_model": round(model_bytes / per / 1e9, 1),
            "model_passes": model_passes,
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
                    if "error" not in r:   # errored cells retry on resume
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
