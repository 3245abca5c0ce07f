"""Persist-in-VMEM norm+conv fusion probe (VERDICT r4 next-#4).

The round-4 normbw adjudication closed the residual ~80 ms/step norm bucket
as "not kernel-recoverable" for STANDALONE norm kernels, but named one
untried layout: fusing the GroupNorm+FiLM+SiLU chain with its consumer
3x3 conv so the normalized activation never round-trips HBM
(docs/BENCHMARKS.md "The residual norm bucket, adjudicated"). This probe
times that layout (ops/norm_conv_pallas.py) against the XLA chain at the
two traffic-dominant flagship shapes (67% of norm traffic,
measurements/r4/normbw.jsonl):

  xla_chain_conv    stats + fused normalize/FiLM/SiLU + XLA conv3x3
                    (what the bf16 loop runs today at these sites)
  pallas_fused      stats pass + fused normalize+conv Pallas kernel
                    (normalized tensor lives only in VMEM)
  xla_conv_only     conv3x3 alone on a pre-normalized tensor
                    (isolates the conv's own cost; chain minus this is
                    the norm-side overhead each variant pays)

Methodology per CLAUDE.md: one jitted lax.scan per cell over 8 distinct
input stacks indexed by the loop counter; every variant fenced through a
same-shape accumulator carry and a SMALL dependent host-fetch slice.

Run on the chip: python benchmarks/normconv_probe.py [--quick]
Appends one JSON line per (shape, variant) to
benchmarks/measurements/r5/normconv_probe.jsonl (resumable).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.environ.get(
    "NLC_NORMCONV_OUT",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "measurements", "r5", "normconv_probe.jsonl"))

# the two traffic-dominant flagship site shapes (res, cin, cout); B=8
SHAPES = [
    (256, 256, 256),
    (128, 512, 512),
]
VARIANTS = ["xla_chain_conv", "pallas_fused", "xla_conv_only"]


def bench_one(res, cin, cout, variant, batch=8, groups=32):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax
    from nlc_tpu.ops.norm_conv_pallas import (fused_groupnorm_silu_conv,
                                              reference_groupnorm_silu_conv)

    rng = np.random.RandomState(0)
    xs = jnp.asarray(rng.randn(8, batch, res, res, cin), jnp.bfloat16)
    gamma = jnp.asarray(rng.randn(cin) * 0.1 + 1.0, jnp.float32)
    beta = jnp.asarray(rng.randn(cin) * 0.1, jnp.float32)
    fs = jnp.asarray(rng.randn(batch, cin) * 0.1, jnp.float32)
    fh = jnp.asarray(rng.randn(batch, cin) * 0.1, jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, cin, cout) * 0.05, jnp.bfloat16)
    bias = jnp.asarray(rng.randn(cout) * 0.1, jnp.float32)

    flops_call = 2.0 * batch * res * res * cout * 9 * cin

    if variant == "xla_chain_conv":
        def one(x, acc):
            return acc + reference_groupnorm_silu_conv(
                x, gamma, beta, w, bias, num_groups=groups,
                film_scale=fs, film_shift=fh)
    elif variant == "pallas_fused":
        def one(x, acc):
            return acc + fused_groupnorm_silu_conv(
                x, gamma, beta, w, bias, num_groups=groups,
                film_scale=fs, film_shift=fh)
    else:  # xla_conv_only
        def one(x, acc):
            y = lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            return acc + (y + bias[None, None, None, :]).astype(jnp.bfloat16)

    acc0 = jnp.zeros((batch, res, res, cout), jnp.bfloat16)
    # ~1.5 s of device time per program at an assumed 80 TF/s
    reps = max(8, min(512, int(1.5 / max(flops_call / 80e12, 1e-6))))

    @jax.jit
    def prog(xs, acc0):
        def body(acc, i):
            return one(xs[i % 8], acc), None
        acc, _ = lax.scan(body, acc0, jnp.arange(reps))
        return acc

    def fence(out):
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
    return {"res": res, "cin": cin, "cout": cout, "batch": batch,
            "variant": variant, "fence": "slice256", "reps": reps,
            "ms": round(per * 1e3, 4),
            "tf_s": round(flops_call / per / 1e12, 1),
            "compile_s": round(compile_s, 1)}


def main():
    quick = "--quick" in sys.argv
    shapes = SHAPES[:1] if quick else SHAPES
    env_shapes = os.environ.get("NLC_NORMCONV_SHAPES")  # "256:256:256,..."
    if env_shapes:
        shapes = [tuple(int(v) for v in s.split(":"))
                  for s in env_shapes.split(",")]
    only = os.environ.get("NLC_NORMCONV_VARIANTS")
    variants = ([v for v in VARIANTS if v in only.split(",")] if only
                else VARIANTS)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    done = set()
    if os.path.exists(OUT):
        with open(OUT) as fh:
            for line in fh:
                try:
                    r = json.loads(line)
                    if "error" not in r:
                        done.add((r.get("res"), r.get("cin"),
                                  r.get("cout"), r.get("variant")))
                except (ValueError, KeyError):
                    pass
    clean = True
    for res, cin, cout in shapes:
        for variant in variants:
            if (res, cin, cout, variant) in done:
                print(f"skip {res},{cin},{cout},{variant} (done)", flush=True)
                continue
            try:
                r = bench_one(res, cin, cout, variant)
            except Exception as e:
                r = {"res": res, "cin": cin, "variant": variant,
                     "error": f"{type(e).__name__}: {e}"[:200]}
                clean = False
            line = json.dumps(r)
            print(line, flush=True)
            with open(OUT, "a") as fh:
                fh.write(line + "\n")
    # only claim DONE when every cell has a real measurement — queue retry
    # loops grep for this, and an errored cell must trigger the retry
    # (round-5 queue 3 broke out early on a DONE printed over error rows)
    print("NORMCONV_DONE" if clean else "NORMCONV_INCOMPLETE (errors above)",
          flush=True)


if __name__ == "__main__":
    main()
