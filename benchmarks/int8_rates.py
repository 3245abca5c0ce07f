"""Measure bf16 vs int8 MXU rates on the attached TPU chip.

Evidence for the quantized-sampling design (docs/BENCHMARKS.md): the 5x
throughput north-star needs ~208 TF/s sustained at 'pred'-loop FLOPs, above
the chip's measured bf16 ceiling (~131 TF/s), so the question is how much of
v5e's higher int8 MXU rate XLA actually delivers for the op mix the ADM UNet
uses (3x3 convs dominate; attention matmuls second).

Timing rules for the tunneled chip (docs/ROADMAP.md): fence every
measurement with a host fetch (np.asarray), never rely on
block_until_ready alone; no persistent compilation cache.

Run: python benchmarks/int8_rates.py [--quick]
"""
from __future__ import annotations

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def _fence(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def _time(fn, *args, iters=3):
    fn(*args)                      # compile + warmup
    _fence(fn(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        _fence(out)
        best = min(best, time.perf_counter() - t0)
    return best


def matmul_rate(dtype, n=4096, k_steps=8, acc_dtype=None):
    """Sustained rate of chained independent (n,n)@(n,n) products."""
    rng = np.random.RandomState(0)
    if dtype == jnp.int8:
        x = jnp.asarray(rng.randint(-127, 128, (n, n)), jnp.int8)
        ws = jnp.asarray(rng.randint(-127, 128, (k_steps, n, n)), jnp.int8)
    else:
        x = jnp.asarray(rng.randn(n, n), dtype)
        ws = jnp.asarray(rng.randn(k_steps, n, n) * 0.02, dtype)
    acc_dtype = acc_dtype or (jnp.int32 if dtype == jnp.int8 else jnp.float32)

    @jax.jit
    def run(x, ws):
        def body(acc, w):
            return acc + lax.dot_general(
                x, w, (((1,), (0,)), ((), ())),
                preferred_element_type=acc_dtype), None
        acc0 = jnp.zeros((n, n), acc_dtype)
        acc, _ = lax.scan(body, acc0, ws)
        return acc

    dt = _time(run, x, ws)
    tflops = 2 * n * n * n * k_steps / dt / 1e12
    return tflops, dt


def conv_rate(dtype, h=64, c=256, k_steps=4, batch=8, acc_dtype=None):
    """Sustained rate of 3x3 same convs (the ADM UNet hot op), NHWC."""
    rng = np.random.RandomState(0)
    if dtype == jnp.int8:
        x = jnp.asarray(rng.randint(-127, 128, (batch, h, h, c)), jnp.int8)
        ws = jnp.asarray(rng.randint(-127, 128, (k_steps, 3, 3, c, c)), jnp.int8)
    else:
        x = jnp.asarray(rng.randn(batch, h, h, c), dtype)
        ws = jnp.asarray(rng.randn(k_steps, 3, 3, c, c) * 0.02, dtype)
    acc_dtype = acc_dtype or (jnp.int32 if dtype == jnp.int8 else jnp.float32)

    dn = lax.conv_dimension_numbers(x.shape, ws.shape[1:],
                                    ("NHWC", "HWIO", "NHWC"))

    @jax.jit
    def run(x, ws):
        def body(acc, w):
            y = lax.conv_general_dilated(
                x, w, (1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=acc_dtype)
            return acc + y, None
        acc0 = jnp.zeros((batch, h, h, c), acc_dtype)
        acc, _ = lax.scan(body, acc0, ws)
        return acc

    dt = _time(run, x, ws)
    tflops = 2 * batch * h * h * c * c * 9 * k_steps / dt / 1e12
    return tflops, dt


def slope_rate(case_fn, dtype, k_lo, k_hi, **kw):
    """Cancel the tunnel's fixed dispatch+fetch overhead (~25-30 ms/call):
    rate = extra FLOPs / extra time between two work levels."""
    t_lo_tf, t_lo = case_fn(dtype, k_steps=k_lo, **kw)
    t_hi_tf, t_hi = case_fn(dtype, k_steps=k_hi, **kw)
    flops_lo = t_lo_tf * t_lo * 1e12
    flops_hi = t_hi_tf * t_hi * 1e12
    dt = t_hi - t_lo
    if dt <= 0:
        return float("nan"), t_lo, t_hi
    return (flops_hi - flops_lo) / dt / 1e12, t_lo, t_hi


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    args = p.parse_args()
    print("platform:", jax.devices()[0].platform, jax.devices()[0].device_kind,
          flush=True)

    results = {}
    cases = [
        ("matmul bf16 4k", matmul_rate, jnp.bfloat16, dict(n=4096), 8, 40),
        ("matmul int8 4k", matmul_rate, jnp.int8, dict(n=4096), 8, 40),
        ("matmul bf16 8k", matmul_rate, jnp.bfloat16, dict(n=8192), 2, 10),
        ("matmul int8 8k", matmul_rate, jnp.int8, dict(n=8192), 2, 10),
        ("conv3x3 bf16 64res 256ch", conv_rate, jnp.bfloat16,
         dict(h=64, c=256), 4, 24),
        ("conv3x3 int8 64res 256ch", conv_rate, jnp.int8,
         dict(h=64, c=256), 4, 24),
        ("conv3x3 bf16 256res 128ch", conv_rate, jnp.bfloat16,
         dict(h=256, c=128, batch=4), 2, 12),
        ("conv3x3 int8 256res 128ch", conv_rate, jnp.int8,
         dict(h=256, c=128, batch=4), 2, 12),
    ]
    for name, fn, dtype, kw, k_lo, k_hi in cases:
        if args.quick and "8k" in name:
            continue
        try:
            tflops, t_lo, t_hi = slope_rate(fn, dtype, k_lo, k_hi, **kw)
            results[name] = tflops
            print(f"{name:28s} {tflops:8.1f} TF/s  "
                  f"(t[{k_lo}]={t_lo*1e3:.1f}ms t[{k_hi}]={t_hi*1e3:.1f}ms)",
                  flush=True)
        except Exception as e:
            results[name] = None
            print(f"{name:28s} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)

    for a, b, label in [("matmul int8 4k", "matmul bf16 4k", "matmul 4k"),
                        ("matmul int8 8k", "matmul bf16 8k", "matmul 8k"),
                        ("conv3x3 int8 64res 256ch", "conv3x3 bf16 64res 256ch",
                         "conv 64res"),
                        ("conv3x3 int8 256res 128ch",
                         "conv3x3 bf16 256res 128ch", "conv 256res")]:
        if results.get(a) and results.get(b):
            print(f"int8/bf16 ratio [{label}]: {results[a]/results[b]:.2f}x")


if __name__ == "__main__":
    main()
