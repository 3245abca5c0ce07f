"""Roofline + trace helpers — the JAX counterpart of the reference's
profiling affordances (thop FLOP hooks on attention, src/unet_adm.py:308-325;
torch_utils/misc.py:99-107 profiled_function; print_module_summary).

On TPU the compiler already knows the FLOP/byte counts, so instead of
per-module hooks we read XLA's cost analysis off the compiled executable and
pair it with a fenced wall-clock measurement.
"""
from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict

import jax


def roofline(fn: Callable, *args, iters: int = 3, warmup: int = 1,
             **kwargs) -> Dict[str, Any]:
    """Compile `fn(*args)`, time it, and report achieved TF/s and GB/s.

    Returns {time_s, flops, tflops_per_s, bytes_accessed, gbytes_per_s,
    cost}. Caveat for remote/tunneled devices: repeated identical executions
    can be deduplicated server-side — feed varying inputs or wrap the op in a
    dependent lax.scan chain when microbenchmarking a single op.
    """
    jitted = jax.jit(fn)
    lowered = jitted.lower(*args, **kwargs)
    compiled = lowered.compile()
    cost = compiled.cost_analysis() or {}
    for _ in range(warmup):
        jax.block_until_ready(jitted(*args, **kwargs))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(jitted(*args, **kwargs))
        times.append(time.perf_counter() - t0)
    t = min(times)
    flops = float(cost.get("flops", 0.0))
    byts = float(cost.get("bytes accessed", 0.0))
    return {
        "time_s": t,
        "flops": flops,
        "tflops_per_s": flops / t / 1e12 if flops else 0.0,
        "bytes_accessed": byts,
        "gbytes_per_s": byts / t / 1e9 if byts else 0.0,
        "cost": dict(cost),
    }


def format_roofline(name: str, r: Dict[str, Any]) -> str:
    return (f"{name}: {r['time_s']*1e3:.2f} ms  "
            f"{r['flops']/1e12:.3f} TFLOP -> {r['tflops_per_s']:.1f} TF/s  "
            f"({r['gbytes_per_s']:.0f} GB/s)")


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace scope; open the result with TensorBoard/XProf.

    Counterpart of the reference's torch.autograd.profiler.record_function
    wrapper (torch_utils/misc.py:99-107) at whole-region granularity.
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def profiled_function(fn: Callable) -> Callable:
    """Decorator adding a named TraceAnnotation around fn — shows up in
    profiler timelines like record_function scopes do in torch traces."""
    name = getattr(fn, "__name__", "fn")

    def wrapped(*args, **kwargs):
        with jax.profiler.TraceAnnotation(name):
            return fn(*args, **kwargs)

    wrapped.__name__ = name
    return wrapped
