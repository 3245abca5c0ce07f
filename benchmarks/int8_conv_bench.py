"""Race bf16 XLA conv vs the two int8 conv backends (ops/quant.py) at the
ADM-256 flagship's layer shapes. Slope timing (two work levels) cancels the
tunnel's fixed dispatch overhead. Run: python benchmarks/int8_conv_bench.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from nlc_tpu.ops.quant import int8_conv


def _fence(x):
    return np.asarray(x.ravel()[:1])


def _time(fn, *args):
    _fence(fn(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _fence(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def chain(mode, b, h, c, k_steps):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, h, h, c) * 0.5, jnp.bfloat16)
    ws = jnp.asarray(rng.randn(k_steps, 3, 3, c, c) * 0.02, jnp.float32)

    @jax.jit
    def run(x, ws):
        def body(hcur, w):
            if mode == "bf16":
                y = lax.conv_general_dilated(
                    hcur, w.astype(jnp.bfloat16), (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
            else:
                y = int8_conv(hcur, w, None, backend=mode,
                              out_dtype=jnp.bfloat16)
            return jnp.tanh(y), None      # keep magnitudes bounded
        out, _ = lax.scan(body, x, ws)
        return out

    return _time(run, x, ws)


def rate(mode, b, h, c, k_lo=2, k_hi=8):
    t_lo = chain(mode, b, h, c, k_lo)
    t_hi = chain(mode, b, h, c, k_hi)
    fl = 2 * b * h * h * c * c * 9 * (k_hi - k_lo)
    dt = t_hi - t_lo
    return fl / dt / 1e12 if dt > 0 else float("nan"), t_lo, t_hi


def main():
    import sys
    modes = tuple(sys.argv[1].split(",")) if len(sys.argv) > 1 else \
        ("bf16", "taps", "conv")
    print("platform:", jax.devices()[0].device_kind, flush=True)
    shapes = [(8, 64, 512), (8, 32, 1024), (4, 128, 256), (4, 256, 256)]
    for b, h, c in shapes:
        row = f"B{b} {h}x{h} c{c}: "
        for mode in modes:
            try:
                tf, t_lo, t_hi = rate(mode, b, h, c)
                row += f"{mode}={tf:6.1f}TF/s ({t_lo*1e3:.0f}/{t_hi*1e3:.0f}ms)  "
            except Exception as e:
                row += f"{mode}=FAIL({type(e).__name__})  "
            print(row, flush=True)
        print(flush=True)


if __name__ == "__main__":
    main()
