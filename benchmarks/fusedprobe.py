"""Chip validation probe for the fused GroupNorm epilogue (round 4).

Runs ops/groupnorm_pallas.fused_groupnorm_act on the REAL TPU at every
(H, C) site shape of the flagship 256^2 ADM-UNet and the 64^2 SongUNet,
with and without FiLM and int8 quantization, and asserts the Pallas output
matches the identical-math XLA reference (use_pallas=False) — the CPU
interpret-mode tests cannot catch TPU lowering rejections (the round-4
queue1 bf16 cells died on exactly that), so lowering + numerics must be
proven on hardware before the stepparts/bench queue spends hours.

Exit code 0 = all cells pass; nonzero aborts the queue.

Resumable: each passing cell is appended to measurements/r4/fusedprobe_done.txt
and skipped on rerun — tunnel compiles run ~2 min/cell, so a single timeout
budget cannot be trusted to cover all 44 cells in one shot.
"""
from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
DONE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "measurements", "r4", "fusedprobe_done.txt")
from nlc_tpu.ops.groupnorm_pallas import (_fused_impl,  # noqa: E402
                                          pallas_groupnorm_applicable)

# (H, C, groups): ADM 256^2 flagship sites + SongUNet 64^2 sites
SHAPES = [
    (256, 256, 32), (128, 256, 32), (128, 512, 32), (64, 512, 32),
    (32, 1024, 32), (16, 1024, 32), (8, 1024, 32),
    (64, 128, 32), (32, 256, 32), (16, 256, 32), (8, 256, 32),
]


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    done = set()
    if os.path.exists(DONE_PATH):
        with open(DONE_PATH) as f:
            done = {line.strip() for line in f if line.strip()}
    rng = np.random.RandomState(0)
    n_fail = 0
    for h, c, g in SHAPES:
        n = 4
        x = jnp.asarray(rng.randn(n, h, h, c).astype(np.float32) * 3.0,
                        jnp.bfloat16)
        gamma = jnp.asarray(rng.uniform(0.5, 1.5, c).astype(np.float32))
        beta = jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)
        fs = jnp.asarray(rng.randn(n, c).astype(np.float32) * 0.2)
        fh = jnp.asarray(rng.randn(n, c).astype(np.float32) * 0.2)
        if not pallas_groupnorm_applicable(x.shape, g):
            print(f"H={h} C={c}: NOT APPLICABLE (falls back to XLA)")
            continue
        for film in (False, True):
            for quant in (False, True):
                key = f"{h},{c},{int(film)},{int(quant)}"
                if key in done:
                    print(f"H={h} C={c} film={int(film)} quant={int(quant)}"
                          ": SKIP (already validated)", flush=True)
                    continue
                kw = dict(film_scale=fs if film else None,
                          film_shift=fh if film else None,
                          num_groups=g, eps=1e-5, act="silu", quant=quant)

                def run(use_pallas, kw=kw):
                    return _fused_impl(x, gamma, beta, kw["film_scale"],
                                       kw["film_shift"], kw["num_groups"],
                                       kw["eps"], kw["act"], kw["quant"],
                                       use_pallas, False)

                try:
                    got = jax.jit(lambda: run(True))()
                    want = jax.jit(lambda: run(False))()
                    if quant:
                        yq_g, s_g = got
                        yq_w, s_w = want
                        np.testing.assert_allclose(np.asarray(s_g),
                                                   np.asarray(s_w),
                                                   rtol=1e-5)
                        # int8 codes: allow 1-code rounding boundary flips
                        d = np.abs(np.asarray(yq_g, np.int32)
                                   - np.asarray(yq_w, np.int32))
                        frac = (d > 1).mean()
                        assert frac == 0.0, f"{frac:.2e} codes off by >1"
                        tag = f"maxcodediff={d.max()}"
                    else:
                        a = np.asarray(got, np.float32)
                        b = np.asarray(want, np.float32)
                        # Both sides are bf16 outputs of identically-specified
                        # math with different reduction tiling; allow 2 bf16
                        # ulps relative (2^-7) atop a 0.02 absolute floor —
                        # FiLM-scaled outputs exceed |4|, where one bf16 ulp
                        # is already 0.03125.
                        tol = np.maximum(0.02, np.abs(b) * 2.0 ** -7)
                        err = np.abs(a - b)
                        nbad = int((err > tol).sum())
                        assert nbad == 0, \
                            f"{nbad} elems past 2-ulp bound, max {err.max()}"
                        tag = f"maxerr={err.max():.4f}"
                    print(f"H={h} C={c} film={int(film)} quant={int(quant)}"
                          f": OK {tag}", flush=True)
                    os.makedirs(os.path.dirname(DONE_PATH), exist_ok=True)
                    with open(DONE_PATH, "a") as f:
                        f.write(key + "\n")
                except Exception as e:  # noqa: BLE001
                    n_fail += 1
                    print(f"H={h} C={c} film={int(film)} quant={int(quant)}"
                          f": FAIL {type(e).__name__}: {e}", flush=True)
    print(f"fusedprobe: {'PASS' if n_fail == 0 else f'{n_fail} FAILURES'}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
