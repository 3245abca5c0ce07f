"""Probe: one ADM-256 flagship forward, bf16 vs int8 backends (ops/quant.py).

Params are initialized once with the UNQUANTIZED model (the param trees are
identical by design) so the expensive quantized graph is only compiled for
the forward being measured. Prints compile time and fenced step time per
backend — the go/no-go data for the quantized sampling path.

Run: python benchmarks/int8_flagship_probe.py [backends,comma,separated]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from nlc_tpu.models.adm_unet import ADMUNet, ADMUNetConfig


def main():
    backends = sys.argv[1].split(",") if len(sys.argv) > 1 else \
        ["bf16", "taps", "conv"]
    res, batch = 256, 8
    base = dict(image_size=res, model_channels=256, out_channels=6,
                num_res_blocks=2, attention_resolutions=(8, 16, 32),
                channel_mult=(1, 1, 2, 2, 4, 4), num_heads=4,
                num_head_channels=64, use_scale_shift_norm=True,
                resblock_updown=True, feat_layer=1)
    print("platform:", jax.devices()[0].device_kind, flush=True)

    cfg0 = ADMUNetConfig(**base)
    m0 = ADMUNet(cfg0, dtype=jnp.bfloat16)
    t0 = time.time()
    params = jax.jit(m0.init)(jax.random.PRNGKey(0),
                              jnp.zeros((1, res, res, 3)), jnp.zeros((1,)))
    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"init (bf16 graph): {time.time()-t0:.1f}s, {n/1e6:.1f}M params",
          flush=True)

    x = jnp.asarray(np.random.RandomState(0).randn(batch, res, res, 3),
                    jnp.float32)
    t = jnp.full((batch,), 500.0)

    for bk in backends:
        cfg = ADMUNetConfig(**base, quant_backend=None if bk == "bf16" else bk)
        model = ADMUNet(cfg, dtype=jnp.bfloat16)
        fwd = jax.jit(lambda p, x, t, m=model: m.apply(p, x, t))
        t0 = time.time()
        out = fwd(params, x, t)
        np.asarray(out)          # fence (axon: block_until_ready unreliable)
        compile_s = time.time() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            np.asarray(fwd(params, x, t))
            best = min(best, time.time() - t0)
        tf = 17.63 / best        # XLA cost analysis: 17.63 TFLOP @ B=8
        print(f"{bk:5s}: compile {compile_s:6.1f}s  step {best*1e3:7.1f} ms "
              f"({tf:6.1f} TF/s-equivalent)", flush=True)


if __name__ == "__main__":
    main()
