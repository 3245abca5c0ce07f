"""Benchmark: 50-step NLC-DDIM 256x256 sampling throughput on one TPU chip.

This is the driver's north-star workload (BASELINE.json): the flagship 256^2
DDIM UNet with the noise-level-correction step fused into every denoising
iteration (encode -> sigma head -> corrected full forward -> x_{t-1}),
bf16 activations, whole loop one jitted lax.scan.

Prints ONE JSON line:
  {"metric": ..., "value": imgs/sec/chip, "unit": ..., "vs_baseline": ...}

vs_baseline is measured against an ESTIMATED A100 torch reference of
0.8 images/sec/chip for the same workload: the reference implementation runs
~1.5 UNet forwards per step (encoder pass + full pass, fp32, per-step Python
dispatch, experiments.py:399-460); at ~500 GFLOPs/forward for the 256^2
celeba_hq-size UNet and ~35% fp32-TF32 utilization on A100 that is
~0.75-0.9 img/s at 50 steps. The target in BASELINE.json is >=5x => vs_baseline
>= 5.0 wins.
"""
from __future__ import annotations

import json
import os
import sys
import time

A100_TORCH_IMGS_PER_SEC = 0.8  # estimated torch/A100 reference (see docstring)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    platform = jax.devices()[0].platform
    log("platform:", platform, jax.devices())

    from nlc_tpu.models.ddim_unet import DDIMUNet, DDIMUNetConfig
    from nlc_tpu.models.sigma_head import SigmaHead, sigma_head_for_unet
    from nlc_tpu.sched import get_sampler
    from nlc_tpu.engine import DenoiseConfig, ModelBundle, build_denoise_fn, init_noise
    from nlc_tpu.engine.loops import set_norm_maxmin

    quick = "--quick" in sys.argv
    res = 64 if quick else 256
    batch = 4 if quick else int(os.environ.get("NLC_BENCH_BATCH", "8"))
    steps = 10 if quick else 50

    cfg = DDIMUNetConfig(ch=128, out_ch=3, ch_mult=(1, 1, 2, 2, 4, 4),
                         num_res_blocks=2, attn_resolutions=(16,), resolution=res)
    if quick:
        cfg = DDIMUNetConfig(ch=64, out_ch=3, ch_mult=(1, 2, 2), num_res_blocks=1,
                             attn_resolutions=(16,), resolution=res)
    model = DDIMUNet(cfg, dtype=jnp.bfloat16)
    head = SigmaHead(sigma_head_for_unet(cfg.feat_shape), dtype=jnp.bfloat16)

    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, res, res, 3))
    t0 = jnp.zeros((1,))
    log("initializing params...")
    params = model.init(rng, x0, t0)
    svars = head.init(jax.random.PRNGKey(1), jnp.zeros((1,) + cfg.feat_shape))
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    log(f"eps model params: {n_params/1e6:.1f}M")

    bundle = ModelBundle(
        forward=lambda p, z, t: model.apply(p, z, t),
        encode=lambda p, z, t: model.apply(p, z, t, method=DDIMUNet.encode),
        sigma=lambda v, f: head.apply(v, f),
        learn_epsvar=False,
    )
    sampler = get_sampler("ddim_simple_orig", 1000, steps,
                          sampler_var="fixedsmall", eta=0.85)
    nmin, nmax = set_norm_maxmin((res, res, 3), 0.0, 397.0)
    dcfg = DenoiseConfig(style="pred", norm_eps=True, refine_prior_sigma=True,
                         clip_fn="clamp", sigma_pred_threshold=960,
                         norm_max=nmax, norm_min=nmin)
    fn = build_denoise_fn(sampler, bundle, dcfg, donate_x=False)

    seeds = jnp.arange(batch)
    xT = init_noise(sampler, seeds, (res, res, 3))

    log("compiling + warmup...")
    t0c = time.time()
    out, _ = fn(params, svars, xT, seeds)
    out.block_until_ready()
    log(f"compile+first run: {time.time()-t0c:.1f}s")

    n_iters = 3
    t0r = time.time()
    for _ in range(n_iters):
        out, _ = fn(params, svars, xT, seeds)
    out.block_until_ready()
    dt = (time.time() - t0r) / n_iters
    imgs_per_sec = batch / dt
    log(f"batch {batch}, {steps} steps: {dt:.3f}s/batch -> {imgs_per_sec:.3f} img/s")

    result = {
        "metric": f"images/sec/chip, {steps}-step NLC-DDIM {res}x{res} sampling (bf16)",
        "value": round(imgs_per_sec, 4),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec / A100_TORCH_IMGS_PER_SEC, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
