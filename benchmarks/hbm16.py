"""Test the HBM-capacity attribution for the B=16 whole-loop regression.

docs/BENCHMARKS.md "The small-spatial floor, attacked" measured int8 'pred'
at B=8/16/32 -> 0.784/0.773/0.750 img/s while the per-layer floor probes
promised 122->187 TF/s at B=8->16, and *attributed* the gap to
HBM-capacity-bound layout degradation of the 256^2/128^2 working set —
without testing it (VERDICT r3 #5). Two kinds of evidence here:

  mem_b8 / mem_b16 / mem_b32   compiled memory analysis of the flagship
                               loop — peak/temp/argument HBM bytes straight
                               from XLA (no run needed; the direct test of
                               "does B=16 approach the 16 GB ceiling?")
  run_b16_donate               donate the x_T buffer (build_denoise_fn
                               donate_x=True) at B=16
  run_b16_skipf8               skip stack stored float8_e4m3fn (halves the
                               largest persistent activation set)
  run_b8_skipf8                control: does f8 skip storage cost anything
                               where capacity is NOT tight?
  run_b16_skipf8_donate        both levers together

If pressure relief flips B=16 positive, the batch axis reopens the
small-spatial floor win; if not, the attribution needs revision (record
either way). Appends JSON lines to benchmarks/measurements/r4/hbm16.jsonl.
"""
from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "measurements", "r4", "hbm16.jsonl")

CONFIGS = {
    "mem_b8":   {"batch": 8,  "mem_only": True},
    "mem_b16":  {"batch": 16, "mem_only": True},
    "mem_b32":  {"batch": 32, "mem_only": True},
    "run_b16_donate": {"batch": 16, "donate": True},
    "run_b16_skipf8": {"batch": 16, "skip_dtype": "float8_e4m3fn"},
    "run_b8_skipf8":  {"batch": 8,  "skip_dtype": "float8_e4m3fn"},
    "run_b16_skipf8_donate": {"batch": 16, "skip_dtype": "float8_e4m3fn",
                              "donate": True},
    "mem_b16_skipf8": {"batch": 16, "skip_dtype": "float8_e4m3fn",
                       "mem_only": True},
}


def main(name: str):
    spec = CONFIGS[name]
    import jax
    if os.environ.get("NLC_BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["NLC_BENCH_PLATFORM"])
    import jax.numpy as jnp
    import numpy as np
    from nlc_tpu.models.adm_unet import ADMUNet, ADMUNetConfig, ADMSigmaHead
    from nlc_tpu.sched import get_sampler
    from nlc_tpu.engine import (DenoiseConfig, ModelBundle, build_denoise_fn,
                                init_noise)
    from nlc_tpu.engine.loops import denoise_loop, set_norm_maxmin

    res, steps = 256, 50
    batch = spec["batch"]
    quick = os.environ.get("NLC_HBM16_QUICK")
    if quick:
        res, steps, batch = 64, 2, 2
    cfg = ADMUNetConfig(image_size=res,
                        model_channels=32 if quick else 256, out_channels=6,
                        num_res_blocks=1 if quick else 2,
                        attention_resolutions=(4,) if quick else (8, 16, 32),
                        channel_mult=(1, 2, 2) if quick else (1, 1, 2, 2, 4, 4),
                        num_heads=2 if quick else 4,
                        num_head_channels=16 if quick else 64,
                        use_scale_shift_norm=True, resblock_updown=True,
                        feat_layer=1, quant_backend="conv",
                        skip_store_dtype=spec.get("skip_dtype"))
    model = ADMUNet(cfg, dtype=jnp.bfloat16)
    d, _, ch = cfg.feat_shape
    head = ADMSigmaHead(dim=d, channels=ch, n_blocks=2, dropout=0.0,
                        num_heads=cfg.num_heads,
                        num_head_channels=cfg.num_head_channels,
                        dtype=jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, res, res, 3)), jnp.zeros((1,)))
    svars = jax.jit(head.init)(jax.random.PRNGKey(1),
                               jnp.zeros((1,) + cfg.feat_shape))
    bundle = ModelBundle(
        forward=lambda p, z, t: model.apply(p, z, t),
        encode=lambda p, z, t: model.apply(p, z, t, method=ADMUNet.encode),
        sigma=lambda v, f: head.apply(v, f),
        learn_epsvar=True,
        forward_and_encode=lambda p, z, t: model.apply(
            p, z, t, method="forward_and_encode"))
    sampler = get_sampler("ddim_simple_orig", 1000, steps,
                          sampler_var="learned", eta=0.85)
    nmin, nmax = set_norm_maxmin((res, res, 3), 0.0, 397.0)
    dcfg = DenoiseConfig(style="pred", norm_eps=True, refine_prior_sigma=True,
                         clip_fn="clamp", sigma_pred_threshold=960,
                         norm_max=nmax, norm_min=nmin)
    fn = build_denoise_fn(sampler, bundle, dcfg,
                          donate_x=spec.get("donate", False))
    seeds = jnp.arange(batch)
    xT = init_noise(sampler, seeds, (res, res, 3))

    rec = {"config": name, "batch": batch, "steps": steps,
           "skip_dtype": spec.get("skip_dtype") or "bf16",
           "donate_x": bool(spec.get("donate"))}
    if spec.get("mem_only"):
        lowered = jax.jit(
            lambda p, v, x, s: denoise_loop(
                sampler, bundle, dcfg, p, v, x, s)).lower(
            params, svars, xT, seeds)
        ma = lowered.compile().memory_analysis()
        for k in ("argument_size_in_bytes", "output_size_in_bytes",
                  "temp_size_in_bytes", "generated_code_size_in_bytes"):
            v = getattr(ma, k, None)
            if v is not None:
                rec[k] = int(v)
        rec["peak_gib"] = round(
            (rec.get("argument_size_in_bytes", 0)
             + rec.get("temp_size_in_bytes", 0)) / 2**30, 3)
    else:
        t0 = time.time()
        out, _ = fn(params, svars, xT, seeds)
        np.asarray(out)
        rec["compile_s"] = round(time.time() - t0, 1)
        times = []
        for _ in range(3):
            if spec.get("donate"):   # donated buffer: re-create the operand
                xT_i = init_noise(sampler, seeds, (res, res, 3))
                np.asarray(xT_i)     # materialize before the clock starts
            else:
                xT_i = xT
            t0 = time.time()
            out, _ = fn(params, svars, xT_i, seeds)
            np.asarray(out)
            times.append(time.time() - t0)
        dt = min(times)
        rec.update(s_per_batch=round(dt, 4),
                   ms_per_step=round(dt / steps * 1e3, 2),
                   img_per_s=round(batch / dt, 4),
                   all_times=[round(t, 4) for t in times])
    rec["platform"] = jax.devices()[0].platform
    if quick:
        print("QUICK_OK", json.dumps(rec), flush=True)
        return
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(HERE))
    main(sys.argv[1] if len(sys.argv) > 1 else "mem_b8")
