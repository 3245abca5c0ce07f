"""Itemize the flagship step's non-conv bucket (VERDICT r3 #1, phase 1).

Runs bench.py's exact workload — 50-step NLC-DDIM 256^2 ADM-UNet sampling,
B=8 — under component ablations (nlc_tpu/utils/ablate.py) and reports
s/step per config; the deltas attribute the ~45 ms/step of non-conv work
(docs/BENCHMARKS.md "Why the 5x target is out of reach") to GroupNorm
statistics, SiLU, attention, the int8 activation-absmax reduce, and the
NLC tap. Each config is one process (ablation flags are read at import):

  python benchmarks/stepparts.py baseline          # int8 'conv', style=pred
  python benchmarks/stepparts.py no_norm           # GroupNorm -> affine only
  python benchmarks/stepparts.py no_swish
  python benchmarks/stepparts.py no_attn
  python benchmarks/stepparts.py static_ascale     # pins int8 act scales
  python benchmarks/stepparts.py no_all            # all of the above
  python benchmarks/stepparts.py style_base        # no NLC tap (base style)
  python benchmarks/stepparts.py bf16 | bf16_no_norm | ...

Appends one JSON line per run to benchmarks/measurements/r4/stepparts.jsonl.
Timing discipline per CLAUDE.md: host-fetch fenced, whole-loop scan program
(no per-op dispatch), >=3 repeats.
"""
import json
import os
import sys
import time

CONFIGS = {
    "baseline":      {},
    "no_norm":       {"ablate": "norm"},
    "no_swish":      {"ablate": "swish"},
    "no_attn":       {"ablate": "attn"},
    "static_ascale": {"ablate": "dyn_ascale"},
    "no_all":        {"ablate": "norm,swish,attn,dyn_ascale"},
    "style_base":    {"style": "base"},
    # fused-era backend re-test (round 4): the round-2 whole-loop table
    # measured 'auto' losing to 'conv' (0.761 vs 0.777) because the Pallas
    # custom-call boundary un-fused the surrounding quantize/dequant work —
    # precisely what the fused norm epilogue now folds away (the producer
    # hands the conv a prequantized int8 pair). Re-measure both routings.
    "auto":          {"quant": "auto"},
    "conv_at64":     {"quant": "conv@64"},
    "bf16":          {"quant": "bf16"},
    "bf16_no_norm":  {"quant": "bf16", "ablate": "norm"},
    "bf16_no_swish": {"quant": "bf16", "ablate": "swish"},
    "bf16_no_attn":  {"quant": "bf16", "ablate": "attn"},
    "bf16_no_all":   {"quant": "bf16", "ablate": "norm,swish,attn"},
    "bf16_base":     {"quant": "bf16", "style": "base"},
}


def main(name: str):
    spec = CONFIGS[name]
    os.environ["NLC_ABLATE"] = spec.get("ablate", "")
    # import AFTER setting the flag (read at import of utils.ablate)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nlc_tpu.models.adm_unet import ADMUNet, ADMUNetConfig, ADMSigmaHead
    from nlc_tpu.sched import get_sampler
    from nlc_tpu.engine import DenoiseConfig, ModelBundle, build_denoise_fn, init_noise
    from nlc_tpu.engine.loops import set_norm_maxmin

    quant = spec.get("quant", "conv")
    quant = None if quant in ("bf16", "none") else quant
    res, batch, steps = 256, int(os.environ.get("NLC_BENCH_BATCH", "8")), 50
    quick = os.environ.get("NLC_STEPPARTS_QUICK")  # harness self-check (CPU)
    if quick:
        res, batch, steps = 64, 2, 4

    cfg = ADMUNetConfig(image_size=res, model_channels=64 if quick else 256,
                        out_channels=6,
                        num_res_blocks=2, attention_resolutions=(8, 16, 32),
                        channel_mult=(1, 1, 2, 2, 4, 4), num_heads=4,
                        num_head_channels=64, use_scale_shift_norm=True,
                        resblock_updown=True, feat_layer=1,
                        quant_backend=quant)
    model = ADMUNet(cfg, dtype=jnp.bfloat16)
    d, _, ch = cfg.feat_shape
    head = ADMSigmaHead(dim=d, channels=ch, n_blocks=2, dropout=0.0,
                        num_heads=4, num_head_channels=64, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    params = jax.jit(model.init)(rng, jnp.zeros((1, res, res, 3)), jnp.zeros((1,)))
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
    dcfg = DenoiseConfig(style=spec.get("style", "pred"), norm_eps=True,
                         refine_prior_sigma=True, clip_fn="clamp",
                         sigma_pred_threshold=960, norm_max=nmax, norm_min=nmin)
    fn = build_denoise_fn(sampler, bundle, dcfg, donate_x=False)

    seeds = jnp.arange(batch)
    xT = init_noise(sampler, seeds, (res, res, 3))

    t0 = time.time()
    out, _ = fn(params, svars, xT, seeds)
    np.asarray(out)
    compile_s = time.time() - t0
    times = []
    for _ in range(3):
        t0 = time.time()
        out, _ = fn(params, svars, xT, seeds)
        np.asarray(out)
        times.append(time.time() - t0)
    dt = min(times)
    tag = os.environ.get("NLC_STEPPARTS_TAG", "")
    rec = {
        "config": name + (f"@{tag}" if tag else ""), "quant": quant or "bf16",
        "style": spec.get("style", "pred"), "ablate": spec.get("ablate", ""),
        "batch": batch, "steps": steps,
        "s_per_batch": round(dt, 4), "ms_per_step": round(dt / steps * 1e3, 2),
        "img_per_s": round(batch / dt, 4), "compile_s": round(compile_s, 1),
        "all_times": [round(t, 4) for t in times],
    }
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "measurements", "r4", "stepparts.jsonl")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main(sys.argv[1] if len(sys.argv) > 1 else "baseline")
