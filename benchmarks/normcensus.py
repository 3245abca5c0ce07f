"""Census of GroupNorm site executions in one flagship NLC-DDIM step.

Companion to benchmarks/normbw.py: that probe measures each norm-chain
shape STANDALONE on the chip; this script counts how many times each
(res, ch) shape executes per denoise step, so the standalone cells can be
summed into a predicted "norm chain at standalone rates" ms/step and
compared against the whole-loop ablation bucket (82.8 ms fused-era /
~80 ms bf16, docs/BENCHMARKS.md "The non-conv bucket, itemized"). The gap
between the two is loop-context cost (scheduling / lost cross-op fusion)
that no norm kernel can recover.

Pure host work: builds the flagship exactly as benchmarks/stepparts.py
does, then traces ONE step via jax.eval_shape under a flax method
interceptor — no FLOPs, no chip. The scan body traces once, so recorded
counts are per-step by construction (the style/sigma lax.conds in
engine/loops.py wrap scalar math only, never a model apply, so branch
double-tracing cannot inflate model-site counts).

Run: python benchmarks/normcensus.py [conv|bf16]
"""
import collections
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(quant_mode: str):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import flax.linen as nn
    import jax.numpy as jnp

    from nlc_tpu.models import layers
    from nlc_tpu.models.adm_unet import ADMUNet, ADMUNetConfig, ADMSigmaHead
    from nlc_tpu.sched import get_sampler
    from nlc_tpu.engine import DenoiseConfig, ModelBundle, build_denoise_fn
    from nlc_tpu.engine.loops import set_norm_maxmin

    quant = None if quant_mode == "bf16" else quant_mode
    res, batch, steps = 256, 8, 50
    cfg = ADMUNetConfig(image_size=res, model_channels=256, out_channels=6,
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
    params = jax.eval_shape(model.init, rng, jnp.zeros((1, res, res, 3)),
                            jnp.zeros((1,)))
    svars = jax.eval_shape(head.init, jax.random.PRNGKey(1),
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
    dcfg = DenoiseConfig(style="pred", norm_eps=True,
                         refine_prior_sigma=True, clip_fn="clamp",
                         sigma_pred_threshold=960, norm_max=nmax,
                         norm_min=nmin)
    fn = build_denoise_fn(sampler, bundle, dcfg, donate_x=False)

    counts = collections.Counter()

    def interceptor(next_fun, args, kwargs, context):
        if (isinstance(context.module, layers.GroupNorm)
                and context.method_name == "__call__"):
            x = args[0]
            fused = bool(kwargs.get("quant", False)
                         or kwargs.get("act") is not None
                         or kwargs.get("film_scale") is not None)
            if len(x.shape) == 4:
                key = (x.shape[1], x.shape[3],
                       "fused" if fused else "plain",
                       bool(kwargs.get("quant", False)))
            else:
                key = ("nonspatial", x.shape[-1], "plain", False)
            counts[key] += 1
        return next_fun(*args, **kwargs)

    xT = jax.ShapeDtypeStruct((batch, res, res, 3), jnp.float32)
    seeds = jax.ShapeDtypeStruct((batch,), jnp.int32)
    with nn.intercept_methods(interceptor):
        jax.eval_shape(fn, params, svars, xT, seeds)

    total = sum(counts.values())
    by_shape = collections.Counter()
    bytes_1pass = {}
    for (h, c, kind, q), n in counts.items():
        if h == "nonspatial":
            continue
        by_shape[(h, c)] += n
        bytes_1pass[(h, c)] = batch * h * h * c * 2
    rows = sorted(by_shape.items(),
                  key=lambda kv: -bytes_1pass[kv[0]] * kv[1])
    out = {
        "quant_mode": quant_mode, "batch": batch, "res": res,
        "total_site_execs_per_step": total,
        "per_shape": [{"res": h, "ch": c, "execs": n,
                       "mb_1pass": round(bytes_1pass[(h, c)] / 1e6, 1),
                       "traffic_share": round(
                           bytes_1pass[(h, c)] * n
                           / sum(bytes_1pass[s] * m
                                 for s, m in by_shape.items()), 4)}
                      for (h, c), n in rows],
        "detail": sorted(
            [{"key": f"{h}x{h}x{c}" if h != "nonspatial" else f"flat{c}",
              "kind": kind, "quant": q, "execs": n}
             for (h, c, kind, q), n in counts.items()],
            key=lambda r: -r["execs"]),
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "measurements", "r4", f"normcensus_{quant_mode}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "bf16")
