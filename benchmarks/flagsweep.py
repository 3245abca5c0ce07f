"""XLA compiler-options sweep on the flagship step (round 4, post-closure).

Both round-4 whole-loop closures — the B>=16 regression (refuted as memory
pressure, attributed to XLA layout/scheduling at the large-spatial end) and
the residual norm bucket (~25-40 ms of loop-context scheduling no kernel can
touch) — point at the same knob: XLA's own scheduling/fusion decisions. This
probes the few documented TPU compiler options that move those decisions,
on bench.py's exact workload (50-step NLC-DDIM 256^2 ADM, B=8, int8 'auto'
+ fused epilogues):

  python benchmarks/flagsweep.py baseline | vmem32 | vmem64 | vmem96 | nolhs

Options are passed per-compile via jit(...).lower(...).compile(
compiler_options=...) — NOT the XLA_FLAGS env var, which the tunneled axon
backend does not forward to the remote compiler. Unknown-option failures are
recorded as rows (rc="compile_error"), not crashes. One process per cell;
host-fetch-fenced min-of-3 timing per CLAUDE.md.

Appends to benchmarks/measurements/r4/flagsweep.jsonl.
"""
import json
import os
import sys
import time

CONFIGS = {
    "baseline": {},
    # the Pallas epilogue/quant kernels tile for the default 16 MB scoped
    # vmem; raising the budget changes both Mosaic tiling and XLA fusion
    # sizing at the large-spatial end
    "vmem32": {"xla_tpu_scoped_vmem_limit_kib": "32768"},
    "vmem64": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    "vmem96": {"xla_tpu_scoped_vmem_limit_kib": "98304"},
    # latency-hiding scheduler off: tests whether its (collective-oriented)
    # reordering is what degrades the single-chip large-spatial schedule
    "nolhs": {"xla_tpu_enable_latency_hiding_scheduler": "false"},
}


def main(name: str):
    opts = CONFIGS[name]
    import jax
    if os.environ.get("NLC_FLAGSWEEP_QUICK"):
        # shell-level JAX_PLATFORMS does not stick on this image (CLAUDE.md)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from nlc_tpu.models.adm_unet import ADMUNet, ADMUNetConfig, ADMSigmaHead
    from nlc_tpu.sched import get_sampler
    from nlc_tpu.engine import (DenoiseConfig, ModelBundle, build_denoise_fn,
                                init_noise)
    from nlc_tpu.engine.loops import set_norm_maxmin

    res, batch, steps = 256, 8, 50
    quant = "auto"
    if os.environ.get("NLC_FLAGSWEEP_QUICK"):  # harness self-check (CPU)
        res, batch, steps = 64, 2, 4

    cfg = ADMUNetConfig(image_size=res,
                        model_channels=64 if res == 64 else 256,
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
    params = jax.jit(model.init)(rng, jnp.zeros((1, res, res, 3)),
                                 jnp.zeros((1,)))
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
    dcfg = DenoiseConfig(style="pred", norm_eps=True,
                         refine_prior_sigma=True, clip_fn="clamp",
                         sigma_pred_threshold=960, norm_max=nmax,
                         norm_min=nmin)
    fn = build_denoise_fn(sampler, bundle, dcfg, donate_x=False)

    seeds = jnp.arange(batch)
    xT = init_noise(sampler, seeds, (res, res, 3))

    rec = {"config": name, "options": opts, "quant": quant, "batch": batch,
           "steps": steps}
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "measurements", "r4", "flagsweep.jsonl")
    if os.environ.get("NLC_FLAGSWEEP_QUICK"):  # keep CPU self-checks out
        out_path = "/tmp/flagsweep_quick.jsonl"
    os.makedirs(os.path.dirname(out_path), exist_ok=True)

    t0 = time.time()
    try:
        compiled = fn.lower(params, svars, xT, seeds).compile(
            compiler_options=opts or None)
    except Exception as e:  # unknown option, remote reject — record and exit
        rec["rc"] = "compile_error"
        rec["error"] = repr(e)[:300]
        with open(out_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)
        return
    out, _ = compiled(params, svars, xT, seeds)
    np.asarray(out)
    rec["compile_s"] = round(time.time() - t0, 1)

    times = []
    for _ in range(3):
        t0 = time.time()
        out, _ = compiled(params, svars, xT, seeds)
        np.asarray(out)
        times.append(time.time() - t0)
    dt = min(times)
    rec.update(rc="ok", s_per_batch=round(dt, 4),
               ms_per_step=round(dt / steps * 1e3, 2),
               img_per_s=round(batch / dt, 4),
               all_times=[round(t, 4) for t in times])
    with open(out_path, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    main(sys.argv[1] if len(sys.argv) > 1 else "baseline")
