"""Chip throughput for the BASELINE.json workloads beyond the flagship.

VERDICT r3 #2: the perf record covered 2 of the driver's 5 named configs.
This harness measures the remaining three on the real chip, one cell per
process (compile state is fresh; ablation-free production code paths):

  celeba64        config 1: CelebA-64 DDIM UNet, 10-step NLC-DDIM, batch 4
                  (the BASELINE batch) — reference image_sample.py + the
                  celeba recipe (unet_simple backbone)
  celeba64_b64    same workload at batch 64 (throughput-optimal row)
  edm64_18 / _40  config 3: EDM Heun + NLC at 64^2 (SongUNet ffhq-64 class,
                  reference edm_image_sample.py:26 grids: 18 and 40 steps),
                  style 'pred_partial,pred', batch 64
  edm64_dhariwal  config 3 strict: ImageNet-64 DhariwalUNet (192ch,
                  class-conditional — the EDM ImageNet-64 network), 18 steps
  const_none      constrained-suite control: flagship 256^2 ADM loop without
                  a constraint, same process/timing discipline as the const_*
                  cells so the projection overhead subtraction is in-family
  const_sr4       config 4: 4x bicubic SR at 256^2 via SRConv SVD A_pinv
                  projection fused into the 50-step NLC loop
  const_inp       config 4: inpainting (random half mask) at 256^2
  const_deblur    config 5: deblur_gauss at 256^2
  const_color     config 5: colorization at 256^2
  const_cs        config 5: cs_walshhadamard at 256^2 (FWHT butterfly)
  sigma_train     config 5: sigma correction-net training step on the
                  flagship 256^2 ADM backbone (frozen encode + head fwd/bwd)

Timing discipline per CLAUDE.md: jitted whole-loop programs, host-fetch
fenced (np.asarray), >=3 repeats, min reported; no concurrent host work.
Appends one JSON line per cell to benchmarks/measurements/r4/workloads.jsonl.
"""
from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "measurements", "r4", "workloads.jsonl")
# NLC_WORKLOADS_QUICK=1: tiny-shape harness self-check (CPU) — verifies every
# cell builds/compiles/runs before chip time is spent; records are suppressed
QUICK = bool(os.environ.get("NLC_WORKLOADS_QUICK"))


def _record(rec):
    if QUICK:
        print("QUICK_OK", json.dumps(rec), flush=True)
        return
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def _time_loop(run, fetch, repeats=3):
    import numpy as np
    t0 = time.time()
    out = run()
    np.asarray(fetch(out))
    compile_s = time.time() - t0
    times = []
    for _ in range(repeats):
        t0 = time.time()
        out = run()
        np.asarray(fetch(out))
        times.append(time.time() - t0)
    return compile_s, times


# ---------------------------------------------------------------------------
# DDIM / ADM denoise-loop cells
# ---------------------------------------------------------------------------

def _ddim_celeba64(batch: int):
    import jax
    import jax.numpy as jnp
    from nlc_tpu.models.ddim_unet import DDIMUNet, DDIMUNetConfig
    from nlc_tpu.models.sigma_head import SigmaHead, sigma_head_for_unet
    from nlc_tpu.sched import get_sampler
    from nlc_tpu.engine import (DenoiseConfig, ModelBundle, build_denoise_fn,
                                init_noise)
    from nlc_tpu.engine.loops import set_norm_maxmin

    res, steps = 64, 10
    # the celeba recipe (reference store/config celeba.yml class:
    # ch 128, ch_mult [1,2,2,2,4], attn at 16)
    cfg = DDIMUNetConfig(ch=128, out_ch=3, ch_mult=(1, 2, 2, 2, 4),
                         num_res_blocks=2, attn_resolutions=(16,),
                         resolution=res)
    if QUICK:
        res, steps, batch = 32, 2, 2
        cfg = DDIMUNetConfig(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
                             attn_resolutions=(16,), resolution=res)
    model = DDIMUNet(cfg, dtype=jnp.bfloat16)
    head = SigmaHead(sigma_head_for_unet(cfg.feat_shape), dtype=jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, res, res, 3)), jnp.zeros((1,)))
    svars = jax.jit(head.init)(jax.random.PRNGKey(1),
                               jnp.zeros((1,) + cfg.feat_shape))
    bundle = ModelBundle(
        forward=lambda p, z, t: model.apply(p, z, t),
        encode=lambda p, z, t: model.apply(p, z, t, method=DDIMUNet.encode),
        sigma=lambda v, f: head.apply(v, f),
        learn_epsvar=False,
        forward_and_encode=lambda p, z, t: model.apply(
            p, z, t, method="forward_and_encode"))
    sampler = get_sampler("ddim_simple_orig", 1000, steps,
                          sampler_var="fixedsmall", eta=0.85)
    nmin, nmax = set_norm_maxmin((res, res, 3), 0.0, 89.0)
    dcfg = DenoiseConfig(style="pred", norm_eps=True, refine_prior_sigma=True,
                         clip_fn="clamp", sigma_pred_threshold=960,
                         norm_max=nmax, norm_min=nmin)
    fn = build_denoise_fn(sampler, bundle, dcfg, donate_x=False)
    seeds = jnp.arange(batch)
    xT = init_noise(sampler, seeds, (res, res, 3))
    compile_s, times = _time_loop(lambda: fn(params, svars, xT, seeds)[0],
                                  lambda o: o)
    dt = min(times)
    return {
        "cell": f"celeba64_b{batch}",
        "workload": "CelebA-64 DDIM UNet, 10-step NLC-DDIM (BASELINE config 1)",
        "model": "DDIM-UNet 64^2 ch128 mult(1,2,2,2,4)", "precision": "bf16",
        "batch": batch, "steps": steps, "style": "pred",
        "s_per_batch": round(dt, 4), "ms_per_step": round(dt / steps * 1e3, 2),
        "img_per_s": round(batch / dt, 3), "compile_s": round(compile_s, 1),
        "all_times": [round(t, 4) for t in times],
    }


def _adm256_constrained(constraint: str):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from nlc_tpu.models.adm_unet import ADMUNet, ADMUNetConfig, ADMSigmaHead
    from nlc_tpu.sched import get_sampler
    from nlc_tpu.engine import (DenoiseConfig, ModelBundle, build_denoise_fn,
                                init_noise)
    from nlc_tpu.engine.loops import set_norm_maxmin
    from nlc_tpu.operators import get_constraint_function

    res, steps = 256, 50
    batch = int(os.environ.get("NLC_BENCH_BATCH", "8"))
    quant = os.environ.get("NLC_BENCH_QUANT", "conv")
    quant = None if quant in ("", "bf16", "none") else quant
    cfg = ADMUNetConfig(image_size=res, model_channels=256, out_channels=6,
                        num_res_blocks=2, attention_resolutions=(8, 16, 32),
                        channel_mult=(1, 1, 2, 2, 4, 4), num_heads=4,
                        num_head_channels=64, use_scale_shift_norm=True,
                        resblock_updown=True, feat_layer=1,
                        quant_backend=quant)
    if QUICK:
        res, steps, batch = 64, 2, 2
        cfg = ADMUNetConfig(image_size=res, model_channels=32, out_channels=6,
                            num_res_blocks=1, attention_resolutions=(4,),
                            channel_mult=(1, 2, 2), num_heads=2,
                            num_head_channels=16, use_scale_shift_norm=True,
                            resblock_updown=True, feat_layer=1,
                            quant_backend=quant)
    model = ADMUNet(cfg, dtype=jnp.bfloat16)
    d, _, ch = cfg.feat_shape
    head = ADMSigmaHead(dim=d, channels=ch, n_blocks=2, dropout=0.0,
                        num_heads=4, num_head_channels=64, dtype=jnp.bfloat16)
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

    constrain_fn = constrain_loss = None
    op_build_s = 0.0
    if constraint != "none":
        t0 = time.time()
        cf = get_constraint_function(constraint, "svd", image_size=res,
                                     channels=3, fn_scale=4.0, seed=0)
        # synthetic ground truth in [-1,1]: throughput is content-independent
        x_true = jnp.asarray(np.random.RandomState(0)
                             .uniform(-1, 1, (batch, res, res, 3))
                             .astype(np.float32))
        y = jax.jit(cf.transform)(x_true)
        np.asarray(y)
        op_build_s = time.time() - t0
        constrain_fn = cf.make_constrain_fn(y)
        constrain_loss = lambda x0: cf.const_loss(cf.transform(x0), y)  # noqa: E731
    fn = build_denoise_fn(sampler, bundle, dcfg, constrain_fn=constrain_fn,
                          constrain_loss=constrain_loss, donate_x=False)
    seeds = jnp.arange(batch)
    xT = init_noise(sampler, seeds, (res, res, 3))
    compile_s, times = _time_loop(lambda: fn(params, svars, xT, seeds)[0],
                                  lambda o: o)
    dt = min(times)
    return {
        "cell": f"const_{constraint}",
        "workload": ("SVD-constrained 256^2 NLC restoration sampling "
                     "(BASELINE configs 4-5)" if constraint != "none" else
                     "unconstrained control, same harness"),
        "model": "ADM-UNet 256^2 552M", "constraint": constraint,
        "constraint_proj": "svd" if constraint != "none" else "none",
        "precision": f"int8-{quant}" if quant else "bf16",
        "batch": batch, "steps": steps, "style": "pred",
        "s_per_batch": round(dt, 4), "ms_per_step": round(dt / steps * 1e3, 2),
        "img_per_s": round(batch / dt, 3), "compile_s": round(compile_s, 1),
        "op_build_s": round(op_build_s, 2),
        "all_times": [round(t, 4) for t in times],
    }


# ---------------------------------------------------------------------------
# EDM Heun cells
# ---------------------------------------------------------------------------

def _edm64(num_steps: int, arch: str = "song"):
    import jax
    import jax.numpy as jnp
    from nlc_tpu.engine.edm import (EDMModelBundle, EDMSamplerConfig,
                                    build_edm_sampler)
    from nlc_tpu.models.song_unet import EDMPrecond

    res, batch = 64, int(os.environ.get("NLC_BENCH_EDM_BATCH", "64"))
    if QUICK:
        res, batch, num_steps = 32, 2, 2
    labels = None
    if arch == "dhariwal":
        from nlc_tpu.models.song_unet import (DhariwalUNet, DhariwalUNetConfig,
                                              EDMSigmaHead)
        # the EDM ImageNet-64 network: DhariwalUNet 192ch, class-conditional
        ucfg = DhariwalUNetConfig(img_resolution=res, label_dim=1000,
                                  model_channels=192, channel_mult=(1, 2, 3, 4),
                                  num_blocks=3, attn_resolutions=(32, 16, 8),
                                  dropout=0.0)
        if QUICK:
            ucfg = DhariwalUNetConfig(img_resolution=res, label_dim=10,
                                      model_channels=32, channel_mult=(1, 2),
                                      num_blocks=1, attn_resolutions=(16,),
                                      dropout=0.0)
        model = DhariwalUNet(ucfg, dtype=jnp.bfloat16)
        feat_shape = ucfg.feat_shape
        head = EDMSigmaHead(dim=feat_shape[0], channels=feat_shape[2],
                            n_blocks=2, dropout=0.0, dtype=jnp.bfloat16)
        labels = jax.nn.one_hot(jnp.arange(batch) % ucfg.label_dim,
                                ucfg.label_dim)
        enc_method, fae_method = DhariwalUNet.encode, "forward_and_encode"
        model_desc = "DhariwalUNet-64 ImageNet class-cond 296M"
    else:
        from nlc_tpu.models.factory import create_edm_sigma_eps_model
        model, head, ucfg = create_edm_sigma_eps_model(
            img_resolution=res,
            model_channels=32 if QUICK else 128,
            channel_mult=[1, 2] if QUICK else [1, 2, 2, 2],
            num_blocks=1 if QUICK else 4,
            attn_resolutions=[16], dropout=0.05, dtype=jnp.bfloat16)
        feat_shape = ucfg.feat_shape
        from nlc_tpu.models.song_unet import SongUNet
        enc_method, fae_method = SongUNet.encode, "forward_and_encode"
        model_desc = "SongUNet-64 ffhq class 62M"

    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, res, res, 3)), jnp.zeros((1,)),
        *(() if labels is None else (labels[:1],)))
    svars = jax.jit(head.init)(jax.random.PRNGKey(1),
                               jnp.zeros((1,) + feat_shape))
    if labels is None:
        fwd = lambda p, z, t: model.apply(p, z, t)                     # noqa: E731
        enc = lambda p, z, t: model.apply(p, z, t, method=enc_method)  # noqa: E731
        fae = lambda p, z, t: model.apply(p, z, t, method=fae_method)  # noqa: E731
    else:
        fwd = lambda p, z, t: model.apply(p, z, t, labels)             # noqa: E731
        enc = lambda p, z, t: model.apply(p, z, t, labels, method=enc_method)  # noqa: E731
        fae = lambda p, z, t: model.apply(p, z, t, labels, method=fae_method)  # noqa: E731
    bundle = EDMModelBundle(forward=fwd, encode=enc,
                            sigma=lambda v, f: head.apply(v, f),
                            precond=EDMPrecond(sigma_data=0.5),
                            forward_and_encode=fae)
    cfg = EDMSamplerConfig(num_steps=num_steps, style="pred_partial,pred",
                           refine_prior_sigma=False)
    fn = build_edm_sampler(bundle, cfg, (res, res, 3))
    seeds = jnp.arange(batch)
    compile_s, times = _time_loop(lambda: fn(params, svars, seeds),
                                  lambda o: o)
    dt = min(times)
    return {
        "cell": f"edm64_{arch}_{num_steps}",
        "workload": ("EDM Heun + NLC 64^2 sampling (BASELINE config 3); "
                     f"{num_steps}-step rho=7 grid, style pred_partial,pred"),
        "model": model_desc, "precision": "bf16",
        "batch": batch, "steps": num_steps,
        "nfe": 2 * num_steps - 1,
        "s_per_batch": round(dt, 4),
        "ms_per_step": round(dt / num_steps * 1e3, 2),
        "img_per_s": round(batch / dt, 3), "compile_s": round(compile_s, 1),
        "all_times": [round(t, 4) for t in times],
    }


# ---------------------------------------------------------------------------
# sigma-trainer step on the flagship backbone
# ---------------------------------------------------------------------------

def _sigma_train_adm256():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from nlc_tpu.models.adm_unet import ADMUNet, ADMUNetConfig, ADMSigmaHead
    from nlc_tpu.sched.schedules import make_noise_schedule
    from nlc_tpu.train.sigma_trainer import (PerturbCoefficients,
                                             create_sigma_train_state,
                                             make_sigma_train_step)

    res = 256
    batch = int(os.environ.get("NLC_BENCH_TRAIN_BATCH", "8"))
    cfg = ADMUNetConfig(image_size=res, model_channels=256, out_channels=6,
                        num_res_blocks=2, attention_resolutions=(8, 16, 32),
                        channel_mult=(1, 1, 2, 2, 4, 4), num_heads=4,
                        num_head_channels=64, use_scale_shift_norm=True,
                        resblock_updown=True, feat_layer=1)
    if QUICK:
        res, batch = 64, 2
        cfg = ADMUNetConfig(image_size=res, model_channels=32, out_channels=6,
                            num_res_blocks=1, attention_resolutions=(4,),
                            channel_mult=(1, 2, 2), num_heads=2,
                            num_head_channels=16, use_scale_shift_norm=True,
                            resblock_updown=True, feat_layer=1)
    model = ADMUNet(cfg, dtype=jnp.bfloat16)
    d, _, ch = cfg.feat_shape
    head = ADMSigmaHead(dim=d, channels=ch, n_blocks=2, dropout=0.0,
                        num_heads=4, num_head_channels=64, dtype=jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, res, res, 3)), jnp.zeros((1,)))
    svars = jax.jit(head.init)(jax.random.PRNGKey(1),
                               jnp.zeros((1,) + cfg.feat_shape))
    schedule = make_noise_schedule(1000, schedule="linear")
    state, tx = create_sigma_train_state(svars, lr=1e-4)

    def encode_fn(frozen, z, tt):
        return model.apply(frozen, z, tt, method=ADMUNet.encode)

    def sigma_apply(variables, f, rngs=None):
        out, mut = head.apply(variables, f, deterministic=False,
                              use_running_average=False, rngs=rngs,
                              mutable=["batch_stats"])
        return out, mut["batch_stats"]

    step_fn = make_sigma_train_step(schedule, encode_fn, sigma_apply, tx,
                                    loss_name="mae",
                                    perturb=PerturbCoefficients())
    # Timing discipline: the first capture of this cell fenced on
    # np.asarray({"loss": ...}) — numpy wraps a dict in an OBJECT array
    # without fetching device bytes, so it timed only the async dispatch
    # (3.5 ms "per step" on a 552M encode; physically impossible). Chain
    # K steps in one lax.scan — the state carry + a distinct batch per
    # iteration (and the key folded with state.step) keep every iteration
    # distinct so nothing hoists — and fence on the loss *array*.
    K = 2 if QUICK else 8
    xs = jnp.asarray(np.random.RandomState(0)
                     .uniform(-1, 1, (K, batch, res, res, 3)).astype(np.float32))
    key = jax.random.PRNGKey(42)

    @jax.jit
    def k_steps(st, frozen, xs):
        def body(c, xb):
            c2, metrics = step_fn(c, frozen, xb, key)
            return c2, metrics["loss"]
        _, losses = jax.lax.scan(body, st, xs)
        return losses

    def run():
        return k_steps(state, params, xs)

    compile_s, times = _time_loop(run, lambda o: o)
    dt = min(times) / K
    return {
        "cell": "sigma_train_adm256",
        "steps_chained": K,
        "workload": ("sigma correction-net training step on the 256^2 ADM "
                     "backbone (BASELINE config 5): frozen encode + head "
                     "fwd/bwd + adamw"),
        "model": "ADM-UNet 256^2 552M frozen + ADMSigmaHead",
        "precision": "bf16", "batch": batch,
        "s_per_step": round(dt, 4),
        "img_per_s": round(batch / dt, 3), "compile_s": round(compile_s, 1),
        "all_times": [round(t, 4) for t in times],
    }


CELLS = {
    "celeba64": lambda: _ddim_celeba64(4),
    "celeba64_b64": lambda: _ddim_celeba64(64),
    "edm64_18": lambda: _edm64(18, "song"),
    "edm64_40": lambda: _edm64(40, "song"),
    "edm64_dhariwal": lambda: _edm64(18, "dhariwal"),
    "const_none": lambda: _adm256_constrained("none"),
    "const_sr4": lambda: _adm256_constrained("sr_bicubic"),
    "const_inp": lambda: _adm256_constrained("inpainting_random"),
    "const_deblur": lambda: _adm256_constrained("deblur_gauss"),
    "const_color": lambda: _adm256_constrained("colorization"),
    "const_cs": lambda: _adm256_constrained("cs_walshhadamard"),
    "sigma_train": _sigma_train_adm256,
}


def main(name: str):
    if os.environ.get("NLC_BENCH_PLATFORM"):
        import jax
        jax.config.update("jax_platforms", os.environ["NLC_BENCH_PLATFORM"])
    rec = CELLS[name]()
    import jax
    rec["platform"] = jax.devices()[0].platform
    _record(rec)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(HERE))
    main(sys.argv[1] if len(sys.argv) > 1 else "celeba64")
