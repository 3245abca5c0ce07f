"""Chip validation of the Pallas attention backward in a real training job.

VERDICT r2 #5: the flash-style Pallas backward (ops/attention.py) had only
been validated in interpret mode on CPU. This runs an actual ADM sigma-head
training job (the reference workload whose autograd it replaces —
/root/reference/src/unet_adm.py:1029-1083 head attention under
run_image_experiment.py training) twice on the current default device:

  1. default          — Pallas fwd + Pallas bwd (VMEM gate passes at 8x8 feat)
  2. NLC_DISABLE_PALLAS_ATTN=1 — XLA einsum fwd + autodiff recompute bwd

and compares the two loss trajectories step-for-step. The child process
prints its trajectory plus ops.attention.path_counts, so the parent can
assert the enabled run actually staged the Pallas backward (pallas_bwd > 0)
rather than silently falling back.

Usage: python benchmarks/attn_bwd_train.py [--steps N] [--batch B]
       [--platform cpu]   (CPU rehearsal: both runs take the XLA path,
                           trajectories must then be bit-identical)
Child mode (internal): --child prints one JSON line and exits.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def child(a) -> None:
    import numpy as np
    import jax
    if a.platform:
        jax.config.update("jax_platforms", a.platform)
    import jax.numpy as jnp

    from nlc_tpu.models.factory import create_sigma_eps_model
    from nlc_tpu.ops import attention as attn_mod
    from nlc_tpu.sched.schedules import make_noise_schedule
    from nlc_tpu.train.sigma_trainer import (PerturbCoefficients,
                                             create_sigma_train_state,
                                             make_sigma_train_step)

    size = 64
    unet, head, ucfg = create_sigma_eps_model(
        image_size=size, num_channels=64, num_res_blocks=1,
        sigma_block=2, dtype=jnp.float32)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(a.batch, size, size, 3), jnp.float32)
    t = jnp.zeros((a.batch,), jnp.float32)

    k = jax.random.PRNGKey(0)
    uvars = jax.jit(unet.init)(k, x, t)
    hvars = jax.jit(lambda k, f: head.init(k, f, deterministic=False,
                                           use_running_average=False))(
        k, jnp.zeros((1,) + ucfg.feat_shape))

    state, tx = create_sigma_train_state(hvars, lr=1e-4)
    schedule = make_noise_schedule(100)

    def encode_fn(frozen, z, tt):
        return unet.apply(frozen, z, tt, method=unet.encode)

    def sigma_apply(variables, f, rngs=None):
        out, mut = head.apply(variables, f, deterministic=False,
                              use_running_average=False,
                              rngs=rngs, mutable=["batch_stats"])
        return out, mut["batch_stats"]

    step = jax.jit(make_sigma_train_step(
        schedule, encode_fn, sigma_apply, tx,
        perturb=PerturbCoefficients(eta1_scale=0.1)))

    # single-backward gradient probe (no trainer stochasticity, no step
    # compounding): d/dparams sum(head(feat)^2) on a fixed feature map —
    # the parent compares this leaf-for-leaf between the Pallas and XLA
    # runs, which is the direct correctness check on the backward kernel.
    feat = jnp.asarray(rng.randn(a.batch, *ucfg.feat_shape), jnp.float32)

    def probe_loss(params):
        out = head.apply({**hvars, "params": params}, feat,
                         deterministic=True, use_running_average=True)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    grads = jax.jit(jax.grad(probe_loss))(hvars["params"])
    if a.grad_out:
        flat = {jax.tree_util.keystr(p): np.asarray(v, np.float32)
                for p, v in jax.tree_util.tree_flatten_with_path(grads)[0]}
        np.savez(a.grad_out, **flat)

    losses = []
    key = jax.random.PRNGKey(7)
    for i in range(a.steps):
        batch = jnp.asarray(rng.randn(a.batch, size, size, 3), jnp.float32)
        state, aux = step(state, uvars, batch, key)
        losses.append(float(np.asarray(aux["loss"])))  # host fetch fences
    print(json.dumps({
        "disabled": bool(os.environ.get("NLC_DISABLE_PALLAS_ATTN")),
        "platform": jax.devices()[0].platform,
        "losses": losses,
        "path_counts": attn_mod.path_counts,
    }), flush=True)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--platform", type=str, default=None)
    p.add_argument("--grad_out", type=str, default=None)
    p.add_argument("--child", action="store_true")
    a = p.parse_args()
    if a.child:
        child(a)
        return

    import numpy as np
    runs = {}
    for disable in (False, True):
        env = dict(os.environ)
        if disable:
            env["NLC_DISABLE_PALLAS_ATTN"] = "1"
        else:
            env.pop("NLC_DISABLE_PALLAS_ATTN", None)
        gout = f"/tmp/attn_bwd_grads_{'xla' if disable else 'pallas'}.npz"
        cmd = [sys.executable, os.path.abspath(__file__), "--child",
               "--steps", str(a.steps), "--batch", str(a.batch),
               "--grad_out", gout]
        if a.platform:
            cmd += ["--platform", a.platform]
        cp = subprocess.run(cmd, env=env, capture_output=True, text=True,
                            timeout=3600)
        line = [l for l in cp.stdout.splitlines() if l.startswith("{")]
        assert cp.returncode == 0 and line, (cp.returncode, cp.stderr[-2000:])
        runs[disable] = json.loads(line[-1])
        runs[disable]["grad_file"] = gout
        print("run", "xla" if disable else "default", "->",
              json.dumps({k: v for k, v in runs[disable].items()
                          if k != "grad_file"}), flush=True)

    on, off = runs[False], runs[True]
    assert off["path_counts"]["pallas_bwd"] == 0
    tpu = on["platform"] == "tpu"
    if tpu:
        # the enabled run must have staged the Pallas fwd AND bwd
        assert on["path_counts"]["pallas_bwd"] > 0, on["path_counts"]
        assert on["path_counts"]["pallas_fwd"] > 0, on["path_counts"]

    # (1) THE correctness check: one backward, leaf-for-leaf gradients.
    gp, gx = (np.load(on["grad_file"]), np.load(off["grad_file"]))
    assert set(gp.files) == set(gx.files)
    grad_rel = 0.0
    for kk in gp.files:
        scale = float(np.abs(gx[kk]).max()) or 1.0
        grad_rel = max(grad_rel, float(np.abs(gp[kk] - gx[kk]).max()) / scale)
    grad_tol = 1e-2 if tpu else 1e-12   # MXU rounding vs identical graphs

    # (2) sanity: 20 compounding optimizer steps stay on the same
    # trajectory. Kernel-order rounding (~1e-3/step) compounds chaotically
    # through Adam's sign-like step-1 updates, so this bound is loose by
    # design — the measured worst on the chip was 9.9e-3 (logs/r3) while
    # the single-backward gradients matched; 5% catches real divergence.
    lo, lx = on["losses"], off["losses"]
    worst = max(abs(p - q) / max(abs(q), 1e-8) for p, q in zip(lo, lx))
    traj_tol = 5e-2 if tpu else 1e-12
    print(json.dumps({
        "check": "pallas-attn-bwd-training",
        "platform": on["platform"],
        "pallas_bwd_staged": on["path_counts"]["pallas_bwd"],
        "grad_max_rel_diff": grad_rel,
        "steps": len(lo),
        "final_loss_pallas": lo[-1], "final_loss_xla": lx[-1],
        "worst_rel_step_diff": worst,
        "ok": bool(grad_rel < grad_tol and worst < traj_tol),
    }), flush=True)
    assert grad_rel < grad_tol, grad_rel
    assert worst < traj_tol, worst


if __name__ == "__main__":
    main()
