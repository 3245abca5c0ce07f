"""Multi-process dry run: execute the real rank>0 branches.

The single-process virtual mesh (tests/conftest.py) never runs the
multi-host code paths — host-sharded data loading (`host_local_batch`),
primary-host I/O guards (`is_primary`), the cross-process metric reduction
in restoration validation, and checkpoint write/read across a process
barrier. This module spawns a real N-process JAX CPU cluster
(`jax.distributed.initialize`, the counterpart of the reference's three
bootstraps — src/dist_util.py:21-45, torch_utils/distributed.py:14-32,
basicsr/utils/dist_util.py:17-64) and drives all of them:

  * per-process data sharding feeding a global-mesh DP sigma-trainer step
    (reference src/image_dataset.py:66-70 rank sharding + experiments.py
    :645-686 DDP training),
  * restoration dist-validation with round-robin batch sharding and the
    all-gather metric reduce (image_restoration_model.py:256-381),
  * reduce_loss_dict across ranks (base_model.py:331-356),
  * rank-0 checkpoint write + barrier + rank-1 read-back
    (experiments.py:238-252 save_checkpoint with dist.barrier()).

`launch()` is the driver entry (used by __graft_entry__.dryrun_multichip and
tests); `python -m nlc_tpu.parallel.multiprocess --process_id K ...` is the
worker.
"""
from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys


def _worker(process_id: int, num_processes: int, port: int) -> dict:
    import jax
    jax.config.update("jax_platforms", "cpu")

    from .mesh import (init_distributed, make_mesh, data_sharding,
                       replicate, is_primary, host_local_batch)
    init_distributed(coordinator=f"localhost:{port}",
                     num_processes=num_processes, process_id=process_id)
    assert jax.process_count() == num_processes, jax.process_count()

    import numpy as np
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    out = {"process_id": jax.process_index(),
           "process_count": jax.process_count(),
           "local_devices": jax.local_device_count(),
           "global_devices": jax.device_count()}

    mesh = make_mesh(("data",))
    global_batch = 2 * jax.device_count()

    # ---- host-sharded data loading (rank-strided indices, each process
    # materializes only its shard) feeding a global DP train step ----
    from ..models.ddim_unet import DDIMUNet, DDIMUNetConfig
    from ..models.sigma_head import SigmaHead, sigma_head_for_unet
    from ..sched import get_sampler
    from ..train import create_sigma_train_state, make_sigma_train_step
    from ..train.sigma_trainer import PerturbCoefficients

    cfg = DDIMUNetConfig(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
                         attn_resolutions=(8,), resolution=16)
    model = DDIMUNet(cfg)
    head = SigmaHead(sigma_head_for_unet(cfg.feat_shape))
    x0 = jnp.zeros((1, 16, 16, 3))
    params = replicate(mesh, model.init(jax.random.PRNGKey(0), x0,
                                        jnp.zeros((1,))))
    svars = head.init(jax.random.PRNGKey(1),
                      jnp.zeros((1,) + cfg.feat_shape))
    sampler = get_sampler("ddim_simple_orig", 1000, 4, sigma_style="Linear",
                          sampler_var="fixedsmall")
    state, tx = create_sigma_train_state(svars, lr=1e-4)
    state = replicate(mesh, state)

    indices = np.arange(global_batch)
    local_idx = host_local_batch(indices)
    out["local_index_count"] = int(len(local_idx))
    # synthesize "the process's file shard" deterministically from indices
    local_imgs = np.stack([
        np.random.RandomState(1000 + i).randn(16, 16, 3).astype(np.float32)
        for i in local_idx])
    # interleaved host shards -> one global array on the data mesh
    global_x = multihost_utils.host_local_array_to_global_array(
        local_imgs, mesh, jax.sharding.PartitionSpec("data"))

    def encode_fn(p, z, t):
        return model.apply(p, z, t, method=DDIMUNet.encode)

    def sigma_apply(variables, feat, rngs=None):
        o, mut = head.apply(variables, feat, deterministic=False,
                            use_running_average=False, rngs=rngs,
                            mutable=["batch_stats"])
        return o, mut["batch_stats"]

    train_step = make_sigma_train_step(
        sampler.schedule, encode_fn, sigma_apply, tx, loss_name="mse",
        perturb=PerturbCoefficients(0.0, 0.1, 0.0, 0.1))
    state, metrics = jax.jit(train_step)(state, params, global_x,
                                         jax.random.PRNGKey(2))
    # the loss is computed over the global batch inside jit -> fully
    # replicated, hence addressable on every process
    loss = float(metrics["loss"])
    assert np.isfinite(loss), loss
    out["sigma_train_loss"] = loss

    # ---- restoration dist-validation: round-robin sharding + all-gather
    # metric reduce; all ranks must agree on the global means ----
    from ..restoration.model import RestorationModel
    ropt = {"network_g": {"type": "NAFNet", "width": 8, "middle_blk_num": 1,
                          "enc_blk_nums": [1], "dec_blk_nums": [1]},
            "train": {"optim_g": {"lr": 1e-3},
                      "pixel_opt": {"type": "PSNRLoss"}}}
    rmodel = RestorationModel(ropt)
    rstate = rmodel.init_state(jnp.zeros((1, 16, 16, 3)))
    rngv = np.random.RandomState(7)
    batches = [(rngv.rand(1, 16, 16, 3).astype(np.float32),
                rngv.rand(1, 16, 16, 3).astype(np.float32)) for _ in range(5)]
    vmetrics = rmodel.validate(rstate.params, iter(batches), step=1)
    agreed = multihost_utils.process_allgather(
        np.asarray([vmetrics["psnr"], vmetrics["ssim"]]))
    agreed = np.asarray(agreed).reshape(num_processes, 2)
    assert np.allclose(agreed, agreed[0]), agreed
    out["val_psnr"] = float(vmetrics["psnr"])
    out["val_ssim"] = float(vmetrics["ssim"])
    out["val_is_best"] = bool(vmetrics["is_best"]["psnr"])

    reduced = rmodel.reduce_loss_dict(
        {"l_pix": np.float64(jax.process_index() + 1.0)})
    # mean over ranks of (1, 2, ..) = (n+1)/2
    assert abs(reduced["l_pix"] - (num_processes + 1) / 2) < 1e-9, reduced
    out["reduce_loss_ok"] = True

    # ---- cross-process checkpoint write (orbax saves are collective in
    # multihost mode: every rank calls save, orbax elects the writer and
    # barriers internally — the counterpart of rank-0 torch.save +
    # dist.barrier(), experiments.py:238-252) ----
    from ..io.checkpoints import save_pytree, load_pytree
    ckpt_dir = os.environ.get("NLC_MP_CKPT_DIR", "/tmp/nlc_mp_ckpt")
    ckpt = os.path.join(ckpt_dir, "state")
    os.makedirs(ckpt_dir, exist_ok=True)
    save_pytree({"w": np.arange(8, dtype=np.float32),
                 "step": np.asarray(3)}, ckpt)
    # orbax releases non-primary ranks before the primary commits the final
    # rename; fence before cross-rank read-back
    multihost_utils.sync_global_devices("nlc_mp_ckpt_committed")
    back = load_pytree(ckpt)               # every rank reads it back
    assert int(back["step"]) == 3
    out["ckpt_roundtrip"] = True

    # ---- primary-host plain-file IO (is_primary guard) + explicit barrier,
    # then every rank reads what rank 0 wrote ----
    marker = os.path.join(ckpt_dir, "results.json")
    if is_primary():
        with open(marker, "w") as f:
            json.dump({"train_loss": loss, "writer": jax.process_index()}, f)
    multihost_utils.sync_global_devices("nlc_mp_primary_io")
    with open(marker) as f:
        seen = json.load(f)
    assert seen["writer"] == 0, seen
    out["primary_io_ok"] = True
    out["is_primary"] = bool(is_primary())
    return out


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def launch(num_processes: int = 2, local_devices: int = 4,
           timeout: float = 600.0) -> dict:
    """Spawn the N-process CPU cluster and collect per-rank result JSON.

    Returns {"process_count": N, "ranks": [rank0_dict, ...], "ok": bool}.
    """
    repo_root = os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    port = _free_port()
    import re
    env = dict(os.environ)
    kept = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                  env.get("XLA_FLAGS", "")).strip()
    env["XLA_FLAGS"] = (
        kept + f" --xla_force_host_platform_device_count={local_devices}"
    ).strip()
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("NLC_MP_CKPT_DIR",
                   os.path.join("/tmp", f"nlc_mp_ckpt_{port}"))
    procs = [subprocess.Popen(
        [sys.executable, "-m", "nlc_tpu.parallel.multiprocess",
         "--process_id", str(i), "--num_processes", str(num_processes),
         "--port", str(port)],
        cwd=repo_root, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for i in range(num_processes)]
    ranks, ok = [None] * num_processes, True
    for i, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            ok = False
        if p.returncode != 0:
            ok = False
        for line in out.splitlines():
            if line.startswith("NLC_MP_RESULT "):
                ranks[i] = json.loads(line[len("NLC_MP_RESULT "):])
        if ranks[i] is None:
            ok = False
            ranks[i] = {"error": out[-2000:]}
    return {"process_count": num_processes, "local_devices": local_devices,
            "ranks": ranks, "ok": ok}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--process_id", type=int, required=True)
    p.add_argument("--num_processes", type=int, required=True)
    p.add_argument("--port", type=int, required=True)
    args = p.parse_args(argv)
    result = _worker(args.process_id, args.num_processes, args.port)
    print("NLC_MP_RESULT " + json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
