"""Real multi-process execution: 2 JAX processes x 2 virtual CPU devices,
exercising the rank>0 branches (host-sharded loading, cross-process metric
reduction, collective orbax checkpointing, primary-host IO) that the
single-process virtual mesh can't reach."""
import numpy as np


def test_two_process_cluster_runs_rank_branches():
    from nlc_tpu.parallel.multiprocess import launch

    r = launch(num_processes=2, local_devices=2, timeout=420)
    assert r["ok"], r
    assert r["process_count"] == 2
    r0, r1 = r["ranks"]
    assert r0["is_primary"] and not r1["is_primary"]
    assert r0["global_devices"] == 4 == r1["global_devices"]
    # host-sharded loading: each process materialized half the global batch
    assert r0["local_index_count"] == r1["local_index_count"] == 4
    # identical global train loss on both controllers (replicated output)
    assert np.isfinite(r0["sigma_train_loss"])
    assert r0["sigma_train_loss"] == r1["sigma_train_loss"]
    # dist-validation reduction agreed across ranks
    assert r0["val_psnr"] == r1["val_psnr"]
    assert r0["val_ssim"] == r1["val_ssim"]
    assert r0["reduce_loss_ok"] and r1["reduce_loss_ok"]
    # collective checkpoint + primary-host file IO reached both ranks
    assert r0["ckpt_roundtrip"] and r1["ckpt_roundtrip"]
    assert r0["primary_io_ok"] and r1["primary_io_ok"]
