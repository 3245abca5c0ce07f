"""Multi-device training parity (VERDICT r3 #7).

An 8-device data-sharded train step must produce the same updated params as
the 1-device run on the same global batch — the training analogue of the
1-vs-4-device bit-identical sampling test. This is the property the rebuild
claims to *improve* over the reference, whose DDP sigma training runs under
no_sync() on every step and therefore never averages gradients across ranks
(/root/reference/src/experiments.py:682-694); here XLA's psum averages them,
so the result must be layout-invariant up to fp summation order.
"""
import numpy as np
import jax
import jax.numpy as jnp

from nlc_tpu.parallel.mesh import make_mesh, replicate, shard_batch


def _tree_max_diff(a, b):
    diffs = jax.tree_util.tree_map(
        lambda x, y: float(jnp.max(jnp.abs(x.astype(jnp.float32)
                                           - y.astype(jnp.float32)))), a, b)
    return max(jax.tree_util.tree_leaves(diffs))


def _run_on_mesh(train_step, mesh, state, frozen, batch, key, n_steps=2):
    state = replicate(mesh, state)
    frozen = replicate(mesh, frozen)
    fn = jax.jit(train_step)
    for _ in range(n_steps):
        state, metrics = fn(state, frozen, shard_batch(mesh, batch), key)
    return jax.device_get(state), float(metrics["loss"])


def test_sigma_train_step_device_count_invariant():
    from nlc_tpu.models.ddim_unet import DDIMUNet, DDIMUNetConfig
    from nlc_tpu.models.sigma_head import SigmaHead, sigma_head_for_unet
    from nlc_tpu.sched.schedules import make_noise_schedule
    from nlc_tpu.train import create_sigma_train_state, make_sigma_train_step
    from nlc_tpu.train.sigma_trainer import PerturbCoefficients

    cfg = DDIMUNetConfig(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
                         attn_resolutions=(8,), resolution=16)
    model = DDIMUNet(cfg)
    head = SigmaHead(sigma_head_for_unet(cfg.feat_shape))
    x0 = jnp.zeros((1, 16, 16, 3))
    frozen = jax.jit(model.init)(jax.random.PRNGKey(0), x0, jnp.zeros((1,)))
    svars = jax.jit(head.init)(jax.random.PRNGKey(1),
                               jnp.zeros((1,) + cfg.feat_shape))
    state0, _ = create_sigma_train_state(svars, lr=1e-2)
    # SGD, not the production AdamW: the attention k-bias gradient is
    # analytically zero (softmax is bias-invariant per query), so it is pure
    # fp roundoff, and Adam normalizes any roundoff to a full +/-lr step with
    # a layout-dependent sign. SGD keeps the comparison a direct test of
    # gradient layout-invariance, which is the property under test.
    import optax
    tx = optax.sgd(1e-2)
    state0 = state0.replace(opt_state=tx.init(state0.params))

    def encode_fn(p, z, t):
        return model.apply(p, z, t, method=DDIMUNet.encode)

    def sigma_apply(variables, feat, rngs=None):
        out, mut = head.apply(variables, feat, deterministic=False,
                              use_running_average=False, rngs=rngs,
                              mutable=["batch_stats"])
        return out, mut["batch_stats"]

    step = make_sigma_train_step(
        make_noise_schedule(100), encode_fn, sigma_apply, tx,
        perturb=PerturbCoefficients(0.05, 0.4, 0.1, 0.8))

    batch = jnp.asarray(np.random.RandomState(0).rand(8, 16, 16, 3) * 2 - 1,
                        jnp.float32)
    key = jax.random.PRNGKey(7)

    devs = jax.devices()
    assert len(devs) >= 8, "conftest should provide 8 virtual devices"
    s1, l1 = _run_on_mesh(step, make_mesh(devices=devs[:1]), state0, frozen,
                          batch, key)
    s8, l8 = _run_on_mesh(step, make_mesh(devices=devs[:8]), state0, frozen,
                          batch, key)

    assert np.isclose(l1, l8, rtol=1e-5, atol=1e-6), (l1, l8)
    # identical math, different reduction layouts: tight fp32 tolerance
    assert _tree_max_diff(s1.params, s8.params) < 1e-5
    assert _tree_max_diff(s1.ema_params, s8.ema_params) < 1e-5
    assert _tree_max_diff(s1.batch_stats, s8.batch_stats) < 1e-5


def test_edm_accum_train_step_device_count_invariant():
    from nlc_tpu.models.song_unet import SongUNet, SongUNetConfig, EDMPrecond
    from nlc_tpu.train.edm_training import (LOSSES, EDMLoopConfig,
                                            create_edm_train_state,
                                            make_edm_train_step)

    cfg = SongUNetConfig(img_resolution=8, model_channels=16, channel_mult=(1,),
                         num_blocks=1, attn_resolutions=(), dropout=0.0)
    model = SongUNet(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)),
                        jnp.ones((1,)))
    precond = EDMPrecond()

    def precond_apply(p, x, sigma, labels, aug, dk):
        return precond(lambda z, t: model.apply(p, z, t), x, sigma)

    loop_cfg = EDMLoopConfig(batch_size=16, num_accumulation_rounds=2,
                             lr=1e-3, lr_rampup_kimg=0)
    state0, tx = create_edm_train_state(params, loop_cfg)
    step = make_edm_train_step(LOSSES["edm"](), precond_apply, tx, loop_cfg)

    # (rounds, micro, H, W, C): the micro axis is the sharded batch axis
    images = jnp.asarray(np.random.RandomState(1).rand(2, 8, 8, 8, 3) * 2 - 1,
                         jnp.float32)
    labels = jnp.zeros((2, 8, 0), jnp.float32)
    key = jax.random.PRNGKey(3)

    def run(mesh):
        st = replicate(mesh, state0)
        fn = jax.jit(step)
        imgs = jax.device_put(
            images, jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec(None, "data")))
        labs = jax.device_put(
            labels, jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec(None, "data")))
        st, metrics = fn(st, imgs, labs, key)
        return jax.device_get(st), float(metrics["loss"])

    devs = jax.devices()
    s1, l1 = run(make_mesh(devices=devs[:1]))
    s8, l8 = run(make_mesh(devices=devs[:8]))

    assert np.isclose(l1, l8, rtol=1e-5, atol=1e-6), (l1, l8)
    assert _tree_max_diff(s1.params, s8.params) < 1e-5
    assert _tree_max_diff(s1.ema_params, s8.ema_params) < 1e-5
