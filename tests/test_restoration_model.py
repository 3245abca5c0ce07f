"""BasicSR model-wrapper parity: load-time key-diff report, best-metric
tracking, distributed-validation sharding + reduction
(reference base_model.py:227-289,331-356, image_restoration_model.py:256-381)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _opt(width=8, enc=(1,), middle=1, dec=(1,)):
    return {"network_g": {"type": "NAFNet", "width": width,
                          "enc_blk_nums": list(enc), "middle_blk_num": middle,
                          "dec_blk_nums": list(dec)},
            "train": {"pixel_opt": {"type": "PSNRLoss"},
                      "optim_g": {"lr": 1e-3}}}


def _mk(opt=None, seed=0):
    from nlc_tpu.restoration.model import RestorationModel
    model = RestorationModel(opt or _opt())
    state = model.init_state(jnp.zeros((1, 16, 16, 3)), seed=seed)
    return model, state


def test_load_network_key_diff_report(tmp_path):
    model, state = _mk()
    model.save(state, str(tmp_path), label="net_g")
    ckpt = str(tmp_path / f"net_g_{int(state.step)}")

    # same arch: clean strict load, empty report
    model2, state2 = _mk(seed=1)
    params, report = model2.load_network(state2.params, ckpt, strict=True)
    assert report == {"missing": [], "unexpected": [], "size_mismatch": []}
    a = jax.tree_util.tree_leaves(params)
    b = jax.tree_util.tree_leaves(state.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    # mismatched arch (extra encoder level + different width): report lists
    # both direction diffs and the size mismatches; strict raises
    model3, state3 = _mk(_opt(width=12, enc=(1, 1), dec=(1, 1)))
    with pytest.raises(ValueError):
        model3.load_network(state3.params, ckpt, strict=True)
    logs = []
    params3, report3 = model3.load_network(state3.params, ckpt, strict=False,
                                           log=logs.append)
    assert report3["missing"]          # keys only in the bigger net
    assert report3["size_mismatch"]    # width 12 vs 8 on shared keys
    text = "\n".join(logs)
    assert "Current net - loaded net:" in text
    assert "Size different, ignore [" in text
    # mismatched keys keep their current (init) values -> still finite run
    out = model3.test(params3, jnp.zeros((1, 16, 16, 3)))
    assert np.isfinite(np.asarray(out)).all()


def test_best_metric_tracking_across_history():
    from nlc_tpu.restoration.model import BestMetricTracker
    t = BestMetricTracker()
    hist = [
        (100, {"psnr": 20.0, "ssim": 0.70, "niqe": 9.0}),
        (200, {"psnr": 23.0, "ssim": 0.68, "niqe": 8.0}),   # psnr/niqe improve
        (300, {"psnr": 22.0, "ssim": 0.75, "niqe": 8.5}),   # ssim improves
    ]
    flags = [t.update(m, s) for s, m in hist]
    assert flags[0] == {"psnr": True, "ssim": True, "niqe": True}
    assert flags[1] == {"psnr": True, "ssim": False, "niqe": True}
    assert flags[2] == {"psnr": False, "ssim": True, "niqe": False}
    s = t.summary()
    assert s["psnr"] == {"value": 23.0, "iter": 200}
    assert s["ssim"] == {"value": 0.75, "iter": 300}
    assert s["niqe"] == {"value": 8.0, "iter": 200}   # lower is better


def test_validate_updates_best_and_returns_flags():
    model, state = _mk()
    rng = np.random.RandomState(0)
    batches = [(rng.rand(1, 16, 16, 3).astype(np.float32),
                rng.rand(1, 16, 16, 3).astype(np.float32)) for _ in range(2)]
    m1 = model.validate(state.params, iter(batches), step=10)
    assert m1["is_best"]["psnr"] is True
    m2 = model.validate(state.params, iter(batches), step=20)
    # identical params + data -> identical metrics -> not better
    assert m2["is_best"]["psnr"] is False
    assert m2["best"]["psnr"]["iter"] == 10


def test_validate_round_robin_sharding(monkeypatch):
    """Rank r of w must evaluate exactly the batches with idx % w == r, and
    the cross-process reduction must restore the full-set mean
    (image_restoration_model.py:272-273,358-368)."""
    import nlc_tpu.restoration.model as M
    model, state = _mk()
    rng = np.random.RandomState(1)
    batches = [(rng.rand(1, 16, 16, 3).astype(np.float32),
                rng.rand(1, 16, 16, 3).astype(np.float32)) for _ in range(5)]

    full = model.validate(state.params, iter(batches))

    world = 2
    rank_sums = {}
    real_sum = M._cross_process_sum

    for rank in range(world):
        monkeypatch.setattr(jax, "process_index", lambda r=rank: r)
        monkeypatch.setattr(jax, "process_count", lambda: world)
        captured = {}

        def fake_reduce(vals, _c=captured):
            _c["sums"] = np.asarray(vals).copy()
            return np.asarray(vals)      # local-only; combined below

        monkeypatch.setattr(M, "_cross_process_sum", fake_reduce)
        model.validate(state.params, iter(batches))
        rank_sums[rank] = captured["sums"]
    monkeypatch.setattr(M, "_cross_process_sum", real_sum)

    # rank 0 sees 3 batches, rank 1 sees 2
    assert rank_sums[0][2] == 3 and rank_sums[1][2] == 2
    total = rank_sums[0] + rank_sums[1]
    np.testing.assert_allclose(total[0] / total[2], full["psnr"], rtol=1e-12)
    np.testing.assert_allclose(total[1] / total[2], full["ssim"], rtol=1e-12)


def test_reduce_loss_dict_single_process():
    model, _ = _mk()
    out = model.reduce_loss_dict({"l_pix": np.float32(0.5),
                                  "l_perc": jnp.asarray([1.0, 3.0])})
    assert out == {"l_perc": 2.0, "l_pix": 0.5}
