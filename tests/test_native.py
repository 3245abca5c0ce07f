"""Native C++ image loader + precision utilities tests."""
import os

import numpy as np
import pytest
from PIL import Image

from nlc_tpu.native import native_available, load_batch


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    paths = []
    for i, ext in enumerate(["png", "jpg", "png"]):
        arr = (rng.rand(48 + i, 56, 3) * 255).astype(np.uint8)
        p = d / f"img{i}.{ext}"
        Image.fromarray(arr).save(p, quality=95)
        paths.append(str(p))
    return d, paths


@pytest.mark.skipif(not native_available(), reason="no native toolchain")
def test_native_loader(image_dir):
    d, paths = image_dir
    imgs, ok = load_batch(paths, 32, random_crop=False, seed=0)
    assert imgs.shape == (3, 32, 32, 3)
    assert ok.all()
    assert -1.0 <= imgs.min() and imgs.max() <= 1.0
    # deterministic
    imgs2, _ = load_batch(paths, 32, random_crop=False, seed=0)
    np.testing.assert_array_equal(imgs, imgs2)
    # random crop differs by seed
    a, _ = load_batch(paths, 16, random_crop=True, seed=1)
    b, _ = load_batch(paths, 16, random_crop=True, seed=2)
    assert not np.array_equal(a, b)
    # bad path flagged, not crashed
    imgs3, ok3 = load_batch(paths + [str(d / "nope.png")], 16)
    assert ok3[:3].all() and not ok3[3]


@pytest.mark.skipif(not native_available(), reason="no native toolchain")
def test_training_pipeline_uses_native(image_dir, monkeypatch):
    d, paths = image_dir
    from nlc_tpu.data.train_data import load_training_data
    it = load_training_data(str(d), batch_size=2, image_size=16, seed=0,
                            shard=0, num_shards=1)
    imgs, labels = next(it)
    assert imgs.shape == (2, 16, 16, 3)
    assert np.isfinite(imgs).all()


def test_dynamic_loss_scale():
    import jax.numpy as jnp
    from nlc_tpu.utils.precision import DynamicLossScale, apply_updates_if_finite
    s = DynamicLossScale.create(initial_lg_scale=10.0)
    grads = {"w": jnp.ones(3)}
    finite, s2 = s.check_and_update(grads)
    assert bool(finite)
    assert float(s2.lg_scale) == pytest.approx(10.0 + 1e-3)
    bad = {"w": jnp.asarray([1.0, jnp.nan, 2.0])}
    finite, s3 = s2.check_and_update(bad)
    assert not bool(finite)
    assert float(s3.lg_scale) == pytest.approx(float(s2.lg_scale) - 1.0)
    # step skipping
    params = {"w": jnp.zeros(3)}
    out = apply_updates_if_finite(params, {"w": jnp.ones(3)}, jnp.asarray(False))
    np.testing.assert_array_equal(np.asarray(out["w"]), 0.0)
    out = apply_updates_if_finite(params, {"w": jnp.ones(3)}, jnp.asarray(True))
    np.testing.assert_array_equal(np.asarray(out["w"]), 1.0)


def test_native_png_writer_roundtrip(tmp_path):
    from nlc_tpu.native import native_available, save_batch_png
    if not native_available():
        import pytest
        pytest.skip("native lib unavailable")
    from PIL import Image
    rng = np.random.RandomState(0)
    imgs = (rng.rand(3, 17, 23, 3) * 255).astype(np.uint8)
    paths = [str(tmp_path / f"{i}.png") for i in range(3)]
    assert save_batch_png(imgs, paths) == 3
    for i, p in enumerate(paths):
        np.testing.assert_array_equal(np.asarray(Image.open(p)), imgs[i])


def test_load_training_data_rejects_sub_batch_dataset(tmp_path):
    """Fewer shard-local images than one batch: both batch loops drop
    partial batches (reference drop_last semantics), so the infinite epoch
    loop would busy-spin without ever yielding — must raise instead."""
    import numpy as np
    import pytest
    from PIL import Image
    from nlc_tpu.data.train_data import load_training_data
    for i in range(3):
        Image.fromarray((np.random.RandomState(i).rand(16, 16, 3) * 255)
                        .astype(np.uint8)).save(tmp_path / f"{i}.png")
    with pytest.raises(ValueError, match="batch_size"):
        next(load_training_data(str(tmp_path), batch_size=8, image_size=16,
                                shard=0, num_shards=1))
    # and exactly one batch once enough files exist
    for i in range(3, 8):
        Image.fromarray((np.random.RandomState(i).rand(16, 16, 3) * 255)
                        .astype(np.uint8)).save(tmp_path / f"{i}.png")
    imgs, labels = next(load_training_data(str(tmp_path), batch_size=8,
                                           image_size=16, shard=0,
                                           num_shards=1))
    assert imgs.shape == (8, 16, 16, 3)


def test_native_paired_loader_alignment(tmp_path):
    """nlc_load_paired_batch (native/image_loader.cpp): lq and gt must get
    the SAME crop offset (scaled) and the SAME flip/rot draw — coordinate-
    encoded images make misalignment visible as a nonzero channel diff.
    Also: deterministic per seed, and the restoration [0,1] range."""
    import numpy as np
    from PIL import Image
    from nlc_tpu.native import native_available, load_paired_batch
    if not native_available():
        import pytest
        pytest.skip("native toolchain unavailable")
    H = W = 48
    yy, xx = np.mgrid[0:H * 2, 0:W * 2]
    gt = np.stack([yy // 2, xx // 2, np.zeros_like(yy)], -1).astype(np.uint8)
    lq = np.stack([yy[:H, :W], xx[:H, :W], np.full((H, W), 7)],
                  -1).astype(np.uint8)
    Image.fromarray(gt).save(tmp_path / "a_gt.png")
    Image.fromarray(lq).save(tmp_path / "a_lq.png")
    lqb, gtb, ok = load_paired_batch(
        [str(tmp_path / "a_lq.png")], [str(tmp_path / "a_gt.png")],
        16, 2, use_flip=True, use_rot=True, seed=3)
    assert ok.all()
    assert lqb.shape == (1, 16, 16, 3) and gtb.shape == (1, 32, 32, 3)
    assert lqb.min() >= 0.0 and lqb.max() <= 1.0
    # gt's coordinate channels, downsampled 2x, must equal lq's exactly
    err = np.abs(gtb[0][::2, ::2, :2] - lqb[0][..., :2]).max() * 255
    assert err < 1.0, err
    lqb2, gtb2, _ = load_paired_batch(
        [str(tmp_path / "a_lq.png")], [str(tmp_path / "a_gt.png")],
        16, 2, use_flip=True, use_rot=True, seed=3)
    assert np.array_equal(lqb, lqb2) and np.array_equal(gtb, gtb2)


def test_paired_loader_native_path_matches_semantics(tmp_path):
    """paired_loader(native=True) must yield batches with the same shapes,
    range and pairing property as the per-item PIL path, and fall back
    cleanly when a member can't decode natively."""
    import numpy as np
    from PIL import Image
    from nlc_tpu.restoration.data import PairedImageDataset, paired_loader
    gt_dir, lq_dir = tmp_path / "gt", tmp_path / "lq"
    gt_dir.mkdir(); lq_dir.mkdir()
    rng = np.random.RandomState(0)
    for i in range(4):
        img = (rng.rand(40, 40, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(gt_dir / f"{i}.png")
        Image.fromarray(255 - img).save(lq_dir / f"{i}.png")
    ds = PairedImageDataset(dataroot_gt=str(gt_dir), dataroot_lq=str(lq_dir),
                            gt_size=16, scale=1, phase="train")
    lq, gt = next(paired_loader(ds, 4, native=True))
    assert lq.shape == gt.shape == (4, 16, 16, 3)
    assert lq.dtype == np.float32 and 0.0 <= lq.min() and lq.max() <= 1.0
    # pairing property of this dataset: lq == 1 - gt at every pixel, which
    # survives only if crop+augment were applied identically to both
    np.testing.assert_allclose(lq, 1.0 - gt, atol=2 / 255)
    # python path yields the same invariant
    lq2, gt2 = next(paired_loader(ds, 4, native=False))
    np.testing.assert_allclose(lq2, 1.0 - gt2, atol=2 / 255)


def test_paired_loader_uint8_mode_equivalence(tmp_path):
    """uint8 native batches must carry the same pixels as float32 ones
    (just unscaled), and RestorationModel.train_step must produce the
    same loss from either dtype — the /255 moves on-device, not away."""
    import numpy as np
    import jax
    from PIL import Image
    from nlc_tpu.restoration.data import PairedImageDataset, paired_loader
    from nlc_tpu.native import native_available
    if not native_available():
        import pytest
        pytest.skip("native toolchain unavailable")
    gt_dir, lq_dir = tmp_path / "gt", tmp_path / "lq"
    gt_dir.mkdir(); lq_dir.mkdir()
    rng = np.random.RandomState(1)
    for i in range(4):
        img = (rng.rand(24, 24, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(gt_dir / f"{i}.png")
        Image.fromarray(255 - img).save(lq_dir / f"{i}.png")
    ds = PairedImageDataset(dataroot_gt=str(gt_dir), dataroot_lq=str(lq_dir),
                            gt_size=16, scale=1, phase="train")
    lq8, gt8 = next(paired_loader(ds, 4, native_dtype="uint8"))
    assert lq8.dtype == np.uint8
    lqf, gtf = next(paired_loader(ds, 4, native_dtype="float32"))
    # same seeds -> same crops/draws -> identical pixels modulo scaling
    np.testing.assert_allclose(lq8 / 255.0, lqf, atol=1e-6)
    np.testing.assert_allclose(gt8 / 255.0, gtf, atol=1e-6)

    from nlc_tpu.restoration.model import RestorationModel
    opt = {"name": "t", "manual_seed": 0,
           "network_g": {"type": "NAFNet", "width": 4, "middle_blk_num": 1,
                         "enc_blk_nums": [1], "dec_blk_nums": [1]},
           "train": {"total_iter": 2, "pixel_opt": {"type": "PSNRLoss"},
                     "optim_g": {"lr": 1e-3},
                     "scheduler": {"type": "LinearLR", "total_iter": 2}},
           "path": {}}
    import jax.numpy as jnp
    model = RestorationModel(opt)
    state = model.init_state(jnp.zeros((1, 16, 16, 3)))
    k = jax.random.PRNGKey(0)
    _, loss8 = model.train_step(state, jnp.asarray(lq8), jnp.asarray(gt8), k)
    model2 = RestorationModel(opt)
    state2 = model2.init_state(jnp.zeros((1, 16, 16, 3)))
    _, lossf = model2.train_step(state2, jnp.asarray(lqf), jnp.asarray(gtf), k)
    np.testing.assert_allclose(float(loss8), float(lossf), rtol=1e-5)
