"""LSUN eval-dataset over LMDB: round trip through the in-repo LmdbWriter +
LsunLmdbDataset (reference datasets/lsun.py LSUNClass + datasets/__init__.py
LSUN branch semantics)."""
import io
import os
import pickle

import numpy as np
import pytest
from PIL import Image

from nlc_tpu.restoration.lmdb_lite import LmdbWriter


def _make_lsun_lmdb(root, n=6, size=48, seed=0):
    """LSUN-style environment: webp-encoded images keyed by opaque ids."""
    rng = np.random.RandomState(seed)
    os.makedirs(os.path.dirname(root), exist_ok=True)
    originals = {}
    with LmdbWriter(root) as w:
        for i in range(n):
            arr = (rng.rand(size + 8 * i, size, 3) * 255).astype(np.uint8)
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="PNG")
            key = f"{i:08d}aabb".encode()
            w.put(key, buf.getvalue())
            originals[key] = arr
    return originals


def test_lsun_lmdb_dataset_round_trip(tmp_path):
    from nlc_tpu.data.eval_datasets import LsunLmdbDataset

    root = str(tmp_path / "lsun" / "bedroom_val_lmdb")
    originals = _make_lsun_lmdb(root)
    ds = LsunLmdbDataset(root, image_size=32)
    assert len(ds) == len(originals)
    img, label = ds[0]
    assert img.shape == (32, 32, 3) and img.dtype == np.float32
    assert 0.0 <= img.min() and img.max() <= 1.0 and label == 0

    # first image is 48x48: resize-short-side == plain resize; compare
    key0 = sorted(originals)[0]
    expect = np.asarray(
        Image.fromarray(originals[key0]).resize((32, 32), Image.BILINEAR),
        np.float32) / 255.0
    np.testing.assert_allclose(img, expect, atol=1e-6)

    # key cache pickle created with LSUNClass's naming (datasets/lsun.py:29-36)
    cache = tmp_path / "lsun" / "_cache_bedroom_val_lmdb"
    assert cache.is_file()
    with open(cache, "rb") as f:
        assert pickle.load(f) == ds.keys

    # cache is honored on reopen (poison it; keys must come from the pickle)
    with open(cache, "wb") as f:
        pickle.dump(ds.keys[::-1], f)
    ds2 = LsunLmdbDataset(root, image_size=32)
    assert ds2.keys == ds.keys[::-1]


def test_lsun_resize_short_side_then_center_crop(tmp_path):
    """Non-square entries go through Resize(short->size) + CenterCrop, the
    reference transform order (datasets/__init__.py:126-131)."""
    from nlc_tpu.data.eval_datasets import LsunLmdbDataset

    root = str(tmp_path / "lsun" / "tower_val_lmdb")
    originals = _make_lsun_lmdb(root, n=3)
    ds = LsunLmdbDataset(root, image_size=24)
    key2 = sorted(originals)[2]          # 64x48 (h x w): short side is width
    arr = originals[key2]
    pil = Image.fromarray(arr).resize((24, 32), Image.BILINEAR)  # w->24, h->32
    top = (32 - 24) // 2
    expect = np.asarray(pil.crop((0, top, 24, top + 24)), np.float32) / 255.0
    got, _ = ds[2]
    np.testing.assert_allclose(got, expect, atol=1e-6)


def test_lsun_resize_rounding_matches_torchvision():
    """Non-exact aspect ratios: torchvision TRUNCATES the long resized side
    (functional.resize: int(size*long/short)) and rounds the crop offset
    (functional.center_crop: int(round(margin/2))). A 640x427 image at 256
    must resize to 383x256 (not round(383.66)=384) with crop left
    int(round(63.5)) = 64. torchvision is not installed here, so the
    constants are asserted directly against its documented arithmetic."""
    from nlc_tpu.data.eval_datasets import _resize_short_center_crop
    img = Image.fromarray(
        (np.arange(427 * 640 * 3).reshape(427, 640, 3) % 255).astype(np.uint8))
    out = _resize_short_center_crop(img, 256)
    assert out.shape == (256, 256, 3)
    nw = max(int(640 * 256 / 427), 256)
    assert nw == 383
    left = int(round((nw - 256) / 2.0))
    assert left == 64
    ref = img.resize((383, 256), Image.BILINEAR).crop((64, 0, 64 + 256, 256))
    np.testing.assert_allclose(
        out, np.asarray(ref.convert("RGB"), np.float32) / 255.0, atol=1e-6)


def test_get_eval_dataset_resolves_lsun_lmdb(tmp_path):
    from nlc_tpu.data.eval_datasets import (get_eval_dataset, LsunLmdbDataset,
                                            ImageFolderDataset)

    root = str(tmp_path / "lsun" / "bedroom_val_lmdb")
    _make_lsun_lmdb(root)
    # category-qualified resolution (reference layout <root>/<cat>_<split>_lmdb)
    ds = get_eval_dataset("LSUN", str(tmp_path / "lsun"), 32,
                          category="bedroom", split="val")
    assert isinstance(ds, LsunLmdbDataset) and len(ds) == 6
    # no category: first *_lmdb dir found
    ds = get_eval_dataset("LSUN", str(tmp_path / "lsun"), 32)
    assert isinstance(ds, LsunLmdbDataset)
    # direct lmdb environment dir
    ds = get_eval_dataset("LSUN", root, 32)
    assert isinstance(ds, LsunLmdbDataset)
    # plain folders still fall back to ImageFolder
    folder = tmp_path / "plain"
    folder.mkdir()
    Image.fromarray(np.zeros((40, 40, 3), np.uint8)).save(folder / "a.png")
    ds = get_eval_dataset("LSUN", str(folder), 32)
    assert isinstance(ds, ImageFolderDataset) and len(ds) == 1


def test_lsun_lmdb_readonly_cache_dir(tmp_path, monkeypatch):
    """A read-only dataset mount (cache pickle unwritable) must not break
    key enumeration. chmod can't simulate this as root, so fail the write."""
    import builtins
    from nlc_tpu.data.eval_datasets import LsunLmdbDataset

    root = str(tmp_path / "ro" / "cat_val_lmdb")
    _make_lsun_lmdb(root, n=2)
    real_open = builtins.open

    def deny_cache_write(path, mode="r", *a, **k):
        if "w" in mode and "_cache_" in str(path):
            raise OSError(30, "Read-only file system", str(path))
        return real_open(path, mode, *a, **k)

    monkeypatch.setattr(builtins, "open", deny_cache_write)
    ds = LsunLmdbDataset(root, image_size=16)
    assert len(ds) == 2 and ds[1][0].shape == (16, 16, 3)
    assert not (tmp_path / "ro" / "_cache_cat_val_lmdb").exists()
