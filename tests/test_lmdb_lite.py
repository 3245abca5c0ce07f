"""Pure-Python LMDB reader/writer (restoration/lmdb_lite.py) and the
`.lmdb` dataset backend (reference basicsr utils/lmdb_util.py,
utils/file_client.py, data pipelines)."""
import os

import numpy as np
import pytest

from nlc_tpu.restoration.lmdb_lite import (LmdbReader, LmdbWriter,
                                           make_image_lmdb)


def test_roundtrip_inline_and_overflow(tmp_path):
    rng = np.random.RandomState(0)
    items = {f"k{i:04d}".encode(): rng.bytes(int(rng.randint(1, 12000)))
             for i in range(300)}
    path = str(tmp_path / "db.lmdb")
    with LmdbWriter(path) as w:
        for k in rng.permutation(sorted(items)):  # unsorted insertion order
            kb = bytes(k)
            w.put(kb, items[kb])
    with LmdbReader(path) as r:
        assert len(r) == 300
        assert list(r.keys()) == sorted(items)    # cursor order
        for k, v in items.items():
            assert r.get(k) == v
        assert r.get(b"absent") is None
    # multi-level tree was actually exercised (several leaves + a branch)
    assert os.path.getsize(os.path.join(path, "data.mdb")) > 10 * 4096


def test_empty_and_single(tmp_path):
    path = str(tmp_path / "e.lmdb")
    with LmdbWriter(path) as w:
        pass
    with LmdbReader(path) as r:
        assert len(r) == 0
        assert list(r.keys()) == []
        assert r.get(b"x") is None
    path2 = str(tmp_path / "s.lmdb")
    with LmdbWriter(path2) as w:
        w.put(b"only", b"value")
    with LmdbReader(path2) as r:
        assert r.get(b"only") == b"value" and len(r) == 1


def test_put_semantics_match_liblmdb(tmp_path):
    """Duplicate keys overwrite (last wins, mdb_put semantics); oversized
    keys are rejected at liblmdb's 511-byte MDB_MAXKEYSIZE."""
    path = str(tmp_path / "d.lmdb")
    with LmdbWriter(path) as w:
        w.put(b"k", b"first")
        w.put(b"other", b"x")
        w.put(b"k", b"second")
        with pytest.raises(ValueError):
            w.put(b"K" * 512, b"v")
        w.put(b"K" * 511, b"ok")
    with LmdbReader(path) as r:
        assert len(r) == 3
        assert r.get(b"k") == b"second"
        assert r.get(b"K" * 511) == b"ok"


def test_node_alignment(tmp_path):
    """Node offsets stay 2-byte aligned (liblmdb EVEN padding) even with
    odd-length records."""
    import struct
    path = str(tmp_path / "a.lmdb")
    with LmdbWriter(path) as w:
        for i in range(20):
            w.put(f"k{i:02d}".encode(), b"x" * (2 * i + 1))  # odd sizes
    with LmdbReader(path) as r:
        _, page = r._page(r._main.root)
        for i in range(r._numkeys(page)):
            ptr = struct.unpack_from("<H", page, 16 + 2 * i)[0]
            assert ptr % 2 == 0, ptr
        for i in range(20):
            assert r.get(f"k{i:02d}".encode()) == b"x" * (2 * i + 1)


def test_bad_file_rejected(tmp_path):
    bad = tmp_path / "bad.lmdb"
    bad.mkdir()
    (bad / "data.mdb").write_bytes(b"\0" * 8192)
    with pytest.raises(ValueError):
        LmdbReader(str(bad))


def test_value_at_page_boundaries(tmp_path):
    """Values straddling the inline/overflow threshold and multi-page
    overflow chains round-trip exactly."""
    path = str(tmp_path / "b.lmdb")
    sizes = [2047, 2048, 2049, 4080, 4081, 4096, 8200, 100000]
    vals = {f"s{i}".encode(): bytes([i % 251]) * n
            for i, n in enumerate(sizes)}
    with LmdbWriter(path) as w:
        for k, v in vals.items():
            w.put(k, v)
    with LmdbReader(path) as r:
        for k, v in vals.items():
            assert r.get(k) == v, (k, len(v))


def test_image_lmdb_dataset_backend(tmp_path):
    """make_image_lmdb + PairedImageDataset/SingleImageDataset over .lmdb
    roots (no lmdb package in this image -> exercises the lite fallback)."""
    from PIL import Image
    from nlc_tpu.restoration.data import (PairedImageDataset,
                                          SingleImageDataset, ImageRoot)
    rng = np.random.RandomState(1)
    for root in ("gt", "lq"):
        os.makedirs(tmp_path / root)
        for i in range(4):
            Image.fromarray((rng.rand(12, 12, 3) * 255).astype(np.uint8)) \
                .save(tmp_path / root / f"{i:03d}.png")
    n = make_image_lmdb(str(tmp_path / "gt"), str(tmp_path / "gt.lmdb"))
    assert n == 4
    assert os.path.exists(tmp_path / "gt.lmdb" / "meta_info.txt")
    make_image_lmdb(str(tmp_path / "lq"), str(tmp_path / "lq.lmdb"))

    # lmdb-backed pair == folder-backed pair, bit for bit
    ds_folder = PairedImageDataset(str(tmp_path / "gt"), str(tmp_path / "lq"),
                                   phase="val")
    ds_lmdb = PairedImageDataset(str(tmp_path / "gt.lmdb"),
                                 str(tmp_path / "lq.lmdb"), phase="val")
    assert len(ds_lmdb) == len(ds_folder) == 4
    for i in range(4):
        lq_f, gt_f = ds_folder[i]
        lq_l, gt_l = ds_lmdb[i]
        np.testing.assert_array_equal(gt_l, gt_f)
        np.testing.assert_array_equal(lq_l, lq_f)

    # mixed roots pair by stem
    ds_mixed = PairedImageDataset(str(tmp_path / "gt.lmdb"),
                                  str(tmp_path / "lq"), phase="val")
    lq_m, gt_m = ds_mixed[2]
    np.testing.assert_array_equal(gt_m, ds_folder[2][1])

    single = SingleImageDataset(str(tmp_path / "lq.lmdb"))
    lq, path = single[1]
    assert lq.shape == (12, 12, 3) and "001" in path

    # meta_info.txt drives key order
    root = ImageRoot(str(tmp_path / "gt.lmdb"))
    assert root.stems == [f"{i:03d}" for i in range(4)]
    root.close()

    # ambiguous folder stems fail loudly instead of silently dropping files
    amb = tmp_path / "amb"
    amb.mkdir()
    for ext in ("png", "bmp"):
        Image.fromarray(np.zeros((4, 4, 3), np.uint8)).save(amb / f"x.{ext}")
    with pytest.raises(ValueError):
        ImageRoot(str(amb))
