"""Evaluation datasets for constrained-generation runs.

Capability parity with reference datasets/ (get_dataset, datasets/__init__.py:47-220):
  CELEBA          140x140 center crop at (cx=89, cy=121) -> resize
  CelebA_HQ/FFHQ  image-folder with the seeded-2019 shuffle split (:136-164)
  ImageNet        val subset via a file list (:166-194)
  LSUN            lmdb-backed via LsunLmdbDataset (datasets/lsun.py:11-58
                  LSUNClass semantics over the real lmdb binding or the
                  in-repo lmdb_lite reader; pre-extracted folders also work)

All loading is host-side numpy/PIL; images return as NHWC float32 in [0,1]
(the data_transform -1..1 shift happens at the eval call site, matching
evaluate_constraint's `2*x - 1`).
"""
from __future__ import annotations

import os
from typing import Iterator, Optional, Sequence, Tuple

import numpy as np
from PIL import Image


def _center_crop_arr(img: Image.Image, size: int) -> np.ndarray:
    w, h = img.size
    s = min(w, h)
    img = img.crop(((w - s) // 2, (h - s) // 2, (w + s) // 2, (h + s) // 2))
    img = img.resize((size, size), Image.BICUBIC)
    return np.asarray(img.convert("RGB"), np.float32) / 255.0


def _celeba_crop(img: Image.Image, size: int) -> np.ndarray:
    """The DDIM CelebA crop: 140x140 box centered at (cx=89, cy=121)."""
    cx, cy, half = 89, 121, 70
    img = img.crop((cx - half, cy - half, cx + half, cy + half))
    img = img.resize((size, size), Image.BICUBIC)
    return np.asarray(img.convert("RGB"), np.float32) / 255.0


class ImageFolderDataset:
    def __init__(self, root: str, image_size: int, files: Optional[Sequence[str]] = None,
                 crop: str = "center"):
        self.root = root
        self.image_size = image_size
        self.crop = crop
        if files is None:
            files = sorted(
                os.path.join(dp, f)
                for dp, _, fs in os.walk(root) for f in fs
                if f.lower().endswith((".png", ".jpg", ".jpeg", ".webp")))
        self.files = list(files)

    def __len__(self):
        return len(self.files)

    def __getitem__(self, i: int) -> Tuple[np.ndarray, int]:
        img = Image.open(self.files[i])
        if self.crop == "celeba":
            arr = _celeba_crop(img, self.image_size)
        else:
            arr = _center_crop_arr(img, self.image_size)
        return arr, 0


class SyntheticDataset:
    """Deterministic stand-in when no real data dir exists (tests, smoke runs)."""

    def __init__(self, image_size: int, n: int = 64, seed: int = 0):
        self.image_size = image_size
        self.n = n
        self.seed = seed

    def __len__(self):
        return self.n

    def __getitem__(self, i: int):
        rng = np.random.RandomState(self.seed * 100003 + i)
        base = rng.rand(4, 4, 3).astype(np.float32)
        img = np.kron(base, np.ones((self.image_size // 4, self.image_size // 4, 1),
                                    np.float32))
        return np.clip(img, 0, 1), 0


def _resize_short_center_crop(img: Image.Image, size: int) -> np.ndarray:
    """torchvision Resize(size) + CenterCrop(size): scale the SHORT side to
    `size` keeping aspect, then center-crop the square — the reference's LSUN
    transform order (datasets/__init__.py:126-131), which differs from
    crop-then-resize by resampling footprint."""
    w, h = img.size
    # exact torchvision rounding: the long resized side TRUNCATES
    # (functional.resize: int(size * long / short)) while the crop offset
    # uses int(round(margin / 2)) (functional.center_crop) — mixing these
    # up shifts the bilinear grid / crop window by a pixel on non-exact
    # aspect ratios
    if w <= h:
        nw, nh = size, max(int(h * size / w), size)
    else:
        nw, nh = max(int(w * size / h), size), size
    img = img.resize((nw, nh), Image.BILINEAR)
    left = int(round((nw - size) / 2.0))
    top = int(round((nh - size) / 2.0))
    img = img.crop((left, top, left + size, top + size))
    return np.asarray(img.convert("RGB"), np.float32) / 255.0


class LsunLmdbDataset:
    """One LSUN category lmdb (reference datasets/lsun.py:11-58 LSUNClass).

    Behavior parity: entry count from the db stats, key list enumerated once
    and cached in a sibling ``_cache_<dirname>`` pickle, values are encoded
    image buffers decoded through PIL. Reading prefers the real lmdb binding
    when importable and falls back to the in-repo pure-Python lmdb_lite
    reader (same pattern as restoration.data.ImageRoot), so `.lmdb` roots
    never silently require pre-extraction.
    """

    def __init__(self, root: str, image_size: int):
        import pickle
        self.root = root.rstrip("/")
        self.image_size = image_size
        self._env = None
        try:
            import lmdb
            self._env = lmdb.open(self.root, max_readers=1, readonly=True,
                                  lock=False, readahead=False, meminit=False)
            with self._env.begin(write=False) as txn:
                self._len = txn.stat()["entries"]
        except ImportError:
            from ..restoration.lmdb_lite import LmdbReader
            self._lite = LmdbReader(self.root)
            self._len = len(self._lite)
        cache_file = os.path.join(os.path.dirname(self.root),
                                  f"_cache_{os.path.basename(self.root)}")
        if os.path.isfile(cache_file):
            with open(cache_file, "rb") as f:
                self.keys = pickle.load(f)
        else:
            if self._env is not None:
                with self._env.begin(write=False) as txn:
                    self.keys = [k for k, _ in txn.cursor()]
            else:
                self.keys = list(self._lite.keys())
            try:
                with open(cache_file, "wb") as f:
                    pickle.dump(self.keys, f)
            except OSError:
                pass   # read-only dataset mount; enumerate again next time

    def __len__(self):
        return self._len

    def _get(self, key: bytes) -> bytes:
        if self._env is not None:
            with self._env.begin(write=False) as txn:
                return txn.get(key)
        return self._lite.get(key)

    def __getitem__(self, i: int) -> Tuple[np.ndarray, int]:
        import io
        buf = self._get(self.keys[i])
        img = Image.open(io.BytesIO(buf)).convert("RGB")
        return _resize_short_center_crop(img, self.image_size), 0


def _lsun_lmdb_root(data_dir: str, category: Optional[str],
                    split: str) -> Optional[str]:
    """Resolve the reference's LSUN layout (<root>/<category>_<split>_lmdb,
    datasets/lsun.py:84-86 + __init__.py:121-125 val split); also accept
    data_dir itself being an lmdb environment dir."""
    if os.path.isfile(os.path.join(data_dir, "data.mdb")):
        return data_dir
    candidates = []
    if category:
        candidates += [os.path.join(data_dir, f"{category}_{split}_lmdb"),
                       os.path.join(data_dir, f"{category}_val_lmdb")]
    candidates += sorted(
        os.path.join(data_dir, d) for d in os.listdir(data_dir)
        if d.endswith("_lmdb") and os.path.isdir(os.path.join(data_dir, d)))
    for c in candidates:
        if os.path.isfile(os.path.join(c, "data.mdb")):
            return c
    return None


def seeded_split(n: int, test_ratio: float = 0.1, seed: int = 2019
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """The reference's fixed shuffle split for CelebA_HQ/FFHQ folders
    (datasets/__init__.py:141-152: np seed 2019 permutation, 90/10)."""
    rng = np.random.RandomState(seed)
    perm = rng.permutation(n)
    n_test = int(n * test_ratio)
    return perm[n_test:], perm[:n_test]


def get_eval_dataset(name: str, data_dir: Optional[str], image_size: int,
                     subset_file: Optional[str] = None, split: str = "test",
                     category: Optional[str] = None):
    """Factory. Missing data_dir falls back to SyntheticDataset so smoke runs
    work anywhere; real evaluations pass the asset directory."""
    if data_dir is None or not os.path.isdir(data_dir):
        return SyntheticDataset(image_size)
    name = name.upper()
    if name == "CELEBA":
        ds = ImageFolderDataset(data_dir, image_size, crop="celeba")
        return ds
    if name in ("CELEBA_HQ", "FFHQ"):
        full = ImageFolderDataset(data_dir, image_size)
        train_idx, test_idx = seeded_split(len(full))
        idx = test_idx if split == "test" else train_idx
        return ImageFolderDataset(data_dir, image_size,
                                  files=[full.files[i] for i in idx])
    if name == "CIFAR10":
        # reference quirk (datasets/__init__.py:195-215): the CIFAR10 branch
        # actually reads an IMAGE FOLDER (constraints/celeba_hq) and takes all
        # items in seeded-2019 shuffled order (split fraction 0.0) — mirror
        # that on whatever folder is passed
        full = ImageFolderDataset(data_dir, image_size)
        rs = np.random.get_state()
        np.random.seed(2019)
        idx = np.random.permutation(len(full))
        np.random.set_state(rs)
        return ImageFolderDataset(data_dir, image_size,
                                  files=[full.files[i] for i in idx])
    if name == "IMAGENET":
        files = None
        if subset_file and os.path.exists(subset_file):
            with open(subset_file) as f:
                names = [line.strip() for line in f if line.strip()]
            files = [os.path.join(data_dir, n) for n in names]
        return ImageFolderDataset(data_dir, image_size, files=files)
    if name == "LSUN":
        root = _lsun_lmdb_root(data_dir, category, split)
        if root is not None:
            return LsunLmdbDataset(root, image_size)
        # pre-extracted image folders also work
        return ImageFolderDataset(data_dir, image_size)
    return ImageFolderDataset(data_dir, image_size)


def batch_iterator(dataset, batch_size: int, shuffle: bool = True, seed: int = 1234,
                   drop_last: bool = False) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Seeded batching (the reference uses a seeded DataLoader,
    image_sample.py:407-423)."""
    idx = np.arange(len(dataset))
    if shuffle:
        np.random.RandomState(seed).shuffle(idx)
    for i in range(0, len(idx), batch_size):
        chunk = idx[i:i + batch_size]
        if drop_last and len(chunk) < batch_size:
            return
        imgs, labels = zip(*(dataset[int(j)] for j in chunk))
        yield np.stack(imgs), np.asarray(labels)
