"""Evaluation datasets for constrained-generation runs.

Capability parity with reference datasets/ (get_dataset, datasets/__init__.py:47-220):
  CELEBA          140x140 center crop at (cx=89, cy=121) -> resize
  CelebA_HQ/FFHQ  image-folder with the seeded-2019 shuffle split (:136-164)
  ImageNet        val subset via a file list (:166-194)
  LSUN            lmdb-backed (gated: lmdb is not in this image; a folder of
                  pre-extracted images works through ImageFolder)

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


def seeded_split(n: int, test_ratio: float = 0.1, seed: int = 2019
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """The reference's fixed shuffle split for CelebA_HQ/FFHQ folders
    (datasets/__init__.py:141-152: np seed 2019 permutation, 90/10)."""
    rng = np.random.RandomState(seed)
    perm = rng.permutation(n)
    n_test = int(n * test_ratio)
    return perm[n_test:], perm[:n_test]


def get_eval_dataset(name: str, data_dir: Optional[str], image_size: int,
                     subset_file: Optional[str] = None, split: str = "test"):
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
        # lmdb backend unavailable in this image; pre-extracted folders work
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
