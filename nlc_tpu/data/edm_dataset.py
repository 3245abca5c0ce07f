"""EDM-style dataset: image folders or ZIP archives with optional
dataset.json labels and xflip duplication.

Parity with reference training/dataset.py: Dataset base semantics (xflip
doubles the index space with mirrored images, raw_idx mapping, max_size
truncation, onehot labels) and ImageFolderDataset reading directories or zip
archives (:166 ff). The InfiniteSampler (torch_utils/misc.py:110-144)
becomes `infinite_batches`: rank-sharded shuffled infinite index stream.
"""
from __future__ import annotations

import io
import json
import os
import zipfile
from typing import Iterator, Optional, Tuple

import numpy as np
from PIL import Image

import jax


class EDMImageDataset:
    def __init__(self, path: str, resolution: Optional[int] = None,
                 max_size: Optional[int] = None, use_labels: bool = False,
                 xflip: bool = False, random_seed: int = 0):
        self.path = path
        self.xflip = xflip
        self.use_labels = use_labels
        self._zip = None
        if path.endswith(".zip"):
            self._zip = zipfile.ZipFile(path)
            names = [n for n in self._zip.namelist()
                     if n.lower().endswith((".png", ".jpg", ".jpeg"))]
        else:
            names = []
            for dp, _, fs in os.walk(path):
                for f in sorted(fs):
                    if f.lower().endswith((".png", ".jpg", ".jpeg")):
                        names.append(os.path.relpath(os.path.join(dp, f), path))
        self._names = sorted(names)
        self._labels = self._load_labels()
        self.resolution = resolution

        raw = np.arange(len(self._names), dtype=np.int64)
        if max_size is not None and raw.size > max_size:
            np.random.RandomState(random_seed % (1 << 31)).shuffle(raw)
            raw = np.sort(raw[:max_size])
        self._raw_idx = raw
        if xflip:
            self._raw_idx = np.tile(raw, 2)
            self._flip = np.concatenate([np.zeros(raw.size, bool),
                                         np.ones(raw.size, bool)])
        else:
            self._flip = np.zeros(raw.size, bool)

    def _load_labels(self):
        data = None
        if self._zip is not None and "dataset.json" in self._zip.namelist():
            data = json.loads(self._zip.read("dataset.json"))
        else:
            p = os.path.join(self.path, "dataset.json")
            if os.path.exists(p):
                with open(p) as f:
                    data = json.load(f)
        if not data or "labels" not in data or not data["labels"]:
            return None
        return {k: v for k, v in data["labels"]}

    @property
    def label_dim(self) -> int:
        if self._labels is None or not self.use_labels:
            return 0
        return int(max(self._labels.values())) + 1

    def __len__(self):
        return len(self._raw_idx)

    def _read(self, name: str) -> np.ndarray:
        if self._zip is not None:
            data = self._zip.read(name)
            img = Image.open(io.BytesIO(data))
        else:
            img = Image.open(os.path.join(self.path, name))
        img = img.convert("RGB")
        if self.resolution and img.size != (self.resolution, self.resolution):
            img = img.resize((self.resolution, self.resolution), Image.LANCZOS)
        return np.asarray(img, np.uint8)

    def __getitem__(self, i: int) -> Tuple[np.ndarray, np.ndarray]:
        raw = int(self._raw_idx[i])
        name = self._names[raw]
        arr = self._read(name)
        if self._flip[i]:
            arr = arr[:, ::-1]
        if self._labels is not None and self.use_labels:
            onehot = np.zeros(self.label_dim, np.float32)
            onehot[self._labels[name]] = 1
            return arr, onehot
        return arr, np.zeros(0, np.float32)


class SyntheticEDMDataset:
    """Smoke-mode stand-in."""

    def __init__(self, resolution: int, n: int = 256, label_dim: int = 0):
        self.resolution = resolution
        self.n = n
        self.label_dim = label_dim

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        rng = np.random.RandomState(i)
        img = (rng.rand(self.resolution, self.resolution, 3) * 255).astype(np.uint8)
        lab = np.zeros(self.label_dim, np.float32)
        if self.label_dim:
            lab[i % self.label_dim] = 1
        return img, lab


def infinite_batches(dataset, batch_size: int, rounds: int = 1, seed: int = 0,
                     shard: Optional[int] = None, num_shards: Optional[int] = None
                     ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Infinite (rounds, batch, H, W, C)-shaped [-1,1] float batches with
    rank-sharded shuffling (InfiniteSampler parity)."""
    shard = jax.process_index() if shard is None else shard
    num_shards = jax.process_count() if num_shards is None else num_shards
    rng = np.random.RandomState(seed)
    order = np.arange(len(dataset))[shard::num_shards]
    while True:
        rng.shuffle(order)
        pos = 0
        while pos + batch_size * rounds <= len(order):
            idx = order[pos:pos + batch_size * rounds]
            pos += batch_size * rounds
            imgs, labs = zip(*(dataset[int(j)] for j in idx))
            imgs = np.stack(imgs).astype(np.float32) / 127.5 - 1.0
            labs = np.stack(labs)
            r = imgs.reshape((rounds, batch_size) + imgs.shape[1:])
            lr = labs.reshape((rounds, batch_size) + labs.shape[1:])
            yield r, lr
