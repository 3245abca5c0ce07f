"""Training data pipeline: host-sharded infinite image stream.

Capability parity with reference src/image_dataset.py (load_data generator,
MPI rank-sharded ImageDataset :34-160, cal_data_norm :162-186) — the shard is
by jax process index instead of MPI rank, and images arrive NHWC float32 in
[-1, 1].
"""
from __future__ import annotations

import os
import random
from typing import Iterator, Optional, Tuple

import numpy as np
from PIL import Image

import jax


def _list_images(data_dir: str):
    exts = (".jpg", ".jpeg", ".png", ".gif", ".webp")
    out = []
    for dp, _, fs in os.walk(data_dir):
        for f in sorted(fs):
            if f.lower().endswith(exts):
                out.append(os.path.join(dp, f))
    return out


def _load_and_crop(path: str, resolution: int, random_crop: bool,
                   rng: random.Random) -> np.ndarray:
    img = Image.open(path).convert("RGB")
    # progressive downsize then crop (reference center_crop_arr semantics)
    while min(*img.size) >= 2 * resolution:
        img = img.resize((img.size[0] // 2, img.size[1] // 2), Image.BOX)
    scale = resolution / min(*img.size)
    img = img.resize((round(img.size[0] * scale), round(img.size[1] * scale)),
                     Image.BICUBIC)
    arr = np.asarray(img, np.float32)
    h, w = arr.shape[:2]
    if random_crop:
        top = rng.randrange(h - resolution + 1)
        left = rng.randrange(w - resolution + 1)
    else:
        top = (h - resolution) // 2
        left = (w - resolution) // 2
    arr = arr[top:top + resolution, left:left + resolution]
    return arr / 127.5 - 1.0


def load_training_data(data_dir: str, batch_size: int, image_size: int,
                       random_crop: bool = False, random_flip: bool = True,
                       seed: int = 0, shard: Optional[int] = None,
                       num_shards: Optional[int] = None,
                       synthetic_fallback: bool = True,
                       ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Infinite generator of (images NHWC [-1,1], labels). Shards files across
    hosts like the reference shards across MPI ranks (image_dataset.py:66-70)."""
    shard = jax.process_index() if shard is None else shard
    num_shards = jax.process_count() if num_shards is None else num_shards

    if not data_dir or not os.path.isdir(data_dir):
        if not synthetic_fallback:
            raise FileNotFoundError(data_dir)
        rng = np.random.RandomState(seed + shard)
        while True:
            base = rng.rand(batch_size, 8, 8, 3).astype(np.float32)
            imgs = np.kron(base, np.ones((1, image_size // 8, image_size // 8, 1),
                                         np.float32))
            yield imgs * 2 - 1, np.zeros(batch_size, np.int64)

    files = _list_images(data_dir)[shard::num_shards]
    assert files, f"no images under {data_dir}"
    if len(files) < batch_size:
        # both batch loops below drop partial batches (reference drop_last
        # semantics, image_dataset.py:41-49); with fewer shard-local files
        # than one batch they would yield nothing and the infinite epoch
        # loop would busy-spin forever — fail loudly instead
        raise ValueError(
            f"shard {shard} has {len(files)} images < batch_size "
            f"{batch_size}; reduce the batch or add data")
    rng = random.Random(seed + shard)

    # native C++ decode/crop path (thread pool off the GIL) when available;
    # resampling differs slightly from the PIL path (single bilinear vs
    # progressive-box + bicubic) — both are valid training pipelines
    from ..native import native_available, load_batch as native_load
    use_native = native_available() and not os.environ.get("NLC_DISABLE_NATIVE")

    epoch = 0
    while True:
        rng.shuffle(files)
        if use_native:
            for i in range(0, len(files) - batch_size + 1, batch_size):
                chunk = files[i:i + batch_size]
                imgs, ok = native_load(chunk, image_size, random_crop,
                                       seed=seed + epoch * 1000003 + i)
                if not ok.all():   # fall back per-batch on decode failures
                    imgs = np.stack([
                        _load_and_crop(p, image_size, random_crop, rng)
                        for p in chunk])
                if random_flip:
                    flips = np.asarray([rng.random() < 0.5
                                        for _ in range(len(imgs))])
                    imgs[flips] = imgs[flips, :, ::-1]
                yield imgs, np.zeros(batch_size, np.int64)
            epoch += 1
            continue
        batch = []
        for path in files:
            arr = _load_and_crop(path, image_size, random_crop, rng)
            if random_flip and rng.random() < 0.5:
                arr = arr[:, ::-1]
            batch.append(arr)
            if len(batch) == batch_size:
                yield np.stack(batch), np.zeros(batch_size, np.int64)
                batch = []
        epoch += 1


def cal_data_norm(data_dir: str, image_size: int, n_samples: int = 1024,
                  batch_size: int = 64) -> dict:
    """Dataset flattened-norm statistics used to calibrate norm_max
    (reference image_dataset.py:162-186)."""
    it = load_training_data(data_dir, batch_size, image_size, seed=0,
                            shard=0, num_shards=1)
    norms = []
    seen = 0
    for imgs, _ in it:
        n = np.linalg.norm(imgs.reshape(len(imgs), -1), axis=1)
        norms.append(n)
        seen += len(imgs)
        if seen >= n_samples:
            break
    norms = np.concatenate(norms)[:n_samples]
    return {"min": float(norms.min()), "max": float(norms.max()),
            "mean": float(norms.mean()), "std": float(norms.std())}
