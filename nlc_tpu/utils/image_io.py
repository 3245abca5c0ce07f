"""Host-side image IO: PNG save/load, [-1,1] <-> uint8, sample-grid saving.

Covers the torchvision save_image usage in the reference eval paths
(image_sample.py:561-564: sample.add(1).div(2).clamp(0,1) -> per-image PNGs
named '{rank:02}-{batch:05}-{j:03}.png') and the PNG-skip resume check.
"""
from __future__ import annotations

import os
from typing import List, Optional

import numpy as np
from PIL import Image


def to_uint8(img01: np.ndarray) -> np.ndarray:
    """[0,1] float -> uint8 with torchvision save_image rounding
    (mul 255 + 0.5, floor via clamp+astype)."""
    arr = np.clip(np.asarray(img01, np.float32) * 255.0 + 0.5, 0, 255)
    return arr.astype(np.uint8)


def from_minus1_1(x: np.ndarray) -> np.ndarray:
    return np.clip((np.asarray(x) + 1.0) / 2.0, 0.0, 1.0)


def save_image(img01: np.ndarray, path: str) -> None:
    """img01: (H, W, C) float in [0,1] (or (H,W))."""
    arr = to_uint8(img01)
    if arr.ndim == 3 and arr.shape[2] == 1:
        arr = arr[..., 0]
    Image.fromarray(arr).save(path)


def save_batch(batch_minus1_1: np.ndarray, images_dir: str, batch_index: int,
               rank: int = 0) -> List[str]:
    """Save a sampler output batch (B,H,W,C in [-1,1]) with the reference's
    naming convention; returns paths."""
    os.makedirs(images_dir, exist_ok=True)
    imgs = from_minus1_1(batch_minus1_1)
    paths = [os.path.join(images_dir, f"{rank:02}-{batch_index:05}-{j:03}.png")
             for j in range(len(imgs))]
    arr = to_uint8(np.asarray(imgs))
    if arr.ndim == 4 and arr.shape[-1] == 3 and (os.cpu_count() or 1) >= 4:
        # fast path: threaded C++ PNG encoder (eval runs write thousands of
        # PNGs). Only worth it with real cores — single-threaded, PIL's
        # encoder is faster (measured on a 1-CPU host).
        try:
            from ..native import native_available, save_batch_png
            if native_available() and save_batch_png(arr, paths) == len(paths):
                return paths
        except Exception:
            pass
    for img, p in zip(imgs, paths):
        save_image(img, p)
    return paths


def batch_exists(images_dir: str, batch_index: int, batch_size: int,
                 rank: int = 0) -> bool:
    """PNG-skip resume (reference image_sample.py:533-540)."""
    for j in range(batch_size):
        if not os.path.exists(os.path.join(
                images_dir, f"{rank:02}-{batch_index:05}-{j:03}.png")):
            return False
    return True


def load_image(path: str) -> np.ndarray:
    """-> (H, W, C) float32 in [0,1]."""
    img = Image.open(path).convert("RGB")
    return np.asarray(img, np.float32) / 255.0


def load_image_dir(images_dir: str, limit: Optional[int] = None) -> np.ndarray:
    files = sorted(f for f in os.listdir(images_dir)
                   if f.lower().endswith((".png", ".jpg", ".jpeg")))
    if limit:
        files = files[:limit]
    return np.stack([load_image(os.path.join(images_dir, f)) for f in files])


def save_grid(batch01: np.ndarray, path: str, n_per_row: int = 5) -> None:
    """Simple sample-grid writer (plot_samples-style debugging aid)."""
    b, h, w, c = batch01.shape
    rows = (b + n_per_row - 1) // n_per_row
    grid = np.zeros((rows * h, n_per_row * w, c), np.float32)
    for i in range(b):
        r, col = divmod(i, n_per_row)
        grid[r * h:(r + 1) * h, col * w:(col + 1) * w] = batch01[i]
    save_image(grid, path)
