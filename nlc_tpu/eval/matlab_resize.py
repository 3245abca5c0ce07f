"""MATLAB-faithful bicubic imresize.

Parity with reference basicsr/utils/matlab_functions.py imresize (:94 ff):
a=-0.5 cubic kernel, antialiased (kernel stretched by 1/scale) when
downscaling, symmetric boundary extension, separable H-then-W application.
Matches MATLAB's imresize output — the convention every SR paper's
LR images use (different from PIL/cv2 bicubic).

Host-side numpy; images (H, W, C) float in [0, 1].
"""
from __future__ import annotations

import math

import numpy as np


def _cubic(x: np.ndarray) -> np.ndarray:
    ax = np.abs(x)
    ax2 = ax ** 2
    ax3 = ax ** 3
    f = (1.5 * ax3 - 2.5 * ax2 + 1) * (ax <= 1)
    f = f + (-0.5 * ax3 + 2.5 * ax2 - 4 * ax + 2) * ((ax > 1) & (ax <= 2))
    return f


def _weights_indices(in_len: int, out_len: int, scale: float,
                     antialiasing: bool):
    kernel_width = 4.0
    if scale < 1 and antialiasing:
        kernel_width = kernel_width / scale
    x = np.arange(1, out_len + 1, dtype=np.float64)
    u = x / scale + 0.5 * (1 - 1 / scale)
    left = np.floor(u - kernel_width / 2)
    p = int(math.ceil(kernel_width)) + 2
    indices = left[:, None] + np.arange(p)[None, :] - 1
    dist = u[:, None] - indices - 1
    if scale < 1 and antialiasing:
        weights = scale * _cubic(dist * scale)
    else:
        weights = _cubic(dist)
    weights = weights / weights.sum(axis=1, keepdims=True)
    # trim zero columns
    nz = np.nonzero(weights.sum(axis=0) != 0)[0]
    if weights[:, 0].sum() == 0:
        indices = indices[:, 1:]
        weights = weights[:, 1:]
    if weights[:, -1].sum() == 0:
        indices = indices[:, :-1]
        weights = weights[:, :-1]
    # symmetric boundary indices
    sym_len_s = int(-indices.min())
    sym_len_e = int(indices.max() - in_len + 1)
    return weights, indices.astype(np.int64), max(sym_len_s, 0), max(sym_len_e, 0)


def _resize_along(img: np.ndarray, weights, indices, sym_s, sym_e, axis: int):
    img = np.moveaxis(img, axis, 0)
    in_len = img.shape[0]
    # symmetric pad
    head = img[:sym_s][::-1] if sym_s > 0 else img[:0]
    tail = img[in_len - sym_e:][::-1] if sym_e > 0 else img[:0]
    padded = np.concatenate([head, img, tail], axis=0)
    idx = indices + sym_s
    out = np.einsum("ok,ok...->o...", weights, padded[idx])
    return np.moveaxis(out, 0, axis)


def imresize(img: np.ndarray, scale: float, antialiasing: bool = True
             ) -> np.ndarray:
    """(H, W[, C]) [0,1] -> bicubic-resized (MATLAB convention)."""
    img = np.asarray(img, np.float64)
    squeeze = False
    if img.ndim == 2:
        img = img[..., None]
        squeeze = True
    in_h, in_w = img.shape[:2]
    out_h = math.ceil(in_h * scale)
    out_w = math.ceil(in_w * scale)
    wh, ih, ss_h, se_h = _weights_indices(in_h, out_h, scale, antialiasing)
    ww, iw, ss_w, se_w = _weights_indices(in_w, out_w, scale, antialiasing)
    out = _resize_along(img, wh, ih, ss_h, se_h, axis=0)
    out = _resize_along(out, ww, iw, ss_w, se_w, axis=1)
    if squeeze:
        out = out[..., 0]
    return out.astype(np.float32)
