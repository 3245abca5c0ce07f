"""Optical-flow IO and (de)quantization (reference basicsr/utils/flow_util.py).

Behavior parity without cv2: the .flo 'PIEH' format is plain struct IO; the
quantized path stores dx/dy as a concatenated uint8 image, here read/written
with PIL (the reference uses lossy JPEG via cv2; we default to lossless PNG —
the dequantization math is identical either way). The REDS video dataset
(reference basicsr/data/reds_dataset.py:166-190) consumes dequantize_flow for
its `_p{i}`/`_n{i}` flow maps; see data.VideoClipDataset(dataroot_flow=...).
"""
from __future__ import annotations

import os
from typing import Tuple

import numpy as np


def quantize(arr: np.ndarray, min_val: float, max_val: float, levels: int,
             dtype=np.int64) -> np.ndarray:
    """Clip to [min_val, max_val] and bucket into [0, levels-1]
    (reference flow_util.py:136-161)."""
    if not (isinstance(levels, int) and levels > 1):
        raise ValueError(f"levels must be a positive integer, got {levels}")
    if min_val >= max_val:
        raise ValueError(f"min_val ({min_val}) must be < max_val ({max_val})")
    arr = np.clip(arr, min_val, max_val) - min_val
    return np.minimum(np.floor(levels * arr / (max_val - min_val)).astype(dtype),
                      levels - 1)


def dequantize(arr: np.ndarray, min_val: float, max_val: float, levels: int,
               dtype=np.float64) -> np.ndarray:
    """Bucket centers back to values (reference flow_util.py:163-190)."""
    if not (isinstance(levels, int) and levels > 1):
        raise ValueError(f"levels must be a positive integer, got {levels}")
    if min_val >= max_val:
        raise ValueError(f"min_val ({min_val}) must be < max_val ({max_val})")
    return (arr + 0.5).astype(dtype) * (max_val - min_val) / levels + min_val


def quantize_flow(flow: np.ndarray, max_val: float = 0.02,
                  norm: bool = True) -> Tuple[np.ndarray, np.ndarray]:
    """(h, w, 2) flow -> two uint8 maps; 255 levels so 0 survives the
    round-trip (reference flow_util.py:84-110)."""
    h, w, _ = flow.shape
    dx, dy = flow[..., 0], flow[..., 1]
    if norm:
        dx = dx / w
        dy = dy / h
    return tuple(quantize(d, -max_val, max_val, 255, np.uint8)
                 for d in (dx, dy))


def dequantize_flow(dx: np.ndarray, dy: np.ndarray, max_val: float = 0.02,
                    denorm: bool = True) -> np.ndarray:
    """Inverse of quantize_flow (reference flow_util.py:112-133, including its
    quirk of denormalizing BOTH components by dx's shape)."""
    assert dx.shape == dy.shape
    assert dx.ndim == 2 or (dx.ndim == 3 and dx.shape[-1] == 1)
    dx, dy = (dequantize(d, -max_val, max_val, 255) for d in (dx, dy))
    if denorm:
        dx = dx * dx.shape[1]
        dy = dy * dx.shape[0]
    return np.dstack((dx, dy))


def flowread(flow_path: str, quantize_pair: bool = False, concat_axis: int = 0,
             *args, **kwargs) -> np.ndarray:
    """Read a .flo file, or a quantized dx/dy image pair when quantize_pair
    (reference flow_util.py:13-50; keyword renamed from `quantize`, which
    shadows the module-level function)."""
    if quantize_pair:
        from PIL import Image
        assert concat_axis in (0, 1)
        cat_flow = np.asarray(Image.open(flow_path))
        if cat_flow.ndim != 2:
            raise IOError(f"{flow_path} is not a valid quantized flow file, "
                          f"its dimension is {cat_flow.ndim}.")
        assert cat_flow.shape[concat_axis] % 2 == 0
        dx, dy = np.split(cat_flow, 2, axis=concat_axis)
        return dequantize_flow(dx, dy, *args, **kwargs).astype(np.float32)
    with open(flow_path, "rb") as f:
        header = f.read(4)
        if header != b"PIEH":
            raise IOError(f"Invalid flow file: {flow_path}, "
                          "header does not contain PIEH")
        w = int(np.fromfile(f, np.int32, 1).squeeze())
        h = int(np.fromfile(f, np.int32, 1).squeeze())
        flow = np.fromfile(f, np.float32, w * h * 2).reshape((h, w, 2))
    return flow.astype(np.float32)


def flowwrite(flow: np.ndarray, filename: str, quantize_pair: bool = False,
              concat_axis: int = 0, *args, **kwargs) -> None:
    """Write a .flo file (lossless), or a quantized uint8 pair image
    (reference flow_util.py:53-82)."""
    if not quantize_pair:
        with open(filename, "wb") as f:
            f.write(b"PIEH")
            np.array([flow.shape[1], flow.shape[0]], np.int32).tofile(f)
            flow.astype(np.float32).tofile(f)
        return
    from PIL import Image
    assert concat_axis in (0, 1)
    dx, dy = quantize_flow(flow, *args, **kwargs)
    dxdy = np.concatenate((dx, dy), axis=concat_axis)
    os.makedirs(os.path.dirname(filename) or ".", exist_ok=True)
    Image.fromarray(dxdy).save(filename)
