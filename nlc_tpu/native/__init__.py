"""Native (C++) input-pipeline runtime.

The decode + crop + normalize stage is the host-bound part of training data
loading; `load_batch` runs it on a C++ thread pool (libpng/libjpeg) off the
GIL. The library compiles on first use with g++ and caches next to this file;
environments without a toolchain or image libs transparently fall back to the
PIL path in data.train_data (native_available() gates the fast path).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "image_loader.cpp")
_LIB = os.path.join(_HERE, "libnlcloader.so")
_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _LIB,
           "-lpng", "-ljpeg", "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=240)
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB) or \
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB)
        lib.nlc_load_batch.restype = ctypes.c_int
        lib.nlc_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_uint64, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int)]
        lib.nlc_load_paired_batch.restype = ctypes.c_int
        lib.nlc_load_paired_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_uint64, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int)]
        lib.nlc_save_batch.restype = ctypes.c_int
        lib.nlc_save_batch.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def native_available() -> bool:
    return _load() is not None


def load_batch(paths: Sequence[str], resolution: int, random_crop: bool = False,
               seed: int = 0, num_threads: Optional[int] = None
               ) -> Tuple[np.ndarray, np.ndarray]:
    """-> (images (N, res, res, 3) float32 in [-1,1], ok flags (N,) bool)."""
    lib = _load()
    assert lib is not None, "native loader unavailable"
    n = len(paths)
    if num_threads is None:
        num_threads = min(os.cpu_count() or 1, 16)
    out = np.empty((n, resolution, resolution, 3), np.float32)
    ok = np.zeros(n, np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.nlc_load_batch(arr, n, resolution, int(random_crop),
                       ctypes.c_uint64(seed), num_threads,
                       out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                       ok.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return out, ok.astype(bool)


def load_paired_batch(lq_paths: Sequence[str], gt_paths: Sequence[str],
                      lq_patch: int, scale: int = 1, use_flip: bool = True,
                      use_rot: bool = True, seed: int = 0,
                      num_threads: Optional[int] = None,
                      dtype: str = "float32",
                      ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Paired restoration batch at native scale (no resize): same random
    crop offset and flip/rot draw for each lq/gt pair.

    dtype="uint8" keeps raw pixel bytes (4x smaller host->device
    transfers; the training step normalizes on-device), "float32"
    emits [0,1].

    -> (lq (N, P, P, 3), gt (N, P*scale, P*scale, 3),
        ok flags (N,) bool)."""
    lib = _load()
    assert lib is not None, "native loader unavailable"
    assert dtype in ("float32", "uint8"), dtype
    n = len(lq_paths)
    assert len(gt_paths) == n
    if num_threads is None:
        num_threads = min(os.cpu_count() or 1, 16)
    gt_patch = lq_patch * scale
    np_dt = np.uint8 if dtype == "uint8" else np.float32
    lq_out = np.empty((n, lq_patch, lq_patch, 3), np_dt)
    gt_out = np.empty((n, gt_patch, gt_patch, 3), np_dt)
    ok = np.zeros(n, np.int32)
    lq_arr = (ctypes.c_char_p * n)(*[p.encode() for p in lq_paths])
    gt_arr = (ctypes.c_char_p * n)(*[p.encode() for p in gt_paths])
    lib.nlc_load_paired_batch(
        lq_arr, gt_arr, n, lq_patch, int(scale), int(use_flip), int(use_rot),
        int(dtype == "uint8"), ctypes.c_uint64(seed), num_threads,
        lq_out.ctypes.data_as(ctypes.c_void_p),
        gt_out.ctypes.data_as(ctypes.c_void_p),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return lq_out, gt_out, ok.astype(bool)


def save_batch_png(images_u8: np.ndarray, paths: Sequence[str],
                   num_threads: Optional[int] = None) -> int:
    """Write (N, H, W, 3) uint8 images to PNG paths on the C++ thread pool.
    Returns how many were written. Caller falls back to PIL when the native
    library is unavailable."""
    lib = _load()
    assert lib is not None, "native writer unavailable"
    images_u8 = np.ascontiguousarray(images_u8, np.uint8)
    n, h, w, c = images_u8.shape
    assert c == 3
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    if num_threads is None:
        num_threads = min(os.cpu_count() or 1, 16)
    return lib.nlc_save_batch(
        images_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, h, w, arr, num_threads)
