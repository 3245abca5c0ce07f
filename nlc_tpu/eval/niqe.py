"""NIQE (Natural Image Quality Evaluator) — no-reference quality metric.

Parity with reference basicsr/metrics/niqe.py: MSCN coefficients, AGGD
feature fitting over 96x96 blocks at two scales, Mahalanobis-style distance
to pristine multivariate-Gaussian statistics. The pristine parameters
(mu_pris_param, cov_pris_param, gaussian_window) load from the standard
niqe_pris_params.npz asset (shipped with BasicSR releases; pass its path —
the store/ asset pattern used throughout this framework).
"""
from __future__ import annotations

from typing import Tuple

import numpy as np
from scipy.ndimage import convolve
from scipy.special import gamma


def _gaussian_window(size: int = 7, sigma: float = 7 / 6) -> np.ndarray:
    half = size // 2
    x = np.arange(-half, half + 1, dtype=np.float64)
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    w = np.outer(g, g)
    return w / w.sum()


def estimate_aggd_param(block: np.ndarray) -> Tuple[float, float, float]:
    """Asymmetric generalized Gaussian fit (reference niqe.py:16-44).

    Degenerate blocks (no negative or no positive coefficients) produce NaN
    exactly as the reference does; downstream the NaN rows are dropped by the
    nancov-style covariance and skipped by nanmean — guarding them here would
    silently shift the score instead."""
    block = block.flatten()
    gam = np.arange(0.2, 10.001, 0.001)
    gam_reciprocal = np.reciprocal(gam)
    r_gam = np.square(gamma(gam_reciprocal * 2)) / (
        gamma(gam_reciprocal) * gamma(gam_reciprocal * 3))
    with np.errstate(invalid="ignore", divide="ignore"):
        left_std = np.sqrt(np.mean(block[block < 0] ** 2))
        right_std = np.sqrt(np.mean(block[block > 0] ** 2))
        gammahat = left_std / right_std
        rhat = (np.mean(np.abs(block))) ** 2 / np.mean(block ** 2)
        rhatnorm = (rhat * (gammahat ** 3 + 1) * (gammahat + 1)) / \
            ((gammahat ** 2 + 1) ** 2)
        array_position = np.argmin((r_gam - rhatnorm) ** 2)
    alpha = gam[array_position]
    beta_l = left_std * np.sqrt(gamma(1 / alpha) / gamma(3 / alpha))
    beta_r = right_std * np.sqrt(gamma(1 / alpha) / gamma(3 / alpha))
    return alpha, beta_l, beta_r


def _compute_feature(block: np.ndarray) -> list:
    feat = []
    alpha, beta_l, beta_r = estimate_aggd_param(block)
    feat.extend([alpha, (beta_l + beta_r) / 2])
    shifts = [(0, 1), (1, 0), (1, 1), (1, -1)]
    for sh in shifts:
        shifted = np.roll(block, sh, axis=(0, 1))
        alpha, beta_l, beta_r = estimate_aggd_param(block * shifted)
        mean = (beta_r - beta_l) * (gamma(2 / alpha) / gamma(1 / alpha))
        feat.extend([alpha, mean, beta_l, beta_r])
    return feat


def niqe_features(img: np.ndarray, block_size: int = 96,
                  window: np.ndarray | None = None) -> np.ndarray:
    """img: (H, W) gray float [0,255]. Returns per-block 36-dim features over
    two scales (reference niqe.py:75-147 `niqe`). `window` is the 7x7
    smoothing kernel; the pristine npz ships the canonical one, computed here
    only as a fallback. The inter-scale half-downscale is a 2x2 local mean —
    bit-equal to the reference's cv2.resize INTER_LINEAR at exactly 0.5 scale
    on even dims (bilinear taps land at pixel-pair midpoints)."""
    if window is None:
        window = _gaussian_window()
    feats_all = []
    img = img.astype(np.float64)
    h, w = img.shape
    num_bh = h // block_size
    num_bw = w // block_size
    img = img[: num_bh * block_size, : num_bw * block_size]
    for scale in (1, 2):
        mu = convolve(img, window, mode="nearest")
        sigma = np.sqrt(np.abs(convolve(img ** 2, window, mode="nearest") - mu ** 2))
        mscn = (img - mu) / (sigma + 1)
        feats = []
        bs = block_size // scale
        for by in range(num_bh):
            for bx in range(num_bw):
                block = mscn[by * bs:(by + 1) * bs, bx * bs:(bx + 1) * bs]
                feats.append(_compute_feature(block))
        feats_all.append(np.asarray(feats))
        if scale == 1:
            # downscale by 2 (local average)
            hh = (img.shape[0] // 2) * 2
            ww = (img.shape[1] // 2) * 2
            img = img[:hh, :ww].reshape(hh // 2, 2, ww // 2, 2).mean(axis=(1, 3))
    return np.concatenate(feats_all, axis=1)


def calculate_niqe(img: np.ndarray, pris_params_path: str,
                   crop_border: int = 0, convert_to_gray: bool = True) -> float:
    """img: (H, W, 3) or (H, W) uint8/float [0,255]."""
    with np.load(pris_params_path) as f:
        # the shipped asset stores mu as (1, 36)
        mu_pris = f["mu_pris_param"].ravel()
        cov_pris = f["cov_pris_param"]
        window = f["gaussian_window"] if "gaussian_window" in f else None
    # the reference casts to float32 before conversion (niqe.py:199)
    img = np.asarray(img, np.float32)
    if img.ndim == 3 and convert_to_gray:
        from .psnr_ssim import rgb2ycbcr_y
        img = rgb2ycbcr_y(img / 255.0) * 255.0
    img = np.squeeze(img)
    if crop_border:
        img = img[crop_border:-crop_border, crop_border:-crop_border]
    feats = niqe_features(img, window=window)
    mu_dist = np.nanmean(feats, axis=0)
    # nancov semantics (niqe.py:152-154): drop rows containing NaN
    valid = feats[~np.isnan(feats).any(axis=1)]
    cov_dist = np.cov(valid, rowvar=False)
    cov_avg = (cov_pris + cov_dist) / 2
    pinv = np.linalg.pinv(cov_avg)
    d = mu_pris - mu_dist
    return float(np.sqrt(d @ pinv @ d))
