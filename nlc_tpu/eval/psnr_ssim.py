"""PSNR / SSIM with the reference's exact variants.

Behavior parity with basicsr/metrics/psnr_ssim.py (the function the diffusion
eval path imports at image_sample.py:19):
  calculate_psnr         :16-80   (crop_border, HWC/CHW, Y-channel, auto range)
  _ssim (2-D windowed)   :94-125  (11x11 gauss sigma 1.5, valid crop)
  _ssim_3d               :171-210 (3-D gaussian, replicate padding — the
                                   DEFAULT used by calculate_ssim(ssim3d=True))
  _ssim_cly (Y-channel)  :212-250 (replicate border 2-D)
  calculate_ssim         :253-330
  bgr2ycbcr/to_y_channel basicsr/utils/matlab_functions.py:213-244

Host-side numpy/scipy — metrics run over decoded PNGs, not on TPU.
"""
from __future__ import annotations

import numpy as np
from scipy.ndimage import convolve


def _gaussian_kernel_1d(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    # cv2.getGaussianKernel formula
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2
    k = np.exp(-(x ** 2) / (2 * sigma ** 2))
    return (k / k.sum()).reshape(-1, 1)


def bgr2ycbcr(img: np.ndarray, y_only: bool = False) -> np.ndarray:
    """MATLAB-faithful BT.601 conversion; img float in [0,1] (BGR order).
    Float output is scaled back to [0,1] like the reference's
    _convert_output_type_range (matlab_functions.py:243)."""
    if y_only:
        out = np.dot(img, [24.966, 128.553, 65.481]) + 16.0
    else:
        out = np.matmul(img, [[24.966, 112.0, -18.214],
                              [128.553, -74.203, -93.786],
                              [65.481, -37.797, 112.0]]) + [16, 128, 128]
    return out / 255.0


def rgb2ycbcr_y(img: np.ndarray) -> np.ndarray:
    """Y channel from an RGB image in [0,1], scaled to [0,1]."""
    return (np.dot(img, [65.481, 128.553, 24.966]) + 16.0) / 255.0


def _to_y_channel(img: np.ndarray) -> np.ndarray:
    """basicsr to_y_channel: input range [0,255], BGR ordering assumption."""
    img = img.astype(np.float32) / 255.0
    if img.ndim == 3 and img.shape[2] == 3:
        img = bgr2ycbcr(img, y_only=True)
        img = img[..., None]
    return img * 255.0


def _reorder(img: np.ndarray, input_order: str) -> np.ndarray:
    if img.ndim == 2:
        img = img[..., None]
    if input_order == "CHW":
        img = img.transpose(1, 2, 0)
    return img


def calculate_psnr(img1, img2, crop_border: int = 0, input_order: str = "HWC",
                   test_y_channel: bool = False) -> float:
    img1 = _reorder(np.asarray(img1), input_order).astype(np.float64)
    img2 = _reorder(np.asarray(img2), input_order).astype(np.float64)
    assert img1.shape == img2.shape, (img1.shape, img2.shape)
    if crop_border:
        img1 = img1[crop_border:-crop_border, crop_border:-crop_border]
        img2 = img2[crop_border:-crop_border, crop_border:-crop_border]
    if test_y_channel:
        img1 = _to_y_channel(img1)
        img2 = _to_y_channel(img2)
    mse = np.mean((img1 - img2) ** 2)
    if mse == 0:
        return float("inf")
    max_value = 1.0 if img1.max() <= 1 else 255.0
    return float(20.0 * np.log10(max_value / np.sqrt(mse)))


def _ssim_2d(img1: np.ndarray, img2: np.ndarray, max_value: float) -> float:
    """Valid-crop 2-D windowed SSIM (per-channel if HWC)."""
    C1 = (0.01 * max_value) ** 2
    C2 = (0.03 * max_value) ** 2
    k = _gaussian_kernel_1d()
    window = np.outer(k, k.T)

    def filt(x):
        if x.ndim == 3:
            return np.stack([convolve(x[..., c], window, mode="nearest")
                             for c in range(x.shape[2])], axis=-1)
        return convolve(x, window, mode="nearest")

    img1 = img1.astype(np.float64)
    img2 = img2.astype(np.float64)
    mu1 = filt(img1)[5:-5, 5:-5]
    mu2 = filt(img2)[5:-5, 5:-5]
    s1 = filt(img1 ** 2)[5:-5, 5:-5] - mu1 ** 2
    s2 = filt(img2 ** 2)[5:-5, 5:-5] - mu2 ** 2
    s12 = filt(img1 * img2)[5:-5, 5:-5] - mu1 * mu2
    num = (2 * mu1 * mu2 + C1) * (2 * s12 + C2)
    den = (mu1 ** 2 + mu2 ** 2 + C1) * (s1 + s2 + C2)
    return float((num / den).mean())


def _ssim_3d(img1: np.ndarray, img2: np.ndarray, max_value: float) -> float:
    """3-D gaussian SSIM over (H, W, C) with replicate padding — the default
    path of calculate_ssim (reference _ssim_3d)."""
    C1 = (0.01 * max_value) ** 2
    C2 = (0.03 * max_value) ** 2
    k1 = _gaussian_kernel_1d().reshape(-1)
    window2 = np.outer(k1, k1)
    kernel3 = np.stack([window2 * kk for kk in k1], axis=0)  # (11, 11, 11) D,H,W
    # torch Conv3d on (H, W, C)-as-(D,H,W) with replicate padding
    kernel3 = np.transpose(kernel3, (1, 2, 0))               # align to (H, W, C)

    def filt(x):
        return convolve(x.astype(np.float64), kernel3, mode="nearest")

    img1 = img1.astype(np.float64)
    img2 = img2.astype(np.float64)
    mu1 = filt(img1)
    mu2 = filt(img2)
    s1 = filt(img1 ** 2) - mu1 ** 2
    s2 = filt(img2 ** 2) - mu2 ** 2
    s12 = filt(img1 * img2) - mu1 * mu2
    num = (2 * mu1 * mu2 + C1) * (2 * s12 + C2)
    den = (mu1 ** 2 + mu2 ** 2 + C1) * (s1 + s2 + C2)
    return float((num / den).mean())


def _ssim_y(img1: np.ndarray, img2: np.ndarray) -> float:
    """Y-channel 2-D SSIM with replicate border (reference _ssim_cly)."""
    C1 = (0.01 * 255) ** 2
    C2 = (0.03 * 255) ** 2
    k = _gaussian_kernel_1d()
    window = np.outer(k, k.T)

    def filt(x):
        return convolve(x.astype(np.float64), window, mode="nearest")

    mu1 = filt(img1)
    mu2 = filt(img2)
    s1 = filt(img1.astype(np.float64) ** 2) - mu1 ** 2
    s2 = filt(img2.astype(np.float64) ** 2) - mu2 ** 2
    s12 = filt(img1.astype(np.float64) * img2) - mu1 * mu2
    num = (2 * mu1 * mu2 + C1) * (2 * s12 + C2)
    den = (mu1 ** 2 + mu2 ** 2 + C1) * (s1 + s2 + C2)
    return float((num / den).mean())


def calculate_ssim(img1, img2, crop_border: int = 0, input_order: str = "HWC",
                   test_y_channel: bool = False, ssim3d: bool = True) -> float:
    img1 = _reorder(np.asarray(img1), input_order).astype(np.float64)
    img2 = _reorder(np.asarray(img2), input_order).astype(np.float64)
    assert img1.shape == img2.shape, (img1.shape, img2.shape)
    if crop_border:
        img1 = img1[crop_border:-crop_border, crop_border:-crop_border]
        img2 = img2[crop_border:-crop_border, crop_border:-crop_border]
    if test_y_channel:
        y1 = _to_y_channel(img1)
        y2 = _to_y_channel(img2)
        return _ssim_y(y1[..., 0], y2[..., 0])
    max_value = 1.0 if img1.max() <= 1 else 255.0
    if ssim3d and img1.ndim == 3:
        return _ssim_3d(img1, img2, max_value)
    return _ssim_2d(img1, img2, max_value)
