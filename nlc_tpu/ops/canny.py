"""Differentiable Canny edge filter + edge-hint utilities.

Rebuilds the reference's conv-pipeline Canny (src/net_canny.py:61-193) and
the hint helpers (src/control_utils.py) without cv2/kornia/torch: every stage
— Gaussian blur, Sobel gradients, 8-direction non-maximum suppression,
double-threshold + hysteresis — is one jitted XLA program built from
`lax.conv` with precomputed kernels, so edges are differentiable end-to-end
(usable as a guidance/hint signal on TPU).

Faithfully reproduced reference quirks, so outputs match a torch port:
  * Sobel kernels are x/(x²+y²) normalized (net_canny.py:51-60), not the
    classic ±1/±2 taps;
  * gradient orientation is scaled by 360/pi (NOT 180/pi) before the 45°
    rounding (net_canny.py:145-147), i.e. directions bin at 22.5° of true
    angle;
  * hysteresis marks a weak pixel strong when the 3x3 (1.25-weighted) sum of
    the thresholded map exceeds 1 (net_canny.py:115-121,180-186).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def gaussian_kernel_2d(k: int = 3, mu: float = 0.0, sigma: float = 1.0,
                       normalize: bool = True) -> np.ndarray:
    """Radial Gaussian on a [-1, 1]² lattice (net_canny.py:15-26)."""
    line = np.linspace(-1, 1, k)
    x, y = np.meshgrid(line, line)
    dist = np.sqrt(x ** 2 + y ** 2)
    g = np.exp(-(dist - mu) ** 2 / (2 * sigma ** 2)) / (2 * np.pi * sigma ** 2)
    return g / g.sum() if normalize else g


def sobel_kernel(k: int = 3) -> np.ndarray:
    """x / (x² + y²) Sobel variant (net_canny.py:51-60)."""
    line = np.linspace(-(k // 2), k // 2, k)
    x, y = np.meshgrid(line, line)
    den = x ** 2 + y ** 2
    den[:, k // 2] = 1.0
    return x / den


def nms_kernels() -> np.ndarray:
    """8 directional difference kernels (center − neighbor at 45°·i); the
    reference builds these by cv2-rotating a [+1, −1…] stencil and keeping
    the ±1 cells (net_canny.py:28-50) — constructed directly here."""
    # neighbor offsets (dy, dx) for angles 0,45,...,315 in image coords
    # (rotation is counter-clockwise in cv2's convention; y axis points down)
    offsets = [(0, 1), (-1, 1), (-1, 0), (-1, -1),
               (0, -1), (1, -1), (1, 0), (1, 1)]
    ks = np.zeros((8, 3, 3))
    for i, (dy, dx) in enumerate(offsets):
        ks[i, 1, 1] = 1.0
        ks[i, 1 + dy, 1 + dx] = -1.0
    return ks


def _conv(x: jnp.ndarray, kernel: np.ndarray) -> jnp.ndarray:
    """NCHW same-padding conv with an (O, I, kh, kw) numpy kernel."""
    k = jnp.asarray(kernel, x.dtype)
    pad = kernel.shape[-1] // 2
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))


class CannyFilter:
    """forward(img NCHW in [0,1]) -> (blurred, grad_x, grad_y, magnitude,
    orientation, thin_edges), matching the reference module's contract
    (net_canny.py:123-192). Thresholds make the output binary/ternary; with
    hysteresis, weak edges survive only next to strong ones."""

    def __init__(self, k_gaussian: int = 3, mu: float = 0.0, sigma: float = 1.0,
                 k_sobel: int = 3):
        g = gaussian_kernel_2d(k_gaussian, mu, sigma)
        s = sobel_kernel(k_sobel)
        self.kernels = {                                # a pytree, jit-friendly
            "gauss": g[None, None],
            "sobel_x": s[None, None],
            "sobel_y": s.T[None, None],
            "directional": nms_kernels()[:, None],      # (8, 1, 3, 3)
            "hyst": (np.ones((3, 3)) + 0.25)[None, None],
        }

    def __call__(self, img, low_threshold: Optional[float] = None,
                 high_threshold: Optional[float] = None,
                 hysteresis: bool = False):
        # thresholds stay traced (only their presence is static), so sweeping
        # or randomizing them never recompiles
        return _canny_forward(
            self.kernels, img,
            jnp.float32(0.0 if low_threshold is None else low_threshold),
            jnp.float32(0.0 if high_threshold is None else high_threshold),
            low_threshold is not None, high_threshold is not None,
            bool(hysteresis))

    forward = __call__


@partial(jax.jit, static_argnames=("has_low", "has_high", "hysteresis"))
def _canny_forward(kernels, img, low, high, has_low: bool, has_high: bool,
                   hysteresis: bool):
    img = jnp.asarray(img, jnp.float32)
    b, c, h, w = img.shape
    chans = [_conv(img[:, i:i + 1], kernels["gauss"]) for i in range(c)]
    blurred = jnp.concatenate(chans, axis=1)
    grad_x = sum(_conv(ch, kernels["sobel_x"]) for ch in chans) / c
    grad_y = sum(_conv(ch, kernels["sobel_y"]) for ch in chans) / c
    magnitude = jnp.sqrt(grad_x ** 2 + grad_y ** 2)
    orientation = jnp.arctan(grad_y / grad_x)           # NaN where grad_x==0,
    orientation = orientation * (360.0 / np.pi) + 180.0  # as in the reference
    orientation = jnp.round(orientation / 45.0) * 45.0

    directional = _conv(magnitude, kernels["directional"])      # (B, 8, H, W)
    positive_idx = (orientation / 45.0) % 8
    thin = magnitude
    for pos_i in range(4):
        neg_i = pos_i + 4
        oriented = (positive_idx == pos_i) | (positive_idx == neg_i)
        is_max = jnp.minimum(directional[:, pos_i:pos_i + 1],
                             directional[:, neg_i:neg_i + 1]) > 0.0
        thin = jnp.where(oriented & ~is_max, 0.0, thin)

    if has_low:
        low_mask = thin > low
        if has_high:
            high_mask = thin > high
            thin = low_mask * 0.5 + high_mask * 0.5
            if hysteresis:
                weak = thin == 0.5
                weak_is_high = (_conv(thin, kernels["hyst"]) > 1.0) & weak
                thin = (high_mask | weak_is_high).astype(jnp.float32)
        else:
            thin = low_mask.astype(jnp.float32)
    return blurred, grad_x, grad_y, magnitude, orientation, thin


# --------------------------------------------------------------------------
# hint utilities (reference src/control_utils.py)
# --------------------------------------------------------------------------

class CannyDetector:
    """uint8 HWC/HW image + thresholds -> uint8 edge map (control_utils.py:13;
    the reference delegates to cv2.Canny — here the differentiable filter runs
    with hysteresis on). Thresholds come in cv2.Canny's gradient units, where
    a full-contrast 0->255 step registers |gx|+|gy| = 4*255 = 1020 under the
    unblurred +-1/+-2 L1 Sobel; they are rescaled by this filter's measured
    response to the same step edge so the same numeric thresholds select
    comparable contrast levels."""

    # cv2.Canny L1 gradient of a full-contrast step edge (L2gradient=False)
    _CV2_STEP_RESPONSE = 4.0 * 255.0

    def __init__(self):
        self._filter = CannyFilter()
        step = np.zeros((1, 1, 16, 16), np.float32)
        step[..., 8:] = 1.0
        self._step_response = float(np.asarray(self._filter(step)[3]).max())

    def __call__(self, img: np.ndarray, low_threshold: float,
                 high_threshold: float) -> np.ndarray:
        img = np.asarray(img)
        if img.ndim == 2:
            img = img[:, :, None]
        x = jnp.asarray(np.transpose(img, (2, 0, 1))[None], jnp.float32) / 255.0
        scale = self._step_response / self._CV2_STEP_RESPONSE
        *_, thin = self._filter(x, low_threshold * scale,
                                high_threshold * scale, hysteresis=True)
        return (np.asarray(thin)[0, 0] * 255).astype(np.uint8)


def HWC3(x: np.ndarray) -> np.ndarray:
    """Grayscale -> 3ch; RGBA -> white-matted RGB (control_utils.py:17-33)."""
    assert x.dtype == np.uint8
    if x.ndim == 2:
        x = x[:, :, None]
    assert x.ndim == 3
    c = x.shape[2]
    assert c in (1, 3, 4)
    if c == 3:
        return x
    if c == 1:
        return np.concatenate([x, x, x], axis=2)
    color = x[:, :, :3].astype(np.float32)
    alpha = x[:, :, 3:4].astype(np.float32) / 255.0
    return np.clip(color * alpha + 255.0 * (1.0 - alpha), 0, 255).astype(np.uint8)


def create_image_grid(images: np.ndarray,
                      grid_size: Optional[Tuple[int, int]] = None) -> np.ndarray:
    """Paste N HWC images into one grid image (control_utils.py:35-71; the
    reference sizes the grid width with img_h — fixed here to img_w)."""
    assert images.ndim == 4, f"images has shape {images.shape}"
    num, img_h, img_w, c = images.shape
    if grid_size is not None:
        grid_w, grid_h = grid_size
        if grid_w is None:
            grid_w = num // grid_h + min(num % grid_h, 1)
        elif grid_h is None:
            grid_h = num // grid_w + min(num % grid_w, 1)
    else:
        grid_w = max(int(np.ceil(np.sqrt(num))), 1)
        grid_h = max((num - 1) // grid_w + 1, 1)
    assert grid_w * grid_h >= num
    grid = np.zeros((grid_h * img_h, grid_w * img_w, c), images.dtype)
    for idx in range(num):
        x = (idx % grid_w) * img_w
        y = (idx // grid_w) * img_h
        grid[y:y + img_h, x:x + img_w] = images[idx]
    return grid


def get_edge_hint(image, size: int = 512, low_th: float = 50,
                  high_th: float = 300) -> np.ndarray:
    """Canny edges of a center-cropped, resized image as a [0,1] 3-channel
    hint (control_utils.py:73-99; PIL replaces torchvision transforms)."""
    from PIL import Image

    image = np.asarray(image).astype(np.uint8)[..., :3]
    edges = CannyDetector()(image, low_th, high_th)
    im = Image.fromarray(edges)
    w, h = im.size
    m = min(w, h)
    im = im.crop(((w - m) // 2, (h - m) // 2,
                  (w - m) // 2 + m, (h - m) // 2 + m)).resize((size, size))
    return HWC3(np.asarray(im).astype(np.uint8)) / 255.0


def get_canny_edges(image, low_th: Optional[float] = 50,
                    high_th: Optional[float] = 200,
                    rng: Optional[np.random.RandomState] = None) -> np.ndarray:
    """Original-size [0,1] grayscale edges; thresholds randomized when None
    (control_utils.py:101-108)."""
    rng = rng or np.random
    image = np.asarray(image).astype(np.uint8)
    low_th = low_th or rng.randint(50, 100)
    high_th = high_th or rng.randint(200, 350)
    return CannyDetector()(image, low_th, high_th) / 255.0
