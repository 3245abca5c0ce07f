"""Differentiable Canny + hint utilities (reference src/net_canny.py,
src/control_utils.py). The reference module needs cv2/kornia (absent here),
so verification is against closed-form expectations of each stage."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nlc_tpu.ops.canny import (CannyFilter, CannyDetector, HWC3,
                               create_image_grid, gaussian_kernel_2d,
                               sobel_kernel, nms_kernels, get_edge_hint,
                               get_canny_edges)


def test_kernels_closed_form():
    g = gaussian_kernel_2d(3, 0.0, 1.0)
    np.testing.assert_allclose(g.sum(), 1.0, atol=1e-12)
    assert g[1, 1] == g.max()                       # peaked at center
    np.testing.assert_allclose(g, g.T)              # radially symmetric
    s = sobel_kernel(3)
    np.testing.assert_allclose(s[:, 1], 0.0)        # zero center column
    np.testing.assert_allclose(s, -s[:, ::-1])      # antisymmetric in x
    ks = nms_kernels()
    assert ks.shape == (8, 3, 3)
    for k in ks:
        assert k[1, 1] == 1.0 and k.sum() == 0.0    # center minus one neighbor
    # opposite directions use opposite neighbors
    for i in range(4):
        np.testing.assert_allclose(ks[i], ks[i + 4][::-1, ::-1])


def test_canny_square_edges():
    """A filled square: NMS leaves a thin boundary, interior stays empty,
    and gradients point the right way."""
    img = np.zeros((1, 1, 32, 32), np.float32)
    img[:, :, 8:24, 8:24] = 1.0
    f = CannyFilter()
    blurred, gx, gy, mag, ori, thin = (np.asarray(o) for o in
                                       f(img, 0.1, 0.3, hysteresis=True))
    assert blurred.shape == img.shape
    assert thin[0, 0, 12:20, 12:20].max() == 0.0     # interior suppressed
    assert thin.sum() > 0                            # boundary detected
    assert set(np.unique(thin)) <= {0.0, 1.0}        # hysteresis binarizes
    # horizontal gradient is strongest at the vertical boundaries
    assert abs(gx[0, 0, 16, 8]) > abs(gx[0, 0, 16, 16])
    # ternary map without hysteresis
    *_, thin3 = f(img, 0.001, 0.3, hysteresis=False)
    assert set(np.unique(np.asarray(thin3))) <= {0.0, 0.5, 1.0}
    # thresholdless call returns raw thin magnitudes
    *_, raw = f(img)
    assert np.asarray(raw).max() > 0.3


def test_canny_differentiable():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(1, 3, 16, 16).astype(np.float32))
    f = CannyFilter()

    def loss(x):
        return jnp.sum(f(x)[3])   # gradient magnitude

    g = jax.grad(loss)(img)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0.0


def test_canny_detector_uint8():
    rng = np.random.RandomState(1)
    img = np.zeros((24, 24), np.uint8)
    img[6:18, 6:18] = 255
    edges = CannyDetector()(img, 50, 150)
    assert edges.dtype == np.uint8
    assert set(np.unique(edges)) <= {0, 255}
    assert edges[9:15, 9:15].max() == 0
    # 3-channel input works too
    edges3 = CannyDetector()(np.stack([img] * 3, -1), 50, 150)
    np.testing.assert_array_equal(edges3, edges)


def test_threshold_sweep_no_recompile():
    """Thresholds are traced: sweeping them reuses one compiled program."""
    from nlc_tpu.ops.canny import _canny_forward
    img = np.zeros((1, 1, 16, 16), np.float32)
    img[..., 8:] = 1.0
    f = CannyFilter()
    before = _canny_forward._cache_size()
    for low, high in [(0.05, 0.2), (0.1, 0.3), (0.02, 0.5), (0.3, 0.6)]:
        f(img, low, high, hysteresis=True)
    added = _canny_forward._cache_size() - before
    assert added <= 1, f"{added} compilations for a threshold sweep"


def test_detector_threshold_calibration():
    """cv2-unit thresholds select comparable contrast: a mid-contrast edge
    (100/255) passes cv2-typical thresholds (50, 150) but a low-contrast one
    (20/255) does not."""
    det = CannyDetector()
    def square(v):
        img = np.zeros((24, 24), np.uint8)
        img[6:18, 6:18] = v
        return img
    assert det(square(100), 50, 150).sum() > 0
    assert det(square(20), 50, 150).sum() == 0


def test_hwc3():
    g = np.full((4, 4), 7, np.uint8)
    out = HWC3(g)
    assert out.shape == (4, 4, 3) and (out == 7).all()
    rgba = np.zeros((2, 2, 4), np.uint8)
    rgba[..., :3] = 100
    rgba[..., 3] = 0                 # fully transparent -> white matte
    np.testing.assert_array_equal(HWC3(rgba), 255)
    rgb = np.ones((2, 2, 3), np.uint8)
    assert HWC3(rgb) is rgb
    with pytest.raises(AssertionError):
        HWC3(np.zeros((2, 2), np.float32))


def test_create_image_grid():
    imgs = np.arange(5 * 2 * 3 * 1).reshape(5, 2, 3, 1).astype(np.uint8)
    grid = create_image_grid(imgs)                  # auto 3x2
    assert grid.shape == (2 * 2, 3 * 3, 1)
    np.testing.assert_array_equal(grid[:2, :3], imgs[0])
    np.testing.assert_array_equal(grid[2:4, :3], imgs[3])
    grid2 = create_image_grid(imgs, grid_size=(5, None))
    assert grid2.shape == (2, 15, 1)
    grid3 = create_image_grid(imgs, grid_size=(None, 5))
    assert grid3.shape == (10, 3, 1)


def test_edge_hints():
    rng = np.random.RandomState(2)
    img = np.zeros((20, 28, 3), np.uint8)
    img[5:15, 8:20] = 200
    hint = get_edge_hint(img, size=16, low_th=50, high_th=150)
    assert hint.shape == (16, 16, 3)
    assert 0.0 <= hint.min() and hint.max() <= 1.0
    edges = get_canny_edges(img, low_th=50, high_th=150)
    assert edges.shape == (20, 28)
    assert set(np.unique(edges)) <= {0.0, 1.0}
    # randomized thresholds draw from the documented ranges
    edges2 = get_canny_edges(img, low_th=None, high_th=None,
                             rng=np.random.RandomState(3))
    assert edges2.shape == (20, 28)
