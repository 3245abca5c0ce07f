"""NIQE golden vs the reference implementation, using the reference's
shipped pristine-statistics asset (niqe_pris_params.npz).

cv2 is not installed in this image; the reference's only cv2 use inside the
`niqe()` core is a 0.5-scale INTER_LINEAR resize, which on even dimensions
is exactly the 2x2 local mean (bilinear taps land at pixel-pair midpoints),
so the stub below is bit-faithful, not an approximation.
"""
import importlib.util
import sys
import types

import numpy as np
import pytest

from tests.conftest import requires_reference

REF_NIQE = "/root/reference/basicsr/metrics/niqe.py"
REF_NPZ = "/root/reference/basicsr/metrics/niqe_pris_params.npz"


def _halve_bilinear(src, dsize, interpolation=None):
    w2, h2 = dsize
    src = np.asarray(src)[: h2 * 2, : w2 * 2]
    return src.reshape(h2, 2, w2, 2).mean(axis=(1, 3)).astype(src.dtype)


@pytest.fixture(scope="module")
def ref_niqe():
    if "cv2" not in sys.modules:
        cv2_stub = types.ModuleType("cv2")
        cv2_stub.resize = _halve_bilinear
        cv2_stub.INTER_LINEAR = 1
        sys.modules["cv2"] = cv2_stub
    # scipy removed the scipy.ndimage.filters alias in newer releases
    try:
        import scipy.ndimage.filters  # noqa: F401
    except Exception:
        import scipy.ndimage
        filt = types.ModuleType("scipy.ndimage.filters")
        filt.convolve = scipy.ndimage.convolve
        sys.modules["scipy.ndimage.filters"] = filt
    # the module imports basicsr.metrics.metric_util (unused by niqe());
    # stub it to avoid pulling the whole basicsr package (which needs cv2)
    if "basicsr.metrics.metric_util" not in sys.modules:
        mu = types.ModuleType("basicsr.metrics.metric_util")
        mu.reorder_image = lambda img, input_order="HWC": img
        mu.to_y_channel = lambda img: img
        sys.modules["basicsr.metrics.metric_util"] = mu
    spec = importlib.util.spec_from_file_location("ref_niqe_mod", REF_NIQE)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@requires_reference
def test_niqe_matches_reference_on_shipped_npz(ref_niqe):
    """Full-pipeline golden: same gray image, the real pristine npz, core
    `niqe()` vs our `calculate_niqe` (reference niqe.py:150-211)."""
    from nlc_tpu.eval.niqe import calculate_niqe

    with np.load(REF_NPZ) as f:
        mu = f["mu_pris_param"]
        cov = f["cov_pris_param"]
        window = f["gaussian_window"]

    rng = np.random.RandomState(7)
    # structured image (smooth gradient + texture + noise), 2x2 blocks of 96
    yy, xx = np.mgrid[0:192, 0:192].astype(np.float64)
    img = (128 + 60 * np.sin(xx / 17.0) * np.cos(yy / 23.0)
           + 24 * rng.randn(192, 192))
    img = np.clip(img, 0, 255).astype(np.float32)

    ref_val = float(ref_niqe.niqe(img.copy(), mu, cov, window))
    ours = calculate_niqe(img, REF_NPZ, crop_border=0, convert_to_gray=False)
    assert np.isfinite(ref_val)
    np.testing.assert_allclose(ours, ref_val, rtol=2e-3)


@requires_reference
def test_niqe_aggd_features_match_reference(ref_niqe):
    """Per-block 18-dim feature vector parity, including a degenerate
    (single-sign) block where the reference produces NaN."""
    from nlc_tpu.eval.niqe import estimate_aggd_param, _compute_feature

    rng = np.random.RandomState(3)
    blocks = [
        rng.randn(48, 48),
        np.abs(rng.randn(48, 48)) + 0.1,      # no negatives -> NaN path
        rng.laplace(size=(96, 96)) * 0.5,
    ]
    for blk in blocks:
        with np.errstate(all="ignore"):
            ref_feat = np.asarray(ref_niqe.compute_feature(blk))
            ref_aggd = np.asarray(ref_niqe.estimate_aggd_param(blk))
        ours_feat = np.asarray(_compute_feature(blk))
        ours_aggd = np.asarray(estimate_aggd_param(blk))
        np.testing.assert_allclose(ours_aggd, ref_aggd, rtol=1e-10,
                                   equal_nan=True)
        np.testing.assert_allclose(ours_feat, ref_feat, rtol=1e-10,
                                   equal_nan=True)


@requires_reference
def test_niqe_crop_border_matches_reference(ref_niqe):
    """crop_border is applied after gray conversion, before feature
    extraction (reference calculate_niqe order, niqe.py:199-213)."""
    from nlc_tpu.eval.niqe import calculate_niqe

    with np.load(REF_NPZ) as f:
        mu, cov, window = (f["mu_pris_param"], f["cov_pris_param"],
                           f["gaussian_window"])
    rng = np.random.RandomState(11)
    img = np.clip(rng.rand(200, 200) * 255, 0, 255).astype(np.float32)
    ref_val = float(ref_niqe.niqe(img[4:-4, 4:-4].copy(), mu, cov, window))
    ours = calculate_niqe(img, REF_NPZ, crop_border=4, convert_to_gray=False)
    np.testing.assert_allclose(ours, ref_val, rtol=2e-3)
