"""PSNR/SSIM/FID metric tests: closed-form sanity + torch-reference parity
(the reference's psnr_ssim module needs skimage which this image lacks, so
parity is against a locally-stubbed import of its functions)."""
import sys
import types

import numpy as np
import pytest

from nlc_tpu.eval import calculate_psnr, calculate_ssim, frechet_distance
from nlc_tpu.eval.fid import compute_statistics, FIDStats, fallback_features, FIDComputer
from tests.conftest import requires_reference

RNG = np.random.RandomState(0)


def test_psnr_basics():
    img = RNG.rand(32, 32, 3)
    assert calculate_psnr(img, img) == float("inf")
    noisy = np.clip(img + 0.1, 0, 1)
    p1 = calculate_psnr(img, noisy)
    p2 = calculate_psnr(img, np.clip(img + 0.3, 0, 1))
    assert p2 < p1 < 30
    # uint8 range auto-detection
    p255 = calculate_psnr((img * 255).astype(np.uint8),
                          (noisy * 255).astype(np.uint8))
    assert abs(p255 - p1) < 1.0


def test_ssim_basics():
    img = RNG.rand(32, 32, 3)
    assert calculate_ssim((img * 255).astype(np.uint8),
                          (img * 255).astype(np.uint8)) == pytest.approx(1.0)
    noisy = np.clip(img + RNG.randn(32, 32, 3) * 0.2, 0, 1)
    s = calculate_ssim((img * 255).astype(np.uint8),
                       (noisy * 255).astype(np.uint8))
    assert 0 < s < 1
    # y-channel variant runs
    sy = calculate_ssim((img * 255).astype(np.uint8),
                        (noisy * 255).astype(np.uint8), test_y_channel=True)
    assert 0 < sy <= 1


def test_frechet_distance_closed_form():
    """FID between two Gaussians with identical stats is ~0; with shifted
    means it equals ||mu1-mu2||^2 when covariances match."""
    mu = np.zeros(8)
    sigma = np.eye(8)
    assert frechet_distance(mu, sigma, mu, sigma) == pytest.approx(0.0, abs=1e-6)
    mu2 = np.ones(8) * 0.5
    d = frechet_distance(mu, sigma, mu2, sigma)
    assert d == pytest.approx(8 * 0.25, abs=1e-5)
    # scaled covariance: analytic trace term (sqrt(1*4)=2): 8*(1+4-2*2)=8
    d2 = frechet_distance(mu, sigma, mu, 4 * sigma)
    assert d2 == pytest.approx(8.0, abs=1e-4)


def test_fid_computer_distribution_sensitivity(tmp_path):
    a = RNG.rand(64, 32, 32, 3)
    b = RNG.rand(64, 32, 32, 3)
    c = np.clip(RNG.rand(64, 32, 32, 3) * 0.3, 0, 1)   # different distribution
    stats_a = FIDStats(*compute_statistics(fallback_features(a)))
    path = tmp_path / "target.npz"
    stats_a.save(str(path))
    comp = FIDComputer(target=str(path))
    fid_same = comp.fid_of_images(b)
    fid_diff = comp.fid_of_images(c)
    assert fid_diff > fid_same


def _import_reference_psnr_ssim():
    """Import the reference psnr_ssim with skimage stubbed out (unused by the
    functions under test)."""
    sys.path.insert(0, "/root/reference")
    if "skimage" not in sys.modules:
        sk = types.ModuleType("skimage")
        skm = types.ModuleType("skimage.metrics")
        skm.structural_similarity = lambda *a, **k: 0.0
        sk.metrics = skm
        sys.modules["skimage"] = sk
        sys.modules["skimage.metrics"] = skm
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvu = types.ModuleType("torchvision.utils")
        tvu.make_grid = lambda *a, **k: None
        tvu.save_image = lambda *a, **k: None
        tv.utils = tvu
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.utils"] = tvu
    from basicsr.metrics import psnr_ssim
    return psnr_ssim


@requires_reference
def test_psnr_matches_reference(reference_path):
    ref = _import_reference_psnr_ssim()
    a = (RNG.rand(24, 24, 3) * 255).astype(np.uint8)
    b = np.clip(a.astype(int) + RNG.randint(-20, 20, a.shape), 0, 255).astype(np.uint8)
    ours = calculate_psnr(a, b, crop_border=2)
    theirs = ref.calculate_psnr(a, b, crop_border=2)
    np.testing.assert_allclose(ours, theirs, rtol=1e-6)
    ours_y = calculate_psnr(a, b, crop_border=0, test_y_channel=True)
    theirs_y = ref.calculate_psnr(a, b, crop_border=0, test_y_channel=True)
    np.testing.assert_allclose(ours_y, theirs_y, rtol=1e-6)


@requires_reference
def test_ssim_matches_reference_2d(reference_path):
    """Compare against the reference 2-D SSIM (its 3-D default path requires
    CUDA, reference psnr_ssim.py:187: .cuda())."""
    ref = _import_reference_psnr_ssim()
    a = (RNG.rand(24, 24, 3) * 255).astype(np.uint8)
    b = np.clip(a.astype(int) + RNG.randint(-20, 20, a.shape), 0, 255).astype(np.uint8)
    ours = calculate_ssim(a, b, crop_border=0, ssim3d=False)
    theirs = ref.calculate_ssim(a, b, crop_border=0, ssim3d=False)
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)
    ours_y = calculate_ssim(a, b, crop_border=0, test_y_channel=True)
    theirs_y = ref.calculate_ssim(a, b, crop_border=0, test_y_channel=True)
    np.testing.assert_allclose(ours_y, theirs_y, rtol=1e-5)


@requires_reference
def test_matlab_imresize_matches_reference(reference_path):
    """Our imresize vs basicsr's MATLAB-faithful torch implementation."""
    import sys, torch
    sys.path.insert(0, "/root/reference")
    _import_reference_psnr_ssim()   # installs the torchvision/skimage stubs
    from basicsr.utils.matlab_functions import imresize as ref_imresize
    from nlc_tpu.eval.matlab_resize import imresize

    rng = np.random.RandomState(0)
    img = rng.rand(17, 23, 3).astype(np.float32)
    for scale in [0.25, 0.5, 2.0, 1.7]:
        ours = imresize(img, scale)
        theirs = ref_imresize(img, scale)  # numpy in -> numpy HWC out
        if hasattr(theirs, "numpy"):
            theirs = theirs.numpy().transpose(1, 2, 0)
        theirs = np.asarray(theirs)
        np.testing.assert_allclose(ours, theirs, atol=2e-5, rtol=1e-4,
                                   err_msg=f"scale {scale}")


def test_matlab_imresize_basic():
    from nlc_tpu.eval.matlab_resize import imresize
    img = np.ones((16, 16, 3), np.float32) * 0.5
    out = imresize(img, 0.5)
    assert out.shape == (8, 8, 3)
    np.testing.assert_allclose(out, 0.5, atol=1e-6)
    out2 = imresize(img[..., 0], 2.0)
    assert out2.shape == (32, 32)
