"""FID: activation statistics + Frechet distance + pluggable feature extractor.

Behavior parity with the reference's use of pytorch_fid
(src/experiments.py:210-226: InceptionV3 pool3 features against precomputed
mu/sigma .npz targets). The machinery here is self-contained:

  compute_statistics(features) -> (mu, sigma)
  frechet_distance(mu1, s1, mu2, s2)    (pytorch_fid's stabilized sqrtm form)
  FIDComputer: walks an image dir / takes arrays, batches them through a
      feature extractor, compares against a target stats .npz
      (the store/fid/*.npz schema).

Feature extractors:
  * InceptionV3 FID port (eval/inception.py) loaded from a user-supplied
    pt_inception-2015-12-05 checkpoint — gives numbers comparable to
    published FIDs (the reference equally requires that download).
  * fallback_features: a fixed random-projection + pooling embedding usable
    when no Inception weights exist. Deterministic and distribution-sensitive
    — good for relative tracking in training loops, NOT comparable to
    published FID numbers (clearly labeled).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional, Tuple

import numpy as np


def compute_statistics(features: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    mu = features.mean(axis=0)
    sigma = np.cov(features, rowvar=False)
    return mu, sigma


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """||mu1-mu2||^2 + Tr(s1 + s2 - 2 sqrt(s1 s2)), with the numerical
    stabilization used by pytorch_fid (eps jitter on singular product)."""
    from scipy import linalg

    mu1 = np.atleast_1d(mu1)
    mu2 = np.atleast_1d(mu2)
    sigma1 = np.atleast_2d(sigma1)
    sigma2 = np.atleast_2d(sigma2)
    diff = mu1 - mu2
    covmean = linalg.sqrtm(sigma1.dot(sigma2))  # scipy >=1.18 drops disp
    if isinstance(covmean, tuple):              # older scipy (X, errest)
        covmean = covmean[0]
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


@dataclass
class FIDStats:
    mu: np.ndarray
    sigma: np.ndarray

    @classmethod
    def load(cls, path: str) -> "FIDStats":
        """store/fid/*.npz schema: arrays 'mu' and 'sigma'."""
        with np.load(path) as f:
            return cls(mu=f["mu"][:], sigma=f["sigma"][:])

    def save(self, path: str) -> None:
        np.savez(path, mu=self.mu, sigma=self.sigma)

    def distance(self, other: "FIDStats") -> float:
        return frechet_distance(self.mu, self.sigma, other.mu, other.sigma)


def fallback_features(images: np.ndarray, dims: int = 512, seed: int = 0
                      ) -> np.ndarray:
    """Random-projection embedding of 32x32-downsampled images.

    NOT Inception features — relative-tracking only (see module docstring).
    images: (N, H, W, 3) uint8 or float [0,1].
    """
    x = np.asarray(images, np.float32)
    if x.max() > 1.5:
        x = x / 255.0
    n, h, w, c = x.shape
    # average-pool to 32x32
    th = max(h // 32, 1)
    x = x[:, : 32 * th, : 32 * th if w >= 32 * th else w]
    x = x.reshape(n, 32, th, -1, th, c).mean(axis=(2, 4))
    flat = x.reshape(n, -1)
    rng = np.random.RandomState(seed)
    proj = rng.randn(flat.shape[1], dims).astype(np.float32) / np.sqrt(flat.shape[1])
    feats = np.tanh(flat @ proj)
    return np.concatenate([feats, flat[:, : dims // 4]], axis=1)


class FIDComputer:
    """End-to-end FID against a target stats file (fid_helper parity,
    reference experiments.py:210-226)."""

    def __init__(self, target: Optional[str | FIDStats] = None,
                 extractor: Optional[Callable[[np.ndarray], np.ndarray]] = None,
                 batch_size: int = 128):
        if isinstance(target, str):
            target = FIDStats.load(target)
        self.target = target
        self.extractor = extractor or fallback_features
        self.batch_size = batch_size
        self.is_inception = extractor is not None

    @property
    def backend(self) -> str:
        """'inception' (comparable to published pytorch_fid numbers,
        reference experiments.py:210-226) or 'fallback' (random-projection
        embedding — relative tracking only; every recorded FID must carry
        this stamp so the two can never be confused)."""
        return "inception" if self.is_inception else "fallback"

    def features_of_images(self, images: np.ndarray) -> np.ndarray:
        outs = []
        for i in range(0, len(images), self.batch_size):
            outs.append(np.asarray(self.extractor(images[i:i + self.batch_size])))
        return np.concatenate(outs, axis=0)

    def stats_of_images(self, images: np.ndarray) -> FIDStats:
        return FIDStats(*compute_statistics(self.features_of_images(images)))

    def stats_of_dir(self, images_dir: str) -> FIDStats:
        from ..utils.image_io import load_image_dir
        images = load_image_dir(images_dir)
        return self.stats_of_images(images)

    def fid_of_dir(self, images_dir: str) -> float:
        assert self.target is not None, "no target statistics configured"
        st = self.stats_of_dir(images_dir)
        return frechet_distance(self.target.mu, self.target.sigma, st.mu, st.sigma)

    def fid_of_images(self, images: np.ndarray) -> float:
        assert self.target is not None, "no target statistics configured"
        st = self.stats_of_images(images)
        return frechet_distance(self.target.mu, self.target.sigma, st.mu, st.sigma)
