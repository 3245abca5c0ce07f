"""Constraint construction + projection wiring for restoration sampling.

Capability parity:
  simple_constraint (pixel-space A/Ap pairs)   reference src/constraint_functions.py:150-202
  svd_constraint / svd_constraint_ddrm          :206-388 (one suite serves both)
  Constraint_Function wrapper + projections     reference image_sample.py:282-405

All operators run in the reference's channel-first flattened convention;
flatten_chw/unflatten_chw convert NHWC images at the boundary so the engine's
constrain_fn closures stay NHWC end-to-end.
"""
from __future__ import annotations

import math
import os
from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .svd import (SVDOperator, Denoising, Inpainting, Colorization, SuperResolution,
                  WalshHadamardCS, BlockCS, SRConv, Deblurring, Deblurring2D,
                  bicubic_kernel_1d)


def flatten_chw(x: jnp.ndarray) -> jnp.ndarray:
    """NHWC image -> (B, C*H*W) channel-first flattened vector."""
    return x.transpose(0, 3, 1, 2).reshape(x.shape[0], -1)


def unflatten_chw(v: jnp.ndarray, h: int, w: int, c: int) -> jnp.ndarray:
    return v.reshape(v.shape[0], c, h, w).transpose(0, 2, 3, 1)


# ---------------------------------------------------------------------------
# pixel-space ("simple") constraints — reference constraint_functions.py:131-202
# ---------------------------------------------------------------------------

def mean_upsample(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """NHWC nearest-replication upsample (reference MeanUpsample :131-135)."""
    b, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, h, scale, w, scale, c))
    return x.reshape(b, h * scale, w * scale, c)


def color2gray(x: jnp.ndarray) -> jnp.ndarray:
    g = x.mean(axis=-1, keepdims=True)
    return jnp.broadcast_to(g, x.shape)


def gray2color(x: jnp.ndarray) -> jnp.ndarray:
    coef = 1.0 / 3.0
    base = 3 * coef ** 2
    g = x[..., :1]
    return jnp.broadcast_to(g * coef / base, g.shape[:-1] + (3,))


def simple_constraint(fn: str, fn_scale: float = 4, image_size: int = 256,
                      mask: Optional[np.ndarray] = None, seed: int = 0):
    """(A, Ap) NHWC closures for the 'simple' projection mode."""
    if fn.startswith("inpainting"):
        if mask is None and fn == "inpainting_random":
            # same seeded missing set as the SVD Inpainting operator builds
            rng = np.random.RandomState(seed)
            missing = rng.permutation(image_size ** 2)[: image_size ** 2 // 2]
            m = np.ones(image_size * image_size, np.float32)
            m[missing] = 0.0
            mask = m.reshape(image_size, image_size)
        fn = "inpainting"
    if fn == "colorization":
        return color2gray, gray2color
    if fn == "denoising":
        ident = lambda z: z
        return ident, ident
    if fn == "sr_averagepooling":
        scale = round(fn_scale)

        def A(z):
            b, h, w, c = z.shape
            zz = z.reshape(b, h // scale, scale, w // scale, scale, c)
            return zz.mean(axis=(2, 4))

        return A, lambda z: mean_upsample(z, scale)
    if fn in ("inpainting", "mask_color_sr", "diy"):
        assert mask is not None, f"{fn} needs a mask array"
        m = jnp.asarray(mask, jnp.float32)
        if m.ndim == 2:
            m = m[None, :, :, None]
        elif m.ndim == 3:
            m = m[None, ..., None] if m.shape[-1] not in (1, 3) else m[None]
        if fn == "inpainting":
            return (lambda z: z * m), (lambda z: z * m)
        scale = round(fn_scale)

        def A(z):
            z = color2gray(z * m)
            b, h, w, c = z.shape
            zz = z.reshape(b, h // scale, scale, w // scale, scale, c)
            return zz.mean(axis=(2, 4))

        def Ap(z):
            return gray2color(mean_upsample(z, scale)) * m

        return A, Ap
    raise NotImplementedError(fn)


# ---------------------------------------------------------------------------
# SVD constraint factory — reference constraint_functions.py:206-294
# ---------------------------------------------------------------------------

def svd_constraint(fn: str, fn_scale: float = 4.0, image_size: int = 256,
                   channels: int = 3, mask: Optional[np.ndarray] = None,
                   missing_indices: Optional[np.ndarray] = None,
                   seed: int = 0) -> SVDOperator:
    """Build the degradation operator for a named constraint.

    Assets (inpainting masks) are passed directly instead of the reference's
    hardcoded store/inp_masks paths; the CLI layer resolves files.
    """
    rng = np.random.RandomState(seed)
    if fn == "cs_walshhadamard":
        perm = rng.permutation(image_size ** 2)
        return WalshHadamardCS(channels, image_size, round(fn_scale), perm)
    if fn == "cs_blockbased":
        return BlockCS(channels, image_size, fn_scale, rng)
    if fn.startswith("inpainting"):
        if missing_indices is None:
            if fn == "inpainting_random":
                missing_r = rng.permutation(image_size ** 2)[: image_size ** 2 // 2] * 3
            elif mask is not None:
                flat = np.asarray(mask).reshape(-1)
                missing_r = np.nonzero(flat == 0)[0] * 3
            else:
                raise ValueError(f"{fn} needs a mask or missing_indices")
            missing_indices = np.concatenate([missing_r, missing_r + 1, missing_r + 2])
        return Inpainting(channels, image_size, missing_indices)
    if fn == "denoising":
        return Denoising(channels, image_size)
    if fn == "colorization":
        return Colorization(image_size)
    if fn == "sr_averagepooling":
        return SuperResolution(channels, image_size, int(fn_scale))
    if fn == "sr_bicubic":
        factor = int(fn_scale)
        k = bicubic_kernel_1d(factor)
        return SRConv(k / k.sum(), channels, image_size, stride=factor)
    if fn == "deblur_uni":
        return Deblurring(np.full(9, 1 / 9.0), channels, image_size)
    if fn == "deblur_gauss":
        x = np.arange(-2, 3, dtype=np.float64)
        k = np.exp(-0.5 * (x / 10.0) ** 2)
        return Deblurring(k / k.sum(), channels, image_size)
    if fn == "deblur_aniso":
        x = np.arange(-4, 5, dtype=np.float64)
        k2 = np.exp(-0.5 * (x / 20.0) ** 2)
        k1 = np.exp(-0.5 * (x / 1.0) ** 2)
        return Deblurring2D(k1 / k1.sum(), k2 / k2.sum(), channels, image_size)
    raise NotImplementedError(fn)


# svd_replacement (DDRM) exposes the same operators under H-names; the factory
# is shared (reference svd_constraint_ddrm :300-388 mirrors :206-294).
svd_constraint_ddrm = svd_constraint


# ---------------------------------------------------------------------------
# Constraint wrapper + projections — reference image_sample.py:282-405
# ---------------------------------------------------------------------------

@dataclass
class ConstraintFunction:
    """Bundles the degradation (A, Ap), its projection rule and losses.

    transform(x): NHWC image -> flat measurement y
    inv_transform(y): y -> NHWC A^+ y image (with the reference's special
    cases: deblur returns y itself, colorization replicates the gray channel,
    inpainting re-adds the mask complement; image_sample.py:312-323)
    make_constrain_fn(y, lam): NHWC x0 -> projected x0 for the sampler.
    """
    deg: str
    proj: str                       # 'simple' | 'svd' | 'simple_gd' | 'svd_gd' | 'none'
    channels: int = 3
    image_size: int = 256
    lr: float = 1.0
    n_gd_iter: int = 10
    gd_loss_ord: int = 1
    op: Optional[SVDOperator] = None
    A_simple: Optional[Callable] = None
    Ap_simple: Optional[Callable] = None

    # ---- measurement ----
    def transform(self, x: jnp.ndarray) -> jnp.ndarray:
        if "simple" in self.proj:
            return self.A_simple(x)
        return self.op.A(flatten_chw(x))

    def inv_transform(self, y: jnp.ndarray) -> jnp.ndarray:
        if "simple" in self.proj:
            return self.Ap_simple(y)
        d = self.image_size
        apy = unflatten_chw(self.op.A_pinv(y), d, d, self.channels)
        if self.deg.startswith("deblur"):
            apy = unflatten_chw(y, d, d, self.channels)
        elif self.deg == "colorization":
            g = y.reshape(y.shape[0], d, d, 1)
            apy = jnp.broadcast_to(g, (y.shape[0], d, d, 3))
        elif self.deg == "inpainting":
            ones = jnp.ones_like(flatten_chw(apy))
            apy = apy + unflatten_chw(self.op.A_pinv(self.op.A(ones)), d, d,
                                      self.channels) - 1.0
        return apy

    # ---- losses ----
    def loss(self, x: jnp.ndarray, y: jnp.ndarray):
        """(forward, backward) L1 losses per sample (image_sample.py:325-333)."""
        y_hat = self.transform(x)
        x_hat = self.inv_transform(y)
        fwd = jnp.abs(y_hat - y).reshape(y.shape[0], -1).sum(axis=1)
        bwd = jnp.abs(x_hat - x).reshape(x.shape[0], -1).sum(axis=1)
        return fwd, bwd

    def const_loss(self, y_hat, y, ord: int = 1):
        d = (y_hat - y).reshape(y.shape[0], -1)
        if ord == 1:
            return jnp.abs(d).sum(axis=1)
        return jnp.sqrt((d ** 2).sum(axis=1))

    # ---- projections ----
    def make_constrain_fn(self, y: jnp.ndarray, lam: Optional[float] = None
                          ) -> Callable[[jnp.ndarray], jnp.ndarray]:
        lam = self.lr if lam is None else lam
        if self.proj == "none":
            return lambda x0: x0
        if self.proj == "simple":
            def proj(x0):
                return x0 - lam * self.Ap_simple(self.A_simple(x0) - y)
            return proj
        if self.proj == "svd":
            d = self.image_size

            def proj(x0):
                resid = self.op.A(flatten_chw(x0)) - y.reshape(y.shape[0], -1)
                return x0 - unflatten_chw(self.op.A_pinv(resid), d, d, self.channels)
            return proj
        if "gd" in self.proj:
            def gd_loss(x0):
                y_hat = self.transform(x0)
                return self.const_loss(y_hat, y, ord=self.gd_loss_ord).sum()

            def proj(x0):
                def body(_, x):
                    g = jax.grad(gd_loss)(x)
                    return x - lam * g
                return jax.lax.fori_loop(0, self.n_gd_iter, body, x0)
            return proj
        raise NotImplementedError(self.proj)


def get_constraint_function(constraint: str, constraint_proj: str,
                            image_size: int = 256, channels: int = 3,
                            fn_scale: float = 4.0, lr: float = 1.0,
                            n_gd_iter: int = 10, gd_loss: str = "l1",
                            mask: Optional[np.ndarray] = None,
                            missing_indices: Optional[np.ndarray] = None,
                            seed: int = 0) -> ConstraintFunction:
    """Factory mirroring image_sample.get_constraint_function (:359-405).

    constraint_proj 'ddrm' behaves as 'svd' (the DDRM H-operators are the same
    math; reference :360-362 likewise rewrites ddrm -> svd)."""
    proj = "svd" if constraint_proj == "ddrm" else constraint_proj
    cf = ConstraintFunction(deg=constraint, proj=proj, channels=channels,
                            image_size=image_size, lr=lr, n_gd_iter=n_gd_iter,
                            gd_loss_ord=1 if "l1" in gd_loss else 2)
    if proj == "none":
        cf.A_simple = lambda x: x
        cf.Ap_simple = lambda x: x
        return cf
    if "simple" in proj:
        A, Ap = simple_constraint(constraint, fn_scale, image_size, mask=mask,
                                  seed=seed)
        cf.A_simple, cf.Ap_simple = A, Ap
    if "svd" in proj or proj == "svd_gd" or "gd" in proj and "svd" in constraint_proj:
        cf.op = svd_constraint(constraint, fn_scale, image_size, channels,
                               mask=mask, missing_indices=missing_indices, seed=seed)
    if proj == "svd" and cf.op is None:
        cf.op = svd_constraint(constraint, fn_scale, image_size, channels,
                               mask=mask, missing_indices=missing_indices, seed=seed)
    return cf
