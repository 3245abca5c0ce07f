"""SVD-factored degradation operators A = U diag(s) V^T for constrained
generation (inpainting, deblurring, super-resolution, colorization,
compressed sensing).

Capability parity with reference functions/svd_operators.py (DDNM+ A_functions,
:9-1165) and functions/svd_replacement.py (DDRM H_functions — same math under
H-names, so one suite serves both factories).

TPU-first redesign: every operator precomputes its factor matrices and — in
place of the reference's in-place fancy-indexing scatters
(`temp[:, perm] = ...`) — flat GATHER index maps on host (numpy) at build
time. At runtime each method is a pure jnp function of (B, C*H*W) vectors
built from reshapes, gathers, and small batched matmuls (MXU-friendly), fully
jittable inside the sampling scan. Vectors use the reference's channel-first
(CHW) flattening so converted measurements y match bit-for-bit; NHWC images
convert at the boundary (see operators.constraints.flatten_chw).
"""
from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


class SVDOperator:
    """Base: A/At/A_pinv/A_pinv_eta/Lambda/Lambda_noise composed from the
    factor primitives V/Vt/U/Ut/singulars/add_zeros (reference :52-97)."""

    # factor primitives ------------------------------------------------------
    def V(self, vec):
        raise NotImplementedError

    def Vt(self, vec):
        raise NotImplementedError

    def U(self, vec):
        raise NotImplementedError

    def Ut(self, vec):
        raise NotImplementedError

    def singulars(self) -> jnp.ndarray:
        raise NotImplementedError

    def add_zeros(self, vec):
        raise NotImplementedError

    # composed ---------------------------------------------------------------
    def A(self, vec):
        temp = self.Vt(vec)
        s = self.singulars()
        return self.U(s * temp[:, : s.shape[0]])

    def At(self, vec):
        temp = self.Ut(vec)
        s = self.singulars()
        return self.V(self.add_zeros(s * temp[:, : s.shape[0]]))

    def A_pinv(self, vec):
        temp = self.Ut(vec)
        s = self.singulars()
        factors = jnp.where(s == 0, 0.0, 1.0 / jnp.where(s == 0, 1.0, s))
        temp = temp.at[:, : s.shape[0]].multiply(factors)
        return self.V(self.add_zeros(temp))

    def A_pinv_eta(self, vec, eta: float):
        temp = self.Ut(vec)
        s = self.singulars()
        factors = s / (s * s + eta)
        temp = temp.at[:, : s.shape[0]].multiply(factors)
        return self.V(self.add_zeros(temp))

    def Lambda(self, vec, a, sigma_y, sigma_t, eta):
        raise NotImplementedError

    def Lambda_noise(self, vec, a, sigma_y, sigma_t, eta, epsilon):
        raise NotImplementedError

    # DDRM aliases (functions/svd_replacement.py H-naming)
    def H(self, vec):
        return self.A(vec)

    def Ht(self, vec):
        return self.At(vec)

    def H_pinv(self, vec):
        return self.A_pinv(vec)


def _gate_active(a, sigma_y) -> bool:
    """The reference's `if a != 0 and sigma_y != 0` guard (:264). `a` may be a
    traced sqrt(alpha_bar) inside jit — then gate only on the static sigma_y
    (a == 0 never occurs for alpha_bar > 0, and the a != 0 branch math
    degrades gracefully anyway)."""
    if isinstance(a, (int, float)) and a == 0:
        return False
    return sigma_y != 0


def _lambda_weights(singulars_full: jnp.ndarray, a, sigma_y, sigma_t, eta):
    """The DDNM+ lambda_t gate shared by all operators (reference :253-320)."""
    s = singulars_full
    inv_s = jnp.where(s == 0, 0.0, 1.0 / jnp.where(s == 0, 1.0, s))
    lambda_t = jnp.ones_like(s)
    if _gate_active(a, sigma_y):
        change = (sigma_t < a * sigma_y * inv_s).astype(s.dtype)
        lambda_t = lambda_t * (1.0 - change) + change * (
            s * sigma_t * (1 - eta ** 2) ** 0.5 / a / sigma_y)
    return lambda_t


def _lambda_noise_weights(singulars_full: jnp.ndarray, a, sigma_y, sigma_t, eta):
    s = singulars_full
    inv_s = jnp.where(s == 0, 0.0, 1.0 / jnp.where(s == 0, 1.0, s))
    d1 = jnp.ones_like(s) * sigma_t * eta
    d2 = jnp.ones_like(s) * sigma_t * (1 - eta ** 2) ** 0.5
    if _gate_active(a, sigma_y):
        c = (sigma_t < a * sigma_y * inv_s).astype(s.dtype)
        d1 = d1 * (1 - c) + c * sigma_t * eta
        d2 = d2 * (1 - c)
        c = (sigma_t > a * sigma_y * inv_s).astype(s.dtype)
        d1 = d1 * (1 - c) + jnp.sqrt(
            jnp.clip(c * (sigma_t ** 2 - a ** 2 * sigma_y ** 2 * inv_s ** 2), min=0))
        d2 = d2 * (1 - c)
        c = (s == 0).astype(s.dtype)
        d1 = d1 * (1 - c) + c * sigma_t * eta
        d2 = d2 * (1 - c) + c * sigma_t * (1 - eta ** 2) ** 0.5
    return d1, d2


def _pad_singulars(s: jnp.ndarray, n: int) -> jnp.ndarray:
    return jnp.concatenate([s, jnp.zeros(n - s.shape[0], s.dtype)])


# ---------------------------------------------------------------------------
# Denoising (identity) — reference :442-476
# ---------------------------------------------------------------------------

class Denoising(SVDOperator):
    def __init__(self, channels: int, img_dim: int):
        self._s = jnp.ones(channels * img_dim ** 2, jnp.float32)

    def V(self, vec):
        return vec.reshape(vec.shape[0], -1)

    Vt = V
    U = V
    Ut = V
    add_zeros = V

    def singulars(self):
        return self._s

    def Lambda(self, vec, a, sigma_y, sigma_t, eta):
        factor = sigma_t * (1 - eta ** 2) ** 0.5 / a / sigma_y if a * sigma_y != 0 else 1.0
        return jnp.where(sigma_t < a * sigma_y, vec * factor, vec)

    def Lambda_noise(self, vec, a, sigma_y, sigma_t, eta, epsilon):
        big = vec * jnp.sqrt(jnp.clip(sigma_t ** 2 - a ** 2 * sigma_y ** 2, min=0))
        small = vec * sigma_t * eta
        return jnp.where(sigma_t >= a * sigma_y, big, small)


# ---------------------------------------------------------------------------
# Inpainting — reference :324-439
# ---------------------------------------------------------------------------

class Inpainting(SVDOperator):
    """Pixel-index inpainting. missing_indices are flat CHW-pixel indices
    (already channel-expanded, as produced by the factories)."""

    def __init__(self, channels: int, img_dim: int, missing_indices: np.ndarray):
        n = channels * img_dim ** 2
        self.channels = channels
        self.img_dim = img_dim
        missing = np.asarray(missing_indices, np.int64)
        kept = np.setdiff1d(np.arange(n, dtype=np.int64), missing, assume_unique=False)
        self._s = jnp.ones(n - missing.shape[0], jnp.float32)
        self._n = n
        forward = np.concatenate([kept, missing])       # Vt gather order
        self._gather = jnp.asarray(forward)
        self._scatter = jnp.asarray(np.argsort(forward))  # V gather order
        self._n_kept = kept.shape[0]

    def _to_pixelmajor(self, vec):
        b = vec.shape[0]
        return vec.reshape(b, self.channels, -1).transpose(0, 2, 1).reshape(b, -1)

    def _to_channelmajor(self, vec):
        b = vec.shape[0]
        return vec.reshape(b, -1, self.channels).transpose(0, 2, 1).reshape(b, -1)

    def V(self, vec):
        out = vec.reshape(vec.shape[0], -1)[:, self._scatter]
        return self._to_channelmajor(out)

    def Vt(self, vec):
        return self._to_pixelmajor(vec)[:, self._gather]

    def U(self, vec):
        return vec.reshape(vec.shape[0], -1)

    Ut = U

    def singulars(self):
        return self._s

    def add_zeros(self, vec):
        b = vec.shape[0]
        flat = vec.reshape(b, -1)
        return jnp.concatenate(
            [flat, jnp.zeros((b, self._n - flat.shape[1]), flat.dtype)], axis=1)

    def Lambda(self, vec, a, sigma_y, sigma_t, eta):
        out = self._to_pixelmajor(vec)[:, self._gather]
        lam = _lambda_weights(_pad_singulars(self._s, self._n), a, sigma_y, sigma_t, eta)
        out = out * lam[None, :]
        res = out[:, self._scatter]
        return self._to_channelmajor(res)

    def Lambda_noise(self, vec, a, sigma_y, sigma_t, eta, epsilon):
        ov = self._to_pixelmajor(vec)[:, self._gather]
        oe = self._to_pixelmajor(epsilon)[:, self._gather]
        d1, d2 = _lambda_noise_weights(_pad_singulars(self._s, self._n), a, sigma_y,
                                       sigma_t, eta)
        rv = self._to_channelmajor((ov * d1[None, :])[:, self._scatter])
        re = self._to_channelmajor((oe * d2[None, :])[:, self._scatter])
        return rv + re


# ---------------------------------------------------------------------------
# Colorization — reference :627-736
# ---------------------------------------------------------------------------

class Colorization(SVDOperator):
    def __init__(self, img_dim: int, coeffs: Sequence[float] = (0.3333, 0.3334, 0.3333)):
        self.channels = 3
        self.img_dim = img_dim
        A = np.asarray([list(coeffs)], np.float32)           # (1, 3)
        U, s, Vh = np.linalg.svd(A, full_matrices=True)
        self._U00 = float(U[0, 0])
        self._s_small = jnp.asarray(s, jnp.float32)          # (1,)
        self._V_small = jnp.asarray(Vh.T, jnp.float32)       # (3, 3)
        self._Vt_small = jnp.asarray(Vh, jnp.float32)

    def _needles(self, vec):
        b = vec.shape[0]
        return vec.reshape(b, self.channels, -1).transpose(0, 2, 1)   # (B, P, C)

    def V(self, vec):
        needles = self._needles(vec) @ self._V_small.T
        return needles.transpose(0, 2, 1).reshape(vec.shape[0], -1)

    def Vt(self, vec):
        needles = self._needles(vec) @ self._Vt_small.T
        return needles.transpose(0, 2, 1).reshape(vec.shape[0], -1)

    def U(self, vec):
        return self._U00 * vec.reshape(vec.shape[0], -1)

    Ut = U

    def singulars(self):
        return jnp.tile(self._s_small, self.img_dim ** 2)

    def add_zeros(self, vec):
        b = vec.shape[0]
        flat = vec.reshape(b, -1)
        out = jnp.zeros((b, self.channels * self.img_dim ** 2), flat.dtype)
        return out.at[:, : self.img_dim ** 2].set(flat)

    def Lambda(self, vec, a, sigma_y, sigma_t, eta):
        needles = self._needles(vec) @ self._Vt_small.T
        lam = _lambda_weights(_pad_singulars(self._s_small, self.channels),
                              a, sigma_y, sigma_t, eta)
        needles = needles * lam[None, None, :]
        needles = needles @ self._V_small.T
        return needles.transpose(0, 2, 1).reshape(vec.shape[0], -1)

    def Lambda_noise(self, vec, a, sigma_y, sigma_t, eta, epsilon):
        nv = self._needles(vec)
        ne = self._needles(epsilon)
        d1, d2 = _lambda_noise_weights(_pad_singulars(self._s_small, self.channels),
                                       a, sigma_y, sigma_t, eta)
        nv = (nv * d1[None, None, :]) @ self._V_small.T
        ne = (ne * d2[None, None, :]) @ self._V_small.T
        return (nv + ne).transpose(0, 2, 1).reshape(vec.shape[0], -1)


# ---------------------------------------------------------------------------
# SuperResolution (patch averaging) — reference :479-623
# ---------------------------------------------------------------------------

class SuperResolution(SVDOperator):
    def __init__(self, channels: int, img_dim: int, ratio: int):
        assert img_dim % ratio == 0
        self.channels = channels
        self.img_dim = img_dim
        self.ratio = ratio
        self.y_dim = img_dim // ratio
        A = np.full((1, ratio ** 2), 1.0 / ratio ** 2, np.float32)
        U, s, Vh = np.linalg.svd(A, full_matrices=True)
        self._U00 = float(U[0, 0])
        self._s_small = jnp.asarray(s, jnp.float32)
        self._V_small = jnp.asarray(Vh.T, jnp.float32)       # (r^2, r^2)
        self._Vt_small = jnp.asarray(Vh, jnp.float32)

        # gather maps for the singular-value ordering (reference's strided
        # reorder loops :494-496, :514-517) as flat indices into the
        # (C*y^2*r^2)-long patch-coefficient vector.
        C, P, R = channels, self.y_dim ** 2, ratio ** 2
        # Vt: recon[flat_out] = patches[c, p, k]
        out_idx = np.empty(C * P * R, np.int64)
        src = np.arange(C * P * R).reshape(C, P, R)
        out_idx[: C * P] = src[:, :, 0].reshape(-1)
        for k in range(R - 1):
            out_idx[C * P + k:: R - 1] = src[:, :, k + 1].reshape(-1)
        # recon[j] = patches_flat[out_idx[j]]  (Vt);  V inverts with argsort
        self._vt_gather = jnp.asarray(out_idx)
        self._v_gather = jnp.asarray(np.argsort(out_idx))

    def _unfold(self, vec):
        """(B, C*H*W) -> patch coefficients (B, C, y^2, r^2)."""
        b = vec.shape[0]
        x = vec.reshape(b, self.channels, self.y_dim, self.ratio, self.y_dim, self.ratio)
        x = x.transpose(0, 1, 2, 4, 3, 5)
        return x.reshape(b, self.channels, self.y_dim ** 2, self.ratio ** 2)

    def _fold(self, patches):
        b = patches.shape[0]
        x = patches.reshape(b, self.channels, self.y_dim, self.y_dim, self.ratio,
                            self.ratio)
        x = x.transpose(0, 1, 2, 4, 3, 5)
        return x.reshape(b, self.channels * self.img_dim ** 2)

    def V(self, vec):
        b = vec.shape[0]
        patches = vec.reshape(b, -1)[:, self._v_gather].reshape(
            b, self.channels, self.y_dim ** 2, self.ratio ** 2)
        patches = patches @ self._V_small.T
        return self._fold(patches)

    def Vt(self, vec):
        patches = self._unfold(vec) @ self._Vt_small.T
        b = vec.shape[0]
        return patches.reshape(b, -1)[:, self._vt_gather]

    def U(self, vec):
        return self._U00 * vec.reshape(vec.shape[0], -1)

    Ut = U

    def singulars(self):
        return jnp.tile(self._s_small, self.channels * self.y_dim ** 2)

    def add_zeros(self, vec):
        b = vec.shape[0]
        flat = vec.reshape(b, -1)
        out = jnp.zeros((b, flat.shape[1] * self.ratio ** 2), flat.dtype)
        return out.at[:, : flat.shape[1]].set(flat)

    def Lambda(self, vec, a, sigma_y, sigma_t, eta):
        patches = self._unfold(vec) @ self._Vt_small.T
        lam = _lambda_weights(_pad_singulars(self._s_small, self.ratio ** 2),
                              a, sigma_y, sigma_t, eta)
        patches = patches * lam[None, None, None, :]
        patches = patches @ self._V_small.T
        return self._fold(patches)

    def Lambda_noise(self, vec, a, sigma_y, sigma_t, eta, epsilon):
        pv = self._unfold(vec)
        pe = self._unfold(epsilon)
        d1, d2 = _lambda_noise_weights(_pad_singulars(self._s_small, self.ratio ** 2),
                                       a, sigma_y, sigma_t, eta)
        pv = (pv * d1[None, None, None, :]) @ self._V_small.T
        pe = (pe * d2[None, None, None, :]) @ self._V_small.T
        return self._fold(pv) + self._fold(pe)


# ---------------------------------------------------------------------------
# Walsh-Hadamard compressed sensing — reference :211-320
# ---------------------------------------------------------------------------

def fwht(a: jnp.ndarray, img_dim: int) -> jnp.ndarray:
    """Fast Walsh-Hadamard transform over the last axis (length img_dim^2),
    normalized by 1/img_dim — self-inverse (reference :212-222). Butterfly as a
    reshape/stack ladder; log2(n) fused elementwise passes on TPU."""
    b, c, n = a.shape
    h = 1
    while h < n:
        a = a.reshape(b, c, -1, 2, h)
        lo = a[:, :, :, 0, :] + a[:, :, :, 1, :]
        hi = a[:, :, :, 0, :] - a[:, :, :, 1, :]
        a = jnp.stack([lo, hi], axis=3)
        h *= 2
    return a.reshape(b, c, n) / img_dim


class WalshHadamardCS(SVDOperator):
    def __init__(self, channels: int, img_dim: int, ratio: int, perm: np.ndarray):
        self.channels = channels
        self.img_dim = img_dim
        self.ratio = ratio
        perm = np.asarray(perm, np.int64)
        self._perm = jnp.asarray(perm)
        self._inv_perm = jnp.asarray(np.argsort(perm))
        self._s = jnp.ones(channels * img_dim ** 2 // ratio, jnp.float32)
        self._n = channels * img_dim ** 2

    def _fwht(self, vec):
        return fwht(vec.reshape(vec.shape[0], self.channels, self.img_dim ** 2),
                    self.img_dim)

    def V(self, vec):
        b = vec.shape[0]
        # scatter temp[:, :, perm] = pixel-major(vec)  ==  gather by inv_perm
        pm = vec.reshape(b, -1, self.channels).transpose(0, 2, 1)
        temp = pm[:, :, self._inv_perm]
        return self._fwht(temp).reshape(b, -1)

    def Vt(self, vec):
        b = vec.shape[0]
        t = self._fwht(vec)[:, :, self._perm]
        return t.transpose(0, 2, 1).reshape(b, -1)

    def U(self, vec):
        return vec.reshape(vec.shape[0], -1)

    Ut = U

    def singulars(self):
        return self._s

    def add_zeros(self, vec):
        b = vec.shape[0]
        flat = vec.reshape(b, -1)
        out = jnp.zeros((b, self._n), flat.dtype)
        return out.at[:, : flat.shape[1]].set(flat)

    def Lambda(self, vec, a, sigma_y, sigma_t, eta):
        b = vec.shape[0]
        tv = self._fwht(vec)[:, :, self._perm].transpose(0, 2, 1).reshape(b, -1)
        lam = _lambda_weights(_pad_singulars(self._s, self._n), a, sigma_y, sigma_t, eta)
        tv = tv * lam[None, :]
        pm = tv.reshape(b, -1, self.channels).transpose(0, 2, 1)
        out = pm[:, :, self._inv_perm]
        return self._fwht(out).reshape(b, -1)

    def Lambda_noise(self, vec, a, sigma_y, sigma_t, eta, epsilon):
        b = vec.shape[0]

        def pixmaj(v):
            return v.reshape(b, self.channels, -1)[:, :, self._perm] \
                .transpose(0, 2, 1).reshape(b, -1)

        tv = pixmaj(vec)
        te = pixmaj(epsilon)
        d1, d2 = _lambda_noise_weights(_pad_singulars(self._s, self._n), a, sigma_y,
                                       sigma_t, eta)
        tv = tv * d1[None, :]
        te = te * d2[None, :]

        def back(v):
            pm = v.reshape(b, -1, self.channels).transpose(0, 2, 1)
            return self._fwht(pm[:, :, self._inv_perm]).reshape(b, -1)

        return back(tv) + back(te)


# ---------------------------------------------------------------------------
# Block-based compressed sensing — reference :101-159
# ---------------------------------------------------------------------------

class BlockCS(SVDOperator):
    """32x32-block CS via the SVD of a random dense 1024x1024 matrix."""

    def __init__(self, channels: int, img_dim: int, ratio: float,
                 rng: Optional[np.random.RandomState] = None):
        self.img_dim = img_dim
        self.channels = channels
        self.block = 32
        self.y_dim = img_dim // self.block
        rng = rng or np.random.RandomState(0)
        A = rng.randn(self.block ** 2, self.block ** 2).astype(np.float32)
        _, _, Vh = np.linalg.svd(A, full_matrices=True)
        self._V_small = jnp.asarray(Vh.T)
        self._Vt_small = jnp.asarray(Vh)
        self.cs_size = int(self.block * self.block * ratio)
        self._s = jnp.ones(self.cs_size * channels * self.y_dim ** 2, jnp.float32)

    def _unfold(self, vec):
        b = vec.shape[0]
        r = self.block
        x = vec.reshape(b, self.channels, self.y_dim, r, self.y_dim, r)
        x = x.transpose(0, 1, 2, 4, 3, 5)
        return x.reshape(b, self.channels, self.y_dim ** 2, r ** 2)

    def _fold(self, patches):
        b = patches.shape[0]
        r = self.block
        x = patches.reshape(b, self.channels, self.y_dim, self.y_dim, r, r)
        x = x.transpose(0, 1, 2, 4, 3, 5)
        return x.reshape(b, self.channels * self.img_dim ** 2)

    def V(self, vec):
        b = vec.shape[0]
        temp = vec.reshape(b, -1)
        npat = self.channels * self.y_dim ** 2
        head = temp[:, : npat * self.cs_size].reshape(b, npat, self.cs_size)
        tail = temp[:, npat * self.cs_size:].reshape(b, npat, -1)
        patches = jnp.concatenate([head, tail], axis=2)
        patches = patches @ self._V_small.T
        return self._fold(patches.reshape(b, self.channels, self.y_dim ** 2, -1))

    def Vt(self, vec):
        b = vec.shape[0]
        patches = self._unfold(vec) @ self._Vt_small.T
        npat = self.channels * self.y_dim ** 2
        flat = patches.reshape(b, npat, -1)
        head = flat[:, :, : self.cs_size].reshape(b, -1)
        tail = flat[:, :, self.cs_size:].reshape(b, -1)
        return jnp.concatenate([head, tail], axis=1)

    def U(self, vec):
        return vec.reshape(vec.shape[0], -1)

    Ut = U

    def singulars(self):
        return self._s

    def add_zeros(self, vec):
        b = vec.shape[0]
        flat = vec.reshape(b, -1)
        out = jnp.zeros((b, self.channels * self.img_dim ** 2), flat.dtype)
        return out.at[:, : flat.shape[1]].set(flat)


# ---------------------------------------------------------------------------
# Dense general-A — reference :173-208
# ---------------------------------------------------------------------------

class GeneralA(SVDOperator):
    def __init__(self, A: np.ndarray, zero: float = 1e-3):
        U, s, Vh = np.linalg.svd(np.asarray(A, np.float32), full_matrices=True)
        s = np.where(s < zero, 0.0, s)
        self._Umat = jnp.asarray(U)
        self._Vmat = jnp.asarray(Vh.T)
        self._s = jnp.asarray(s)
        self._m, self._n = A.shape

    def V(self, vec):
        return vec.reshape(vec.shape[0], -1) @ self._Vmat.T

    def Vt(self, vec):
        return vec.reshape(vec.shape[0], -1) @ self._Vmat

    def U(self, vec):
        return vec.reshape(vec.shape[0], -1) @ self._Umat.T

    def Ut(self, vec):
        return vec.reshape(vec.shape[0], -1) @ self._Umat

    def singulars(self):
        return self._s

    def add_zeros(self, vec):
        b = vec.shape[0]
        flat = vec.reshape(b, -1)
        out = jnp.zeros((b, self._n), flat.dtype)
        return out.at[:, : self._m].set(flat)


# ---------------------------------------------------------------------------
# Separable conv operators (deblurring, bicubic SR) — reference :851-1165
# ---------------------------------------------------------------------------

def _conv_matrix(kernel: np.ndarray, img_dim: int) -> np.ndarray:
    """1-D convolution matrix with zero boundary (reference Deblurring init)."""
    k = np.asarray(kernel, np.float64)
    A = np.zeros((img_dim, img_dim))
    half = k.shape[0] // 2
    for i in range(img_dim):
        for j in range(i - half, i + half):
            if 0 <= j < img_dim:
                A[i, j] = k[j - i + half]
    return A


def _sr_conv_matrix(kernel: np.ndarray, img_dim: int, stride: int) -> np.ndarray:
    """Strided 1-D conv matrix with reflective padding (reference SRConv init)."""
    k = np.asarray(kernel, np.float64)
    small = img_dim // stride
    A = np.zeros((small, img_dim))
    half = k.shape[0] // 2
    for i in range(stride // 2, img_dim + stride // 2, stride):
        for j in range(i - half, i + half):
            je = j
            if je < 0:
                je = -je - 1
            if je >= img_dim:
                je = (img_dim - 1) - (je - img_dim)
            A[i // stride, je] += k[j - i + half]
    return A


class _SeparableBase(SVDOperator):
    """Shared left/right matrix application for separable image operators."""
    channels: int
    img_dim: int

    def _img(self, vec, dim=None):
        dim = dim or self.img_dim
        b = vec.shape[0]
        return vec.reshape(b, self.channels, dim, dim)

    @staticmethod
    def _lr(img, Ml, Mr):
        """Ml @ img @ Mr over the trailing two axes."""
        return jnp.einsum("ij,bcjk,kl->bcil", Ml, img, Mr)


class Deblurring(_SeparableBase):
    def __init__(self, kernel: np.ndarray, channels: int, img_dim: int,
                 zero: float = 3e-2):
        self.channels = channels
        self.img_dim = img_dim
        # float32 SVD: matches the reference's torch.svd(float32) LAPACK call,
        # including the basis sign conventions that one-sided applications
        # (Lambda_noise) are sensitive to.
        A = _conv_matrix(kernel, img_dim).astype(np.float32)
        U, s, Vh = np.linalg.svd(A, full_matrices=True)
        s = s.astype(np.float32)
        s_orig = s.copy()
        s = np.where(s < zero, 0.0, s)
        big = np.outer(s, s).reshape(-1)
        big_orig = np.outer(s_orig, s_orig).reshape(-1)
        # The reference sorts with torch's UNSTABLE descending sort
        # (svd_operators.py:961) whose tie order — every (i,j)/(j,i) product
        # ties — is implementation-defined and not reproducible standalone.
        # We use a stable argsort: a deterministic, equally valid basis
        # assignment (the operator is self-consistent; golden tests normalize
        # the permutation before comparing).
        order = np.argsort(-big, kind="stable")
        self._perm = jnp.asarray(order)
        self._inv_perm = jnp.asarray(np.argsort(order))
        self._s_sorted = jnp.asarray(big[order].astype(np.float32))
        self._s_orig_sorted = jnp.asarray(big_orig[order].astype(np.float32))
        self._Usm = jnp.asarray(U.astype(np.float32))
        self._Vsm = jnp.asarray(Vh.T.astype(np.float32))

    def _scatter_perm(self, pix):
        """(B, d^2, C) written to positions perm -> gather by inv_perm."""
        return pix[:, self._inv_perm, :]

    def V(self, vec):
        b = vec.shape[0]
        temp = self._scatter_perm(vec.reshape(b, self.img_dim ** 2, self.channels))
        img = temp.transpose(0, 2, 1).reshape(b, self.channels, self.img_dim,
                                              self.img_dim)
        out = self._lr(img, self._Vsm, self._Vsm.T)
        return out.reshape(b, -1)

    def Vt(self, vec):
        b = vec.shape[0]
        t = self._lr(self._img(vec), self._Vsm.T, self._Vsm)
        t = t.reshape(b, self.channels, -1)[:, :, self._perm]
        return t.transpose(0, 2, 1).reshape(b, -1)

    def U(self, vec):
        b = vec.shape[0]
        temp = self._scatter_perm(vec.reshape(b, self.img_dim ** 2, self.channels))
        img = temp.transpose(0, 2, 1).reshape(b, self.channels, self.img_dim,
                                              self.img_dim)
        out = self._lr(img, self._Usm, self._Usm.T)
        return out.reshape(b, -1)

    def Ut(self, vec):
        b = vec.shape[0]
        t = self._lr(self._img(vec), self._Usm.T, self._Usm)
        t = t.reshape(b, self.channels, -1)[:, :, self._perm]
        return t.transpose(0, 2, 1).reshape(b, -1)

    def singulars(self):
        # reference tiles (not interleaves) the sorted singulars across the
        # 3-channel pixel-major layout (svd_operators.py:1001) — reproduced
        # verbatim because A/A_pinv are self-consistent under it.
        return jnp.tile(self._s_sorted, 3)

    def add_zeros(self, vec):
        return vec.reshape(vec.shape[0], -1)

    def Lambda(self, vec, a, sigma_y, sigma_t, eta):
        b = vec.shape[0]
        t = self._lr(self._img(vec), self._Vsm.T, self._Vsm)
        t = t.reshape(b, self.channels, -1)[:, :, self._perm].transpose(0, 2, 1)
        lam = _lambda_weights(self._s_orig_sorted, a, sigma_y, sigma_t, eta)
        t = t * lam[None, :, None]
        t = self._scatter_perm(t)
        img = t.transpose(0, 2, 1).reshape(b, self.channels, self.img_dim, self.img_dim)
        return self._lr(img, self._Vsm, self._Vsm.T).reshape(b, -1)

    def Lambda_noise(self, vec, a, sigma_y, sigma_t, eta, epsilon):
        b = vec.shape[0]

        def permuted(v):
            t = v.reshape(b, self.channels, -1)[:, :, self._perm]
            return t.transpose(0, 2, 1)

        tv = permuted(vec)
        te = permuted(epsilon)
        d1, d2 = _lambda_noise_weights(self._s_orig_sorted, a, sigma_y, sigma_t, eta)
        tv = tv * d1[None, :, None]
        te = te * d2[None, :, None]

        def back(t):
            t = self._scatter_perm(t)
            img = t.transpose(0, 2, 1).reshape(b, self.channels, self.img_dim,
                                               self.img_dim)
            return self._lr(img, self._Vsm, self._Vsm.T).reshape(b, -1)

        return back(tv) + back(te)


class Deblurring2D(_SeparableBase):
    """Anisotropic deblurring: separate 1-D kernels per axis (reference :1094-1165)."""

    def __init__(self, kernel1: np.ndarray, kernel2: np.ndarray, channels: int,
                 img_dim: int, zero: float = 3e-2):
        self.channels = channels
        self.img_dim = img_dim
        U1, s1, Vh1 = np.linalg.svd(_conv_matrix(kernel1, img_dim).astype(np.float32),
                                    full_matrices=True)
        U2, s2, Vh2 = np.linalg.svd(_conv_matrix(kernel2, img_dim).astype(np.float32),
                                    full_matrices=True)
        s1 = np.where(s1 < zero, 0.0, s1).astype(np.float32)
        s2 = np.where(s2 < zero, 0.0, s2).astype(np.float32)
        big = np.outer(s1, s2).reshape(-1)
        order = np.argsort(-big, kind="stable")  # stable tie-break (see Deblurring)
        self._perm = jnp.asarray(order)
        self._inv_perm = jnp.asarray(np.argsort(order))
        self._s_sorted = jnp.asarray(big[order].astype(np.float32))
        self._U1 = jnp.asarray(U1.astype(np.float32))
        self._V1 = jnp.asarray(Vh1.T.astype(np.float32))
        self._U2 = jnp.asarray(U2.astype(np.float32))
        self._V2 = jnp.asarray(Vh2.T.astype(np.float32))

    def _scatter_perm(self, pix):
        return pix[:, self._inv_perm, :]

    def V(self, vec):
        b = vec.shape[0]
        temp = self._scatter_perm(vec.reshape(b, self.img_dim ** 2, self.channels))
        img = temp.transpose(0, 2, 1).reshape(b, self.channels, self.img_dim,
                                              self.img_dim)
        return self._lr(img, self._V1, self._V2.T).reshape(b, -1)

    def Vt(self, vec):
        b = vec.shape[0]
        t = self._lr(self._img(vec), self._V1.T, self._V2)
        t = t.reshape(b, self.channels, -1)[:, :, self._perm]
        return t.transpose(0, 2, 1).reshape(b, -1)

    def U(self, vec):
        b = vec.shape[0]
        temp = self._scatter_perm(vec.reshape(b, self.img_dim ** 2, self.channels))
        img = temp.transpose(0, 2, 1).reshape(b, self.channels, self.img_dim,
                                              self.img_dim)
        return self._lr(img, self._U1, self._U2.T).reshape(b, -1)

    def Ut(self, vec):
        b = vec.shape[0]
        t = self._lr(self._img(vec), self._U1.T, self._U2)
        t = t.reshape(b, self.channels, -1)[:, :, self._perm]
        return t.transpose(0, 2, 1).reshape(b, -1)

    def singulars(self):
        return jnp.tile(self._s_sorted, 3)

    def add_zeros(self, vec):
        return vec.reshape(vec.shape[0], -1)


class SRConv(_SeparableBase):
    """Conv-based (e.g. bicubic) downsampling (reference :851-931)."""

    def __init__(self, kernel: np.ndarray, channels: int, img_dim: int, stride: int,
                 zero: float = 3e-2):
        self.channels = channels
        self.img_dim = img_dim
        self.ratio = stride
        self.small_dim = img_dim // stride
        A = _sr_conv_matrix(kernel, img_dim, stride)
        U, s, Vh = np.linalg.svd(A, full_matrices=True)
        s = np.where(s < zero, 0.0, s)
        self._Usm = jnp.asarray(U.astype(np.float32))        # (small, small)
        self._Vsm = jnp.asarray(Vh.T.astype(np.float32))     # (img, img)
        self._s_big = jnp.asarray(np.outer(s, s).reshape(-1).astype(np.float32))

        sd, d = self.small_dim, img_dim
        perm = np.asarray(
            [d * i + j for i in range(sd) for j in range(sd)]
            + [d * i + j for i in range(sd) for j in range(sd, d)], np.int64)
        self._perm = jnp.asarray(perm)
        # V: temp[:, perm, :] = vec[:, :len(perm), :]; then
        #    temp[:, len(perm):, :] = vec[:, len(perm):, :] (overwrites!)
        n = d * d
        src = np.full(n, -1, np.int64)
        src[perm] = np.arange(len(perm))
        src[len(perm):] = np.arange(len(perm), n)     # later write wins
        self._v_src = jnp.asarray(np.where(src < 0, 0, src))
        self._v_mask = jnp.asarray((src >= 0).astype(np.float32))
        # Vt: temp[:, :, :len(perm)] = temp[:, :, perm] (rest unchanged)
        g = np.arange(n, dtype=np.int64)
        g[: len(perm)] = perm
        self._vt_gather = jnp.asarray(g)

    def V(self, vec):
        b = vec.shape[0]
        v = vec.reshape(b, self.img_dim ** 2, self.channels)
        temp = v[:, self._v_src, :] * self._v_mask[None, :, None]
        img = temp.transpose(0, 2, 1).reshape(b, self.channels, self.img_dim,
                                              self.img_dim)
        return self._lr(img, self._Vsm, self._Vsm.T).reshape(b, -1)

    def Vt(self, vec):
        b = vec.shape[0]
        t = self._lr(self._img(vec), self._Vsm.T, self._Vsm)
        t = t.reshape(b, self.channels, -1)[:, :, self._vt_gather]
        return t.transpose(0, 2, 1).reshape(b, -1)

    def U(self, vec):
        b = vec.shape[0]
        temp = vec.reshape(b, self.small_dim ** 2, self.channels).transpose(0, 2, 1)
        img = temp.reshape(b, self.channels, self.small_dim, self.small_dim)
        return self._lr(img, self._Usm, self._Usm.T).reshape(b, -1)

    def Ut(self, vec):
        b = vec.shape[0]
        t = self._lr(self._img(vec, self.small_dim), self._Usm.T, self._Usm)
        return t.reshape(b, self.channels, -1).transpose(0, 2, 1).reshape(b, -1)

    def singulars(self):
        return jnp.repeat(self._s_big[: self.small_dim ** 2], 3)

    def add_zeros(self, vec):
        b = vec.shape[0]
        flat = vec.reshape(b, -1)
        out = jnp.zeros((b, flat.shape[1] * self.ratio ** 2), flat.dtype)
        return out.at[:, : flat.shape[1]].set(flat)


def bicubic_kernel_1d(factor: int, a: float = -0.5) -> np.ndarray:
    """The bicubic kernel used for sr_bicubic (reference
    src/constraint_functions.py:255-268)."""
    def kernel(x):
        x = abs(x)
        if x <= 1:
            return (a + 2) * x ** 3 - (a + 3) * x ** 2 + 1
        if x < 2:
            return a * x ** 3 - 5 * a * x ** 2 + 8 * a * x - 4 * a
        return 0.0

    k = np.zeros(factor * 4)
    for i in range(factor * 4):
        x = (1 / factor) * (i - np.floor(factor * 4 / 2) + 0.5)
        k[i] = kernel(x)
    return k / k.sum()
