"""EDM augmentation pipeline in JAX (reference training/augment.py:115-330).

Produces (augmented images, augment_labels) where the label vector encodes
which transforms fired — fed to the network's map_augment conditioning.

Faithful pieces: pixel blitting (xflip / yflip / 90-degree rotations /
integer translation with reflect indexing), geometric affines composed from
isotropic+anisotropic scaling, fractional rotation and translation executed
through sym6-wavelet 2x up/downsampling with bilinear resampling, and the
color transforms (brightness / contrast / lumaflip / hue / saturation) as a
4x4 homogeneous matrix.

Documented deviation: the reference pads each batch by a DYNAMIC margin
computed from the sampled transforms (augment.py:236-247) — impossible under
jit's static shapes. We use the static worst-case margin instead; the
transform distribution is identical, only out-of-bounds boundary content can
differ for extreme transforms.

Images are NHWC in [-1, 1]; internally float32.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# sym6 wavelet lowpass filter (standard public coefficients)
SYM6 = np.asarray([
    0.015404109327027373, 0.0034907120842174702, -0.11799011114819057,
    -0.048311742585633, 0.4910559419267466, 0.787641141030194,
    0.3379294217276218, -0.07263752278646252, -0.021060292512300564,
    0.04472490177066578, 0.0017677118642428036, -0.007800708325034148,
], np.float32)


@dataclass(frozen=True)
class AugmentConfig:
    p: float = 1.0
    xflip: float = 0.0
    yflip: float = 0.0
    rotate_int: float = 0.0
    translate_int: float = 0.0
    translate_int_max: float = 0.125
    scale: float = 0.0
    rotate_frac: float = 0.0
    aniso: float = 0.0
    translate_frac: float = 0.0
    scale_std: float = 0.2
    rotate_frac_max: float = 1.0
    aniso_std: float = 0.2
    aniso_rotate_prob: float = 0.5
    translate_frac_std: float = 0.125
    brightness: float = 0.0
    contrast: float = 0.0
    lumaflip: float = 0.0
    hue: float = 0.0
    saturation: float = 0.0
    brightness_std: float = 0.2
    contrast_std: float = 0.5
    hue_max: float = 1.0
    saturation_std: float = 1.0

    @property
    def label_dim(self) -> int:
        n = 0
        n += 1 if self.xflip > 0 else 0
        n += 1 if self.yflip > 0 else 0
        n += 2 if self.rotate_int > 0 else 0
        n += 2 if self.translate_int > 0 else 0
        n += 1 if self.scale > 0 else 0
        n += 2 if self.rotate_frac > 0 else 0
        n += 2 if self.aniso > 0 else 0
        n += 2 if self.translate_frac > 0 else 0
        n += 1 if self.brightness > 0 else 0
        n += 1 if self.contrast > 0 else 0
        n += 1 if self.lumaflip > 0 else 0
        n += 2 if self.hue > 0 else 0
        n += 1 if self.saturation > 0 else 0
        return n


# EDM's published cifar-10 recipe (p=0.12)
EDM_CIFAR_AUGMENT = AugmentConfig(p=0.12, xflip=1e8, yflip=1, scale=1,
                                  rotate_frac=1, aniso=1, translate_frac=1)


def _rot2d(theta):
    c, s = jnp.cos(theta), jnp.sin(theta)
    z, o = jnp.zeros_like(theta), jnp.ones_like(theta)
    return jnp.stack([jnp.stack([c, -s, z], -1), jnp.stack([s, c, z], -1),
                      jnp.stack([z, z, o], -1)], -2)


def _scale2d(sx, sy):
    z, o = jnp.zeros_like(sx), jnp.ones_like(sx)
    return jnp.stack([jnp.stack([sx, z, z], -1), jnp.stack([z, sy, z], -1),
                      jnp.stack([z, z, o], -1)], -2)


def _translate2d(tx, ty):
    z, o = jnp.zeros_like(tx), jnp.ones_like(tx)
    return jnp.stack([jnp.stack([o, z, tx], -1), jnp.stack([z, o, ty], -1),
                      jnp.stack([z, z, o], -1)], -2)


def _wavelet_up2x(img):
    """Zero-stuff 2x then filter rows+cols with reversed sym6 (reference
    augment.py:255-260)."""
    n, h, w, c = img.shape
    k = jnp.asarray(SYM6[::-1].copy())
    pad = (len(SYM6) + 1) // 2
    x = jnp.zeros((n, h, w * 2, c), img.dtype).at[:, :, 0::2, :].set(img)[:, :, :-1, :]
    kw = k[None, :, None, None] * jnp.ones((1, 1, 1, c), img.dtype)
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), [(0, 0), (pad, pad)],
                                     dimension_numbers=("NHWC", "HWIO", "NHWC"),
                                     feature_group_count=c)
    n2, h2, w2, _ = x.shape
    y = jnp.zeros((n2, h2 * 2, w2, c), x.dtype).at[:, 0::2, :, :].set(x)[:, :-1, :, :]
    kh = k[:, None, None, None] * jnp.ones((1, 1, 1, c), img.dtype)
    y = jax.lax.conv_general_dilated(y, kh, (1, 1), [(pad, pad), (0, 0)],
                                     dimension_numbers=("NHWC", "HWIO", "NHWC"),
                                     feature_group_count=c)
    return y


def _wavelet_down2x(img, out_h, out_w):
    """Filter + stride-2 decimate back to the original canvas. Alignment:
    zero-stuffed upsampling places original pixel i at up-index 2i; stride-2
    decimation picks exactly those positions, so up->down is a near-identity
    (filter passband) round trip."""
    c = img.shape[-1]
    k = jnp.asarray(SYM6)
    pad = (len(SYM6) - 1) // 2
    kw = k[None, :, None, None] * jnp.ones((1, 1, 1, c), img.dtype)
    x = jax.lax.conv_general_dilated(img, kw, (1, 2), [(0, 0), (pad, pad)],
                                     dimension_numbers=("NHWC", "HWIO", "NHWC"),
                                     feature_group_count=c)
    kh = k[:, None, None, None] * jnp.ones((1, 1, 1, c), img.dtype)
    y = jax.lax.conv_general_dilated(x, kh, (2, 1), [(pad, pad), (0, 0)],
                                     dimension_numbers=("NHWC", "HWIO", "NHWC"),
                                     feature_group_count=c)
    return y[:, :out_h, :out_w, :]


def _affine_sample(img, G_inv, ph, pw):
    """Per-sample inverse-affine bilinear sampling of the 2x canvas.

    G_inv acts on align_corners=False normalized coordinates of the ORIGINAL
    (ph, pw) canvas; up-index u corresponds to original index u/2 (zero-stuff
    alignment), so identity transforms are exact."""
    n, h2, w2, c = img.shape

    def one(im, g):
        ty = jnp.arange(h2, dtype=jnp.float32) / 2.0    # original-index coords
        tx = jnp.arange(w2, dtype=jnp.float32) / 2.0
        yn = (ty + 0.5) / ph * 2 - 1
        xn = (tx + 0.5) / pw * 2 - 1
        gy, gx = jnp.meshgrid(yn, xn, indexing="ij")
        src = jnp.stack([gx, gy, jnp.ones_like(gx)], axis=-1) @ g[:2, :].T
        sx_up = ((src[..., 0] + 1) * 0.5 * pw - 0.5) * 2.0
        sy_up = ((src[..., 1] + 1) * 0.5 * ph - 0.5) * 2.0
        coords = jnp.stack([sy_up, sx_up], axis=0)
        out = jax.vmap(
            lambda ch: jax.scipy.ndimage.map_coordinates(ch, coords, order=1,
                                                         mode="constant", cval=0.0),
            in_axes=-1, out_axes=-1)(im)
        return out

    return jax.vmap(one)(img, G_inv)


def augment_pipe(images: jnp.ndarray, key: jax.Array, cfg: AugmentConfig
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """images NHWC [-1,1] -> (augmented, labels (N, label_dim))."""
    n, h, w, c = images.shape
    labels = []
    keys = iter(jax.random.split(key, 40))

    def gate(k, prob, val, zero):
        fire = jax.random.uniform(k, val.shape[:1] + (1,) * (val.ndim - 1)) \
            < prob * cfg.p
        return jnp.where(fire, val, zero)

    x = images.astype(jnp.float32)

    if cfg.xflip > 0:
        wv = jax.random.randint(next(keys), (n, 1, 1, 1), 0, 2)
        wv = gate(next(keys), cfg.xflip, wv, jnp.zeros_like(wv))
        x = jnp.where(wv == 1, x[:, :, ::-1, :], x)
        labels.append(wv.reshape(n, 1).astype(jnp.float32))
    if cfg.yflip > 0:
        wv = jax.random.randint(next(keys), (n, 1, 1, 1), 0, 2)
        wv = gate(next(keys), cfg.yflip, wv, jnp.zeros_like(wv))
        x = jnp.where(wv == 1, x[:, ::-1, :, :], x)
        labels.append(wv.reshape(n, 1).astype(jnp.float32))
    if cfg.rotate_int > 0:
        wv = jax.random.randint(next(keys), (n, 1, 1, 1), 0, 4)
        wv = gate(next(keys), cfg.rotate_int, wv, jnp.zeros_like(wv))
        x = jnp.where((wv == 1) | (wv == 2), x[:, :, ::-1, :], x)
        x = jnp.where((wv == 2) | (wv == 3), x[:, ::-1, :, :], x)
        assert h == w, "integer rotation needs square images"
        x = jnp.where((wv == 1) | (wv == 3), jnp.swapaxes(x, 1, 2), x)
        labels += [((wv == 1) | (wv == 2)).reshape(n, 1).astype(jnp.float32),
                   ((wv == 2) | (wv == 3)).reshape(n, 1).astype(jnp.float32)]
    if cfg.translate_int > 0:
        wv = jax.random.uniform(next(keys), (2, n, 1, 1, 1)) * 2 - 1
        fire = jax.random.uniform(next(keys), (1, n, 1, 1, 1)) \
            < cfg.translate_int * cfg.p
        wv = jnp.where(fire, wv, 0.0)
        tx = jnp.round(wv[0] * (w * cfg.translate_int_max)).astype(jnp.int32)
        ty = jnp.round(wv[1] * (h * cfg.translate_int_max)).astype(jnp.int32)
        yy = jnp.arange(h).reshape(1, h, 1, 1)
        xx = jnp.arange(w).reshape(1, 1, w, 1)
        xi = w - 1 - jnp.abs(w - 1 - (xx - tx) % (w * 2 - 2))
        yi = h - 1 - jnp.abs(h - 1 - (yy + ty) % (h * 2 - 2))
        bi = jnp.arange(n).reshape(n, 1, 1, 1)
        x = x[bi, jnp.broadcast_to(yi, (n, h, w, 1)),
              jnp.broadcast_to(xi, (n, h, w, 1)), jnp.arange(c).reshape(1, 1, 1, c)]
        labels += [(tx / (w * cfg.translate_int_max)).reshape(n, 1),
                   (ty / (h * cfg.translate_int_max)).reshape(n, 1)]

    # geometric transforms
    G_inv = jnp.tile(jnp.eye(3)[None], (n, 1, 1))
    any_geom = cfg.p > 0 and any(v > 0 for v in (cfg.scale, cfg.rotate_frac,
                                                 cfg.aniso, cfg.translate_frac))
    if cfg.scale > 0:
        wv = gate(next(keys), cfg.scale, jax.random.normal(next(keys), (n,)),
                  jnp.zeros((n,)))
        s = jnp.exp2(wv * cfg.scale_std)
        G_inv = G_inv @ _scale2d(1 / s, 1 / s)
        labels.append(wv.reshape(n, 1))
    if cfg.rotate_frac > 0:
        wv = (jax.random.uniform(next(keys), (n,)) * 2 - 1) * \
            (math.pi * cfg.rotate_frac_max)
        wv = gate(next(keys), cfg.rotate_frac, wv, jnp.zeros((n,)))
        G_inv = G_inv @ _rot2d(wv)   # rotate2d_inv(-w) == rotate2d(w)
        labels += [(jnp.cos(wv) - 1).reshape(n, 1), jnp.sin(wv).reshape(n, 1)]
    if cfg.aniso > 0:
        wv = gate(next(keys), cfg.aniso, jax.random.normal(next(keys), (n,)),
                  jnp.zeros((n,)))
        r = (jax.random.uniform(next(keys), (n,)) * 2 - 1) * math.pi
        r = jnp.where(jax.random.uniform(next(keys), (n,)) < cfg.aniso_rotate_prob,
                      r, 0.0)
        s = jnp.exp2(wv * cfg.aniso_std)
        G_inv = G_inv @ _rot2d(-r) @ _scale2d(1 / s, s) @ _rot2d(r)
        labels += [(wv * jnp.cos(r)).reshape(n, 1), (wv * jnp.sin(r)).reshape(n, 1)]
    if cfg.translate_frac > 0:
        wv = jax.random.normal(next(keys), (2, n))
        fire = jax.random.uniform(next(keys), (1, n)) < cfg.translate_frac * cfg.p
        wv = jnp.where(fire, wv, 0.0)
        G_inv = G_inv @ _translate2d(-wv[0] * (w * cfg.translate_frac_std),
                                     -wv[1] * (h * cfg.translate_frac_std))
        labels += [wv[0].reshape(n, 1), wv[1].reshape(n, 1)]

    if any_geom:
        # static worst-case reflect pad (see module docstring)
        hz_pad = len(SYM6) // 4
        m = min(max(h // 2 + hz_pad * 2, hz_pad * 2), h - 1)
        xp = jnp.pad(x, ((0, 0), (m, m), (m, m), (0, 0)), mode="reflect")
        up = _wavelet_up2x(xp)
        # G_inv is pixel-space (translations in pixels, rotations about the
        # center); conjugate into normalized coordinates of the padded canvas
        ph, pw = xp.shape[1], xp.shape[2]
        S = _scale2d(jnp.full((n,), pw / 2.0), jnp.full((n,), ph / 2.0))
        S_inv = _scale2d(jnp.full((n,), 2.0 / pw), jnp.full((n,), 2.0 / ph))
        G_norm = S_inv @ G_inv @ S
        sampled = _affine_sample(up, G_norm, ph, pw)
        x = _wavelet_down2x(sampled, ph, pw)[:, m:m + h, m:m + w, :]

    # color transforms
    M = jnp.tile(jnp.eye(4)[None], (n, 1, 1))
    any_color = any(v > 0 for v in (cfg.brightness, cfg.contrast, cfg.lumaflip,
                                    cfg.hue, cfg.saturation))
    luma = jnp.asarray([1, 1, 1, 0], jnp.float32) / math.sqrt(3)
    if cfg.brightness > 0:
        wv = gate(next(keys), cfg.brightness, jax.random.normal(next(keys), (n,)),
                  jnp.zeros((n,)))
        b = wv * cfg.brightness_std
        T = jnp.tile(jnp.eye(4)[None], (n, 1, 1)).at[:, 0, 3].set(b) \
            .at[:, 1, 3].set(b).at[:, 2, 3].set(b)
        M = T @ M
        labels.append(wv.reshape(n, 1))
    if cfg.contrast > 0:
        wv = gate(next(keys), cfg.contrast, jax.random.normal(next(keys), (n,)),
                  jnp.zeros((n,)))
        cs = jnp.exp2(wv * cfg.contrast_std)
        T = jnp.eye(4)[None] * jnp.ones((n, 1, 1))
        T = T.at[:, 0, 0].set(cs).at[:, 1, 1].set(cs).at[:, 2, 2].set(cs)
        M = T @ M
        labels.append(wv.reshape(n, 1))
    if cfg.lumaflip > 0:
        wv = jax.random.randint(next(keys), (n, 1, 1), 0, 2).astype(jnp.float32)
        fire = jax.random.uniform(next(keys), (n, 1, 1)) < cfg.lumaflip * cfg.p
        wv = jnp.where(fire, wv, 0.0)
        M = (jnp.eye(4)[None] - 2 * jnp.outer(luma, luma)[None] * wv) @ M
        labels.append(wv.reshape(n, 1))
    if cfg.hue > 0:
        wv = (jax.random.uniform(next(keys), (n,)) * 2 - 1) * (math.pi * cfg.hue_max)
        wv = gate(next(keys), cfg.hue, wv, jnp.zeros((n,)))
        v = luma[:3] / jnp.linalg.norm(luma[:3])
        K = jnp.asarray([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
        R3 = (jnp.eye(3)[None] + jnp.sin(wv)[:, None, None] * K[None]
              + (1 - jnp.cos(wv))[:, None, None] * (K @ K)[None])
        T = jnp.tile(jnp.eye(4)[None], (n, 1, 1)).at[:, :3, :3].set(R3)
        M = T @ M
        labels += [(jnp.cos(wv) - 1).reshape(n, 1), jnp.sin(wv).reshape(n, 1)]
    if cfg.saturation > 0:
        wv = jax.random.normal(next(keys), (n, 1, 1))
        fire = jax.random.uniform(next(keys), (n, 1, 1)) < cfg.saturation * cfg.p
        wv = jnp.where(fire, wv, 0.0)
        ll = jnp.outer(luma, luma)[None]
        M = (ll + (jnp.eye(4)[None] - ll) * jnp.exp2(wv * cfg.saturation_std)) @ M
        labels.append(wv.reshape(n, 1))

    if any_color:
        flat = x.reshape(n, h * w, c)
        if c == 3:
            flat = flat @ M[:, :3, :3].transpose(0, 2, 1) + M[:, :3, 3][:, None, :]
        elif c == 1:
            Mm = M[:, :3, :].mean(axis=1, keepdims=True)
            flat = flat * Mm[:, :, :3].sum(axis=2)[:, :, None] + Mm[:, :, 3][:, None]
        x = flat.reshape(n, h, w, c)

    label_vec = (jnp.concatenate(labels, axis=1) if labels
                 else jnp.zeros((n, 0), jnp.float32))
    return x.astype(images.dtype), label_vec
