"""Face-restoration helper: align faces to the FFHQ template, restore, paste
back (reference basicsr/utils/face_util.py).

TPU-native / dependency-free redesign: the reference chains dlib (detect +
landmarks), skimage (similarity transform) and cv2 (warps, erosion, blur).
Here the geometry is closed-form numpy (Umeyama similarity estimate — the
algorithm behind skimage's SimilarityTransform.estimate) and the image ops
are jitted jax (bilinear affine warp via map_coordinates, min-filter erosion
via reduce_window, separable Gaussian blur), so the whole crop->restore->
paste pipeline runs on device. Landmark *detection* still needs dlib
(environment-gated exactly like the reference, face_util.py:16-19); without
it, supply landmarks via set_face_landmarks_5 — e.g. from any keypoint model
or precomputed files.
"""
from __future__ import annotations

import os
from functools import partial
from typing import List, Optional, Sequence

import jax
import numpy as np

# standard 5-point FFHQ alignment template at 1024x1024
# (right eye, right eye inner, left eye, left eye inner, mouth center);
# same landmark convention as the reference (face_util.py:30-35)
FFHQ_TEMPLATE_1024 = np.array([
    [686.77227723, 488.62376238],
    [586.77227723, 493.59405941],
    [337.91089109, 488.38613861],
    [437.95049505, 493.51485149],
    [513.58415842, 678.50495050],
])


def umeyama(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Least-squares similarity transform (scale+rotation+translation) mapping
    src -> dst landmark sets; returns the 2x3 affine matrix. Closed form from
    Umeyama (TPAMI 1991), the estimator inside the reference's
    skimage SimilarityTransform (face_util.py:168-171)."""
    src = np.asarray(src, np.float64)
    dst = np.asarray(dst, np.float64)
    n, d = src.shape
    mu_src, mu_dst = src.mean(0), dst.mean(0)
    src_c, dst_c = src - mu_src, dst - mu_dst
    cov = dst_c.T @ src_c / n
    u, s, vt = np.linalg.svd(cov)
    sign = np.ones(d)
    if np.linalg.det(u) * np.linalg.det(vt) < 0:
        sign[-1] = -1
    rot = u @ np.diag(sign) @ vt
    var_src = (src_c ** 2).sum() / n
    scale = (s * sign).sum() / var_src
    t = mu_dst - scale * rot @ mu_src
    return np.concatenate([scale * rot, t[:, None]], axis=1)


def _invert_affine(m: np.ndarray) -> np.ndarray:
    full = np.vstack([m, [0.0, 0.0, 1.0]])
    return np.linalg.inv(full)[:2]


@partial(jax.jit, static_argnames=("out_h", "out_w"))
def _warp_affine_jax(img, inv, out_h: int, out_w: int):
    """dst(x, y) = src(inv @ [x, y, 1]) with bilinear sampling, zero outside
    (matches cv2.warpAffine semantics, which inverts the forward matrix)."""
    import jax.numpy as jnp
    from jax.scipy.ndimage import map_coordinates

    ys, xs = jnp.meshgrid(jnp.arange(out_h, dtype=jnp.float32),
                          jnp.arange(out_w, dtype=jnp.float32), indexing="ij")
    src_x = inv[0, 0] * xs + inv[0, 1] * ys + inv[0, 2]
    src_y = inv[1, 0] * xs + inv[1, 1] * ys + inv[1, 2]
    def one(c):
        return map_coordinates(c, [src_y, src_x], order=1, cval=0.0)
    return jnp.stack([one(img[..., i]) for i in range(img.shape[-1])], -1)


def warp_affine(img: np.ndarray, m: np.ndarray, out_size) -> np.ndarray:
    """Apply a forward 2x3 affine (src->dst) to an HWC image."""
    out_w, out_h = out_size
    inv = _invert_affine(np.asarray(m, np.float64)).astype(np.float32)
    return np.asarray(_warp_affine_jax(
        np.asarray(img, np.float32), inv, int(out_h), int(out_w)))


@partial(jax.jit, static_argnames=("k",))
def _erode_jax(mask, k: int):
    """Min-filter over a k x k window (cv2.erode with a ones kernel)."""
    import jax.lax as lax
    pad = [(k // 2, k - 1 - k // 2)] * 2 + [(0, 0)]
    return lax.reduce_window(mask, 1.0, lax.min, (k, k, 1), (1, 1, 1), pad)


def erode(mask: np.ndarray, k: int) -> np.ndarray:
    if k <= 1:
        return mask
    return np.asarray(_erode_jax(np.asarray(mask, np.float32), int(k)))


@partial(jax.jit, static_argnames=("k",))
def _gaussian_blur_jax(img, k: int):
    import jax.numpy as jnp
    # cv2's sigma-from-ksize rule when sigma=0 (getGaussianKernel docs)
    sigma = 0.3 * ((k - 1) * 0.5 - 1) + 0.8
    x = jnp.arange(k, dtype=jnp.float32) - (k - 1) / 2.0
    w = jnp.exp(-0.5 * (x / sigma) ** 2)
    w = w / w.sum()
    pad = [(k // 2, k - 1 - k // 2)]

    def conv1d(a, axis):
        a = jnp.moveaxis(a, axis, -1)
        # reflect-101 border, cv2's GaussianBlur default
        a = jnp.pad(a, [(0, 0)] * (a.ndim - 1) + pad, mode="reflect")
        out = jnp.apply_along_axis(
            lambda v: jnp.convolve(v, w, mode="valid"), -1, a)
        return jnp.moveaxis(out, -1, axis)

    return conv1d(conv1d(img, 0), 1)


def gaussian_blur(img: np.ndarray, k: int) -> np.ndarray:
    if k <= 1:
        return img
    return np.asarray(_gaussian_blur_jax(np.asarray(img, np.float32), int(k)))


def _resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    return np.asarray(jax.image.resize(np.asarray(img, np.float32),
                                       (out_h, out_w, img.shape[-1]),
                                       method="bilinear"))


class FaceRestorationHelper:
    """Crop faces aligned to the FFHQ template, collect restored faces, and
    blend them back into the (upscaled) input with a soft mask — the same
    pipeline and constants as the reference (face_util.py:22-215), RGB
    throughout. Inverse affines are saved as .npy (the reference used torch
    .pth)."""

    def __init__(self, upscale_factor: int, face_size: int = 512):
        self.upscale_factor = upscale_factor
        self.face_size = (face_size, face_size)
        self.face_template = FFHQ_TEMPLATE_1024 / (1024 // face_size)
        self.save_png = True
        self.input_img: Optional[np.ndarray] = None
        self._dlib = None
        self.clean_all()

    def clean_all(self):
        self.all_landmarks_5: List[np.ndarray] = []
        self.affine_matrices: List[np.ndarray] = []
        self.inverse_affine_matrices: List[np.ndarray] = []
        self.cropped_faces: List[np.ndarray] = []
        self.restored_faces: List[np.ndarray] = []

    # ---- input ----
    def read_input_image(self, img_path: str):
        from PIL import Image
        self.input_img = np.asarray(Image.open(img_path).convert("RGB"))

    def set_input_image(self, img: np.ndarray):
        self.input_img = np.asarray(img)

    # ---- landmarks: manual injection (dependency-free) or dlib ----
    def set_face_landmarks_5(self, landmarks: Sequence[np.ndarray]):
        """Supply (5, 2) xy landmark arrays, one per face, in input-image
        coordinates — the no-dlib path."""
        self.all_landmarks_5 = [np.asarray(lm, np.float64) for lm in landmarks]
        return len(self.all_landmarks_5)

    def init_dlib(self, detection_path: str, landmark5_path: str):
        try:
            import dlib
        except ImportError as e:  # same gating as the reference (:16-19)
            raise ImportError(
                "dlib is required for face *detection*; install it or supply "
                "landmarks via set_face_landmarks_5") from e
        self._dlib = (dlib.cnn_face_detection_model_v1(detection_path),
                      dlib.shape_predictor(landmark5_path))

    def detect_faces(self, img_path: str, upsample_num_times: int = 1):
        assert self._dlib is not None, "call init_dlib first"
        self.read_input_image(img_path)
        detector, predictor = self._dlib
        dets = detector(self.input_img, upsample_num_times)
        for face in dets:
            shape = predictor(self.input_img, face.rect)
            self.all_landmarks_5.append(
                np.array([[p.x, p.y] for p in shape.parts()], np.float64))
        return len(dets)

    # ---- core pipeline ----
    def warp_crop_faces(self, save_cropped_path: Optional[str] = None,
                        save_inverse_affine_path: Optional[str] = None):
        """Affine matrices (landmarks -> template), cropped aligned faces,
        and inverse affines (template -> upscaled input coords)."""
        for idx, landmark in enumerate(self.all_landmarks_5):
            affine = umeyama(landmark, self.face_template)
            self.affine_matrices.append(affine)
            cropped = warp_affine(self.input_img, affine, self.face_size)
            self.cropped_faces.append(cropped.astype(self.input_img.dtype))
            if save_cropped_path is not None:
                from PIL import Image
                path, ext = os.path.splitext(save_cropped_path)
                ext = ".png" if self.save_png else ext
                Image.fromarray(np.clip(cropped, 0, 255).astype(np.uint8)) \
                    .save(f"{path}_{idx:02d}{ext}")
            inverse = umeyama(self.face_template,
                              landmark * self.upscale_factor)
            self.inverse_affine_matrices.append(inverse)
            if save_inverse_affine_path is not None:
                path, _ = os.path.splitext(save_inverse_affine_path)
                np.save(f"{path}_{idx:02d}.npy", inverse)

    def add_restored_face(self, face: np.ndarray):
        self.restored_faces.append(np.asarray(face))

    def paste_faces_to_input_image(self, save_path: Optional[str] = None
                                   ) -> np.ndarray:
        """Soft-mask blend of each restored face into the bilinearly-upscaled
        input; border erosion + area-scaled fusion edge as in the reference
        (face_util.py:179-215)."""
        assert self.input_img is not None
        h, w = self.input_img.shape[:2]
        h_up, w_up = h * self.upscale_factor, w * self.upscale_factor
        out = _resize_bilinear(self.input_img, h_up, w_up)
        assert len(self.restored_faces) == len(self.inverse_affine_matrices), \
            "length of restored_faces and affine_matrices are different"
        for face, inverse in zip(self.restored_faces,
                                 self.inverse_affine_matrices):
            inv_face = warp_affine(face, inverse, (w_up, h_up))
            mask = np.ones((*self.face_size, 3), np.float32)
            inv_mask = warp_affine(mask, inverse, (w_up, h_up))
            inv_mask = erode(inv_mask, 2 * self.upscale_factor)
            inv_face = inv_mask * inv_face
            total_face_area = int(inv_mask.sum()) // 3
            w_edge = int(total_face_area ** 0.5) // 20
            center = erode(inv_mask, 2 * w_edge)
            soft_mask = gaussian_blur(center, 2 * w_edge + 1)
            out = soft_mask * inv_face + (1 - soft_mask) * out
        out = np.clip(out, 0, 255).astype(np.uint8)
        if save_path is not None:
            from PIL import Image
            if self.save_png:
                save_path = save_path.replace(".jpg", ".png") \
                                     .replace(".jpeg", ".png")
            os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
            Image.fromarray(out).save(save_path)
        return out
