"""Flow IO/(de)quantization and the face-restoration helper
(reference basicsr/utils/flow_util.py and face_util.py)."""
import os

import numpy as np
import pytest

from nlc_tpu.restoration.flow import (flowread, flowwrite, quantize,
                                      dequantize, quantize_flow,
                                      dequantize_flow)
from nlc_tpu.restoration.face import (FaceRestorationHelper, umeyama,
                                      warp_affine, erode, gaussian_blur)


def test_flo_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    flow = rng.randn(12, 10, 2).astype(np.float32)
    path = str(tmp_path / "a.flo")
    flowwrite(flow, path)
    np.testing.assert_array_equal(flowread(path), flow)


def test_flo_bad_header(tmp_path):
    path = str(tmp_path / "bad.flo")
    with open(path, "wb") as f:
        f.write(b"XXXX" + b"\0" * 16)
    with pytest.raises(IOError):
        flowread(path)


def test_quantize_dequantize_identities():
    # 0 maps to 0 through the round trip (the 255-levels design point)
    z = np.zeros((4, 4))
    dq = dequantize(quantize(z, -1.0, 1.0, 255, np.uint8), -1.0, 1.0, 255)
    np.testing.assert_allclose(dq, 0.0, atol=1e-12)
    # reconstruction error bounded by half a bucket
    rng = np.random.RandomState(1)
    x = rng.uniform(-1, 1, (32, 32))
    dq = dequantize(quantize(x, -1.0, 1.0, 255, np.uint8), -1.0, 1.0, 255)
    assert np.abs(dq - x).max() <= (2.0 / 255) / 2 + 1e-12
    with pytest.raises(ValueError):
        quantize(x, 1.0, -1.0, 255)
    with pytest.raises(ValueError):
        dequantize(x, -1.0, 1.0, 1)


def test_quantized_flow_roundtrip_and_png(tmp_path):
    rng = np.random.RandomState(2)
    h, w = 16, 20
    flow = (rng.uniform(-0.015, 0.015, (h, w, 2))
            * np.array([w, h])).astype(np.float32)
    dx, dy = quantize_flow(flow, max_val=0.02, norm=True)
    assert dx.dtype == np.uint8
    rec = dequantize_flow(dx, dy, max_val=0.02, denorm=True)
    # half-bucket error, scaled back up by w/h
    assert np.abs(rec[..., 0] - flow[..., 0]).max() <= 0.02 / 255 * w + 1e-6
    # PNG pair IO (axis-0 concatenation, REDS layout)
    path = str(tmp_path / "f.png")
    flowwrite(flow, path, quantize_pair=True)
    rec2 = flowread(path, quantize_pair=True)
    np.testing.assert_allclose(rec2, rec, atol=1e-5)


def test_video_dataset_flow_loading(tmp_path):
    from PIL import Image
    from nlc_tpu.restoration.data import VideoClipDataset
    rng = np.random.RandomState(3)
    for root in ("gt", "lq", "flow"):
        os.makedirs(tmp_path / root / "000")
    written = {}
    for i in range(3):
        for root in ("gt", "lq"):
            Image.fromarray((rng.rand(8, 8, 3) * 255).astype(np.uint8)) \
                .save(tmp_path / root / "000" / f"{i:08d}.png")
        # REDS convention: flows quantized in [-20, 20] px, no /width norm
        written[i] = rng.uniform(-15, 15, (8, 8, 2)).astype(np.float32)
        for tag in ("_p1", "_n1"):
            flowwrite(written[i],
                      str(tmp_path / "flow" / "000" / f"{i:08d}{tag}.png"),
                      quantize_pair=True, max_val=20, norm=False)
    ds = VideoClipDataset(str(tmp_path / "gt"), str(tmp_path / "lq"),
                          num_frame=3, dataroot_flow=str(tmp_path / "flow"))
    lq, gt, flows = ds[1]
    assert lq.shape == (8, 8, 9) and gt.shape == (8, 8, 3)
    assert len(flows) == 2 and flows[0].shape == (8, 8, 2)
    # dequantization uses the REDS parameters: values come back within half
    # a bucket (40/255/2) of what was written for the CENTER frame (index 1)
    assert np.abs(flows[0] - written[1]).max() <= 40 / 255 / 2 + 1e-6
    # without a flow root the item stays a 2-tuple (backward compatible)
    ds2 = VideoClipDataset(str(tmp_path / "gt"), str(tmp_path / "lq"),
                           num_frame=3)
    assert len(ds2[1]) == 2


def test_umeyama_recovers_similarity():
    rng = np.random.RandomState(0)
    src = rng.rand(5, 2) * 100
    th, s, t = 0.4, 2.3, np.array([10.0, -7.0])
    rot = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    dst = s * (src @ rot.T) + t
    m = umeyama(src, dst)
    np.testing.assert_allclose(m[:, :2], s * rot, atol=1e-9)
    np.testing.assert_allclose(m[:, 2], t, atol=1e-7)
    # applying the matrix maps src onto dst
    mapped = src @ m[:, :2].T + m[:, 2]
    np.testing.assert_allclose(mapped, dst, atol=1e-7)


def test_warp_affine_inverse_consistency():
    rng = np.random.RandomState(1)
    img = (rng.rand(32, 32, 3) * 255).astype(np.float32)
    ident = np.array([[1.0, 0, 0], [0, 1.0, 0]])
    np.testing.assert_allclose(warp_affine(img, ident, (32, 32)), img,
                               atol=1e-3)
    # pure translation by (3, 5): pixel (y, x) moves to (y+5, x+3)
    m = np.array([[1.0, 0, 3.0], [0, 1.0, 5.0]])
    out = warp_affine(img, m, (32, 32))
    np.testing.assert_allclose(out[5:, 3:], img[:-5, :-3], atol=1e-3)


def test_erode_and_blur_shapes():
    mask = np.ones((16, 16, 3), np.float32)
    mask[:4] = 0.0
    er = erode(mask, 4)
    assert er.shape == mask.shape
    # window rows r-2..r+1 touch the zero band (rows 0-3) for r <= 5
    assert er[:6].max() == 0.0 and er[6:].min() == 1.0
    bl = gaussian_blur(mask, 5)
    assert bl.shape == mask.shape
    assert 0.0 < bl[4].mean() < 1.0          # edge softened
    np.testing.assert_allclose(bl[12:], 1.0, atol=1e-5)  # interior untouched


def test_face_helper_end_to_end(tmp_path):
    """Crop -> 'restore' (identity) -> paste reproduces the aligned face
    region; landmarks supplied manually (no dlib in this environment)."""
    rng = np.random.RandomState(4)
    img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    helper = FaceRestorationHelper(upscale_factor=2, face_size=32)
    helper.set_input_image(img)
    # a plausible face: template landmarks shrunk into the input frame
    lm = helper.face_template * 0.8 + np.array([8.0, 6.0])
    assert helper.set_face_landmarks_5([lm]) == 1
    helper.warp_crop_faces(save_cropped_path=str(tmp_path / "crop.png"),
                           save_inverse_affine_path=str(tmp_path / "inv.pth"))
    assert len(helper.cropped_faces) == 1
    assert helper.cropped_faces[0].shape == (32, 32, 3)
    assert os.path.exists(tmp_path / "crop_00.png")
    assert os.path.exists(tmp_path / "inv_00.npy")
    # affine and inverse compose to ~identity in upscaled coords
    a = np.vstack([helper.affine_matrices[0], [0, 0, 1]])
    ia = np.vstack([helper.inverse_affine_matrices[0], [0, 0, 1]])
    comp = ia @ a
    np.testing.assert_allclose(comp[:2, :2],
                               2 * np.eye(2), atol=1e-6)  # upscale_factor

    helper.add_restored_face(helper.cropped_faces[0].astype(np.float32))
    out = helper.paste_faces_to_input_image(str(tmp_path / "out.jpg"))
    assert out.shape == (128, 128, 3) and out.dtype == np.uint8
    assert os.path.exists(tmp_path / "out.png")   # save_png remaps .jpg
    # pasting an identity restoration stays close to the plain upscale
    # inside the blended face region
    from nlc_tpu.restoration.face import _resize_bilinear
    up = _resize_bilinear(img, 128, 128)
    center = (slice(40, 80), slice(40, 80))
    assert np.abs(out[center].astype(np.float32)
                  - up[center]).mean() < 30.0
