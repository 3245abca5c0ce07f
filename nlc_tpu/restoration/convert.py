"""Torch -> flax weight conversion for the restoration archs.

Covers the reference's NAFNet/PANet checkpoints (basicsr/models/archs/
NAFNet_arch.py, PANet_arch.py). Layout notes:
  * torch convs are OIHW -> HWIO kernels;
  * torch PixelShuffle packs upsample channels (C, r, r)-major while our
    depth_to_space packs (r, r, C) -- the 1x1 up-conv kernels are permuted
    to compensate, so outputs match bit-for-bit;
  * LayerNorm2d stores (c,)-shaped weight/bias -> scale/bias;
  * beta/gamma are (1, c, 1, 1) -> (1, 1, 1, c);
  * PANet adds per-block affine Linears, the PromptLearner ctx/prefix/suffix
    and the frozen CLIP text tower (convert_clip_text).
"""
from __future__ import annotations

import numpy as np

from .clip_text import convert_clip_text


def _conv(sd, p):
    out = {"kernel": np.transpose(sd[f"{p}.weight"], (2, 3, 1, 0))}
    if f"{p}.bias" in sd:
        out["bias"] = sd[f"{p}.bias"]
    return out


def _lin(sd, p):
    out = {"kernel": np.ascontiguousarray(sd[f"{p}.weight"].T)}
    if f"{p}.bias" in sd:
        out["bias"] = sd[f"{p}.bias"]
    return out


def _ln2d(sd, p):
    return {"scale": sd[f"{p}.weight"].reshape(-1),
            "bias": sd[f"{p}.bias"].reshape(-1)}


def _up(sd, p):
    """PixelShuffle-packing permutation for the 1x1 up conv (see module doc)."""
    w = sd[f"{p}.weight"]                      # (C*4, Cin, 1, 1)
    cout, cin = w.shape[0] // 4, w.shape[1]
    w = w.reshape(cout, 2, 2, cin, 1, 1).transpose(1, 2, 0, 3, 4, 5)
    w = w.reshape(cout * 4, cin, 1, 1)
    return {"kernel": np.transpose(w, (2, 3, 1, 0))}


def _nafblock(sd, p, with_affine=False):
    out = {
        "norm1": _ln2d(sd, f"{p}.norm1"), "conv1": _conv(sd, f"{p}.conv1"),
        "conv2": _conv(sd, f"{p}.conv2"), "conv3": _conv(sd, f"{p}.conv3"),
        "norm2": _ln2d(sd, f"{p}.norm2"), "conv4": _conv(sd, f"{p}.conv4"),
        "conv5": _conv(sd, f"{p}.conv5"),
        "beta": np.transpose(sd[f"{p}.beta"], (0, 2, 3, 1)),
        "gamma": np.transpose(sd[f"{p}.gamma"], (0, 2, 3, 1)),
    }
    if f"{p}.sca.1.weight" in sd:
        out["sca_conv"] = _conv(sd, f"{p}.sca.1")
    if with_affine:
        out["affine"] = _lin(sd, f"{p}.affine")
    return out


def convert_nafnet(sd: dict, enc_blk_nums, dec_blk_nums, middle_blk_num,
                   with_affine: bool = False) -> dict:
    """NAFNet-family torch state dict -> flax params (NAFNet_arch.py:71-118)."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params = {"intro": _conv(sd, "intro"), "ending": _conv(sd, "ending")}
    for i, num in enumerate(enc_blk_nums):
        for j in range(num):
            params[f"enc_{i}_{j}"] = _nafblock(sd, f"encoders.{i}.{j}",
                                               with_affine)
        params[f"down_{i}"] = _conv(sd, f"downs.{i}")
    for j in range(middle_blk_num):
        params[f"middle_{j}"] = _nafblock(sd, f"middle_blks.{j}", with_affine)
    for i, num in enumerate(dec_blk_nums):
        params[f"up_{i}"] = _up(sd, f"ups.{i}.0")
        for j in range(num):
            params[f"dec_{i}_{j}"] = _nafblock(sd, f"decoders.{i}.{j}",
                                               with_affine)
    return params


def convert_panet(sd: dict, enc_blk_nums, dec_blk_nums, middle_blk_num,
                  clip_layers: int = 12) -> dict:
    """PANet torch state dict -> flax params: the NAFNet trunk with per-block
    affines, the PromptLearner, and the frozen CLIP text tower
    (PANet_arch.py:195-305)."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params = convert_nafnet(sd, enc_blk_nums, dec_blk_nums, middle_blk_num,
                            with_affine=True)
    params["ctx"] = sd["prompt_learner.ctx"]
    params["token_prefix"] = sd["prompt_learner.token_prefix"]
    params["token_suffix"] = sd["prompt_learner.token_suffix"]
    params["text_encoder"] = convert_clip_text(sd, "text_encoder.",
                                               layers=clip_layers)
    return params
