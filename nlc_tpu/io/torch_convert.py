"""Torch-checkpoint -> Flax-param converters (host-side, numpy only).

The reference ships three checkpoint formats (SURVEY.md §5):
  1. plain state_dict            (image_sample.py:757-758)
  2. DataParallel list + EMA     (run_image_experiment.py:199-206)
  3. EDM persistence pickles     (edm_image_sample.py:152-156)

`load_torch_state_dict` handles 1-2 (3 is in edm_pickle.py). The convert_*
functions are pure numpy dict -> dict transforms:

  torch conv   (O, I, kh, kw) -> flax NHWC kernel (kh, kw, I, O)
  torch linear (O, I)         -> flax Dense kernel (I, O)
  torch norm   weight/bias    -> scale/bias
  sigma-head first Linear     row-permuted from torch's (C,H,W) flatten order
                              to our NHWC (H,W,C) flatten order
"""
from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a torch checkpoint into {name: numpy array} on host.

    Accepts a raw state_dict, a {'state_dict': ...} wrapper, or the
    DataParallel-list format [state_dict, ema_state, ...] used by
    run_image_experiment resume (reference run_image_experiment.py:199-206).
    'module.' prefixes are stripped.
    """
    import torch  # host-only dependency

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, (list, tuple)):
        obj = obj[0]
    if isinstance(obj, dict) and "state_dict" in obj and not any(
            hasattr(v, "numpy") for v in obj.values()):
        obj = obj["state_dict"]
    out = {}
    for k, v in obj.items():
        if hasattr(v, "detach"):
            k = k[len("module."):] if k.startswith("module.") else k
            out[k] = v.detach().cpu().numpy()
    return out


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _dense_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def _norm(sd: Dict[str, np.ndarray], prefix: str) -> dict:
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _conv(sd: Dict[str, np.ndarray], prefix: str) -> dict:
    return {"kernel": _conv_kernel(sd[f"{prefix}.weight"]), "bias": sd[f"{prefix}.bias"]}


def _dense(sd: Dict[str, np.ndarray], prefix: str) -> dict:
    return {"kernel": _dense_kernel(sd[f"{prefix}.weight"]), "bias": sd[f"{prefix}.bias"]}


def _resblock(sd: Dict[str, np.ndarray], p: str, with_temb: bool = True) -> dict:
    out = {
        "norm1": _norm(sd, f"{p}.norm1"),
        "conv1": _conv(sd, f"{p}.conv1"),
        "norm2": _norm(sd, f"{p}.norm2"),
        "conv2": _conv(sd, f"{p}.conv2"),
    }
    if with_temb and f"{p}.temb_proj.weight" in sd:
        out["temb_proj"] = _dense(sd, f"{p}.temb_proj")
    if f"{p}.nin_shortcut.weight" in sd:
        out["nin_shortcut"] = _conv(sd, f"{p}.nin_shortcut")
    if f"{p}.conv_shortcut.weight" in sd:
        out["conv_shortcut"] = _conv(sd, f"{p}.conv_shortcut")
    return out


def _attnblock(sd: Dict[str, np.ndarray], p: str) -> dict:
    return {
        "norm": _norm(sd, f"{p}.norm"),
        "q": _conv(sd, f"{p}.q"),
        "k": _conv(sd, f"{p}.k"),
        "v": _conv(sd, f"{p}.v"),
        "proj_out": _conv(sd, f"{p}.proj_out"),
    }


def convert_ddim_unet(sd: Dict[str, np.ndarray], config) -> dict:
    """unet_simple.Model state_dict -> DDIMUNet params tree."""
    params = {
        "temb_dense_0": _dense(sd, "temb.dense.0"),
        "temb_dense_1": _dense(sd, "temb.dense.1"),
        "conv_in": _conv(sd, "conv_in"),
        "mid_block_1": _resblock(sd, "mid.block_1"),
        "mid_attn_1": _attnblock(sd, "mid.attn_1"),
        "mid_block_2": _resblock(sd, "mid.block_2"),
        "norm_out": _norm(sd, "norm_out"),
        "conv_out": _conv(sd, "conv_out"),
    }
    num_res = len(config.ch_mult)
    for i in range(num_res):
        for j in range(config.num_res_blocks):
            params[f"down_{i}_block_{j}"] = _resblock(sd, f"down.{i}.block.{j}")
            if f"down.{i}.attn.{j}.norm.weight" in sd:
                params[f"down_{i}_attn_{j}"] = _attnblock(sd, f"down.{i}.attn.{j}")
        if f"down.{i}.downsample.conv.weight" in sd:
            params[f"down_{i}_downsample"] = {"conv": _conv(sd, f"down.{i}.downsample.conv")}
        for j in range(config.num_res_blocks + 1):
            params[f"up_{i}_block_{j}"] = _resblock(sd, f"up.{i}.block.{j}")
            if f"up.{i}.attn.{j}.norm.weight" in sd:
                params[f"up_{i}_attn_{j}"] = _attnblock(sd, f"up.{i}.attn.{j}")
        if f"up.{i}.upsample.conv.weight" in sd:
            params[f"up_{i}_upsample"] = {"conv": _conv(sd, f"up.{i}.upsample.conv")}
    return params


def _flatten_permuted_dense(w: np.ndarray, c: int, h: int, wdim: int) -> np.ndarray:
    """First sigma-head Linear: torch flattens (C,H,W); we flatten (H,W,C)."""
    out_dim = w.shape[0]
    w = w.reshape(out_dim, c, h, wdim)
    w = np.transpose(w, (0, 2, 3, 1)).reshape(out_dim, h * wdim * c)
    return np.transpose(w, (1, 0))


def convert_sigma_head(sd: Dict[str, np.ndarray], config) -> Tuple[dict, dict]:
    """unet_simple.SigmaModel state_dict -> (params, batch_stats).

    The torch module is a flat ModuleList whose indices shift with the
    odd-dim paddings (src/unet_simple.py:484-499); we walk the keys by layer
    class instead of recomputing indices.
    """
    # group keys by down_layer index
    idxs = sorted({int(m.group(1)) for k in sd
                   for m in [re.match(r"down_layer\.(\d+)\.", k)] if m})
    params: dict = {}
    res_i, down_i = 0, 0
    for idx in idxs:
        p = f"down_layer.{idx}"
        if f"{p}.norm1.weight" in sd:           # PureResnetBlock
            params[f"res_{res_i}"] = _resblock(sd, p, with_temb=False)
            res_i += 1
        elif f"{p}.q.weight" in sd:             # AttnBlock
            params["attn_0"] = _attnblock(sd, p)
        elif f"{p}.conv.weight" in sd:          # Downsample
            params[f"down_{down_i}"] = {"conv": _conv(sd, f"{p}.conv")}
            down_i += 1

    # fc stack: fc_layer.1 Linear, fc_layer.2 BatchNorm1d
    inp_dim = config.dim
    for _ in range(config.n_blocks):
        if inp_dim % 2 != 0:
            inp_dim += 1
        inp_dim //= 2
    # spatial size after the last downsample; flatten dims (inp_dim, inp_dim, C)
    params["fc"] = {
        "kernel": _flatten_permuted_dense(sd["fc_layer.1.weight"], config.channels,
                                          inp_dim, inp_dim),
        "bias": sd["fc_layer.1.bias"],
    }
    params["bn"] = {"scale": sd["fc_layer.2.weight"], "bias": sd["fc_layer.2.bias"]}
    params["final"] = _dense(sd, "final_mlp")
    batch_stats = {"bn": {"mean": sd["fc_layer.2.running_mean"],
                          "var": sd["fc_layer.2.running_var"]}}
    return params, batch_stats
