"""EDM SongUNet torch state_dict -> flax SongUNet params.

Key map (reference src/edm_networks.py SongUNet / SigmaModel):
  map_noise.freqs              -> map_noise_freqs (fourier only)
  map_label / map_augment      -> Dense
  map_layer0 / map_layer1      -> Dense
  enc.{res}x{res}_*            -> enc_{res}x{res}_* modules
  dec.{res}x{res}_*            -> dec_{res}x{res}_* modules
  UNetBlock: norm0 conv0 affine norm1 conv1 [skip] [norm2 qkv proj]
  EDMConv weight (O,I,k,k)     -> kernel (k,k,I,O)

The per-head (ch,3) qkv interleaving is layout-preserved: our edm_attention
reshapes (B,T,heads,ch,3) which matches torch's
reshape(B*heads, ch, 3, T) channel order, so qkv kernels transpose directly.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from .torch_convert import _dense_kernel, _norm


def _edm_conv(sd, p):
    out = {"kernel": np.transpose(sd[f"{p}.weight"], (2, 3, 1, 0))}
    if f"{p}.bias" in sd:
        out["bias"] = sd[f"{p}.bias"]
    return out


def _dense(sd, p):
    out = {"kernel": _dense_kernel(sd[f"{p}.weight"])}
    if f"{p}.bias" in sd:
        out["bias"] = sd[f"{p}.bias"]
    return out


def _unet_block(sd, p):
    out = {
        "norm0": _norm(sd, f"{p}.norm0"),
        "conv0": _edm_conv(sd, f"{p}.conv0"),
        "norm1": _norm(sd, f"{p}.norm1"),
        "conv1": _edm_conv(sd, f"{p}.conv1"),
    }
    if f"{p}.affine.weight" in sd:
        out["affine"] = _dense(sd, f"{p}.affine")
    if f"{p}.skip.weight" in sd:
        out["skip"] = _edm_conv(sd, f"{p}.skip")
    if f"{p}.norm2.weight" in sd:
        out["norm2"] = _norm(sd, f"{p}.norm2")
        out["qkv"] = _edm_conv(sd, f"{p}.qkv")
        out["proj"] = _edm_conv(sd, f"{p}.proj")
    return out


def convert_song_unet(sd: Dict[str, np.ndarray], config) -> dict:
    params = {
        "map_layer0": _dense(sd, "map_layer0"),
        "map_layer1": _dense(sd, "map_layer1"),
    }
    if "map_noise.freqs" in sd:
        params["map_noise_freqs"] = sd["map_noise.freqs"]
    if "map_label.weight" in sd:
        params["map_label"] = _dense(sd, "map_label")
    if "map_augment.weight" in sd:
        params["map_augment"] = _dense(sd, "map_augment")

    prefixes = sorted({k.split(".")[0] + "." + k.split(".")[1]
                       for k in sd if k.startswith(("enc.", "dec."))})
    for pref in prefixes:
        side, name = pref.split(".")
        flax_name = f"{side}_{name}"
        if f"{pref}.norm0.weight" in sd:          # UNetBlock
            params[flax_name] = _unet_block(sd, pref)
        elif f"{pref}.weight" in sd:
            if sd[f"{pref}.weight"].ndim == 1:    # GroupNorm (aux_norm)
                params[flax_name] = _norm(sd, pref)
            else:                                  # bare conv (enc conv / aux convs)
                params[flax_name] = _edm_conv(sd, pref)
        # kernel=0 resample-only convs (aux_down/aux_up) have no params
    return params


def convert_dhariwal_unet(sd: Dict[str, np.ndarray], config) -> dict:
    """DhariwalUNet state_dict -> flax params (reference edm_networks.py:406-510)."""
    params = {
        "map_layer0": _dense(sd, "map_layer0"),
        "map_layer1": _dense(sd, "map_layer1"),
        "out_norm": _norm(sd, "out_norm"),
        "out_conv": _edm_conv(sd, "out_conv"),
    }
    if "map_label.weight" in sd:
        params["map_label"] = _dense(sd, "map_label")
    if "map_augment.weight" in sd:
        params["map_augment"] = _dense(sd, "map_augment")
    prefixes = sorted({k.split(".")[0] + "." + k.split(".")[1]
                       for k in sd if k.startswith(("enc.", "dec."))})
    for pref in prefixes:
        side, name = pref.split(".")
        flax_name = f"{side}_{name}"
        if f"{pref}.norm0.weight" in sd:
            params[flax_name] = _unet_block(sd, pref)
        elif f"{pref}.weight" in sd:
            params[flax_name] = _edm_conv(sd, pref)
    return params


def convert_edm_sigma_head(sd: Dict[str, np.ndarray], dim: int, channels: int,
                           n_blocks: int) -> Tuple[dict, dict]:
    """EDM SigmaModel (edm_networks.py:979-1022) -> EDMSigmaHead variables."""
    import re
    idxs = sorted({int(m.group(1)) for k in sd
                   for m in [re.match(r"down_layer\.(\d+)\.", k)] if m})
    params: dict = {}
    res_i, down_i = 0, 0
    for idx in idxs:
        p = f"down_layer.{idx}"
        if f"{p}.norm0.weight" in sd:
            params[f"res_{res_i}"] = _unet_block(sd, p)
            res_i += 1
        elif f"{p}.conv.weight" in sd:
            w = sd[f"{p}.conv.weight"]
            params[f"down_{down_i}_conv"] = {
                "kernel": np.transpose(w, (2, 3, 1, 0)),
                "bias": sd[f"{p}.conv.bias"],
            }
            down_i += 1

    inp_dim = dim
    for _ in range(n_blocks):
        if inp_dim % 2 != 0:
            inp_dim += 1
        inp_dim //= 2
    w = sd["fc_layer.1.weight"]
    out_dim = w.shape[0]
    w = w.reshape(out_dim, channels, inp_dim, inp_dim)
    w = np.transpose(w, (0, 2, 3, 1)).reshape(out_dim, inp_dim * inp_dim * channels)
    params["fc"] = {"kernel": np.transpose(w, (1, 0)), "bias": sd["fc_layer.1.bias"]}
    params["bn"] = {"scale": sd["fc_layer.2.weight"], "bias": sd["fc_layer.2.bias"]}
    params["final"] = _dense(sd, "final_mlp")
    batch_stats = {"bn": {"mean": sd["fc_layer.2.running_mean"],
                          "var": sd["fc_layer.2.running_var"]}}
    return params, batch_stats
