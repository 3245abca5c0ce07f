"""guided-diffusion (ADM) torch checkpoint -> ADMUNet/ADMSigmaHead params.

Key map (torch guided-diffusion layout -> flax):
  time_embed.{0,2}            -> time_embed_{0,2} Dense
  label_emb                   -> label_emb Embed
  input_blocks.i.j / middle_block.j / output_blocks.i.j:
     ResBlock: in_layers.0->in_norm, in_layers.2->in_conv,
               emb_layers.1->emb_proj, out_layers.0->out_norm,
               out_layers.3->out_conv, skip_connection->skip
     AttentionBlock: norm->norm, qkv (1x1 conv1d)->qkv Dense,
               proj_out (1x1 conv1d)->proj_out Dense
     Down/Upsample: op/conv -> conv
  out.0 -> out_norm, out.2 -> out_conv

The attention head-channel layouts (legacy vs new order,
unet_adm.py:328-393) are preserved by the Dense transpose — both orders use
the same per-head contiguity in our reshape.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from .torch_convert import _conv_kernel, _dense_kernel, _norm


def _conv(sd, p):
    return {"kernel": _conv_kernel(sd[f"{p}.weight"]), "bias": sd[f"{p}.bias"]}


def _dense(sd, p):
    return {"kernel": _dense_kernel(sd[f"{p}.weight"]), "bias": sd[f"{p}.bias"]}


def _conv1d_as_dense(sd, p):
    w = sd[f"{p}.weight"]  # (out, in, 1)
    return {"kernel": np.transpose(w[..., 0], (1, 0)), "bias": sd[f"{p}.bias"]}


def _adm_resblock(sd, p):
    out = {
        "in_norm": _norm(sd, f"{p}.in_layers.0"),
        "in_conv": _conv(sd, f"{p}.in_layers.2"),
        "emb_proj": _dense(sd, f"{p}.emb_layers.1"),
        "out_norm": _norm(sd, f"{p}.out_layers.0"),
        "out_conv": _conv(sd, f"{p}.out_layers.3"),
    }
    if f"{p}.skip_connection.weight" in sd:
        out["skip"] = _conv(sd, f"{p}.skip_connection")
    return out


def _adm_attn(sd, p):
    return {
        "norm": _norm(sd, f"{p}.norm"),
        "qkv": _conv1d_as_dense(sd, f"{p}.qkv"),
        "proj_out": _conv1d_as_dense(sd, f"{p}.proj_out"),
    }


def _convert_block(sd, p):
    """Identify the layer type at torch prefix p and convert it."""
    if f"{p}.in_layers.0.weight" in sd:
        return _adm_resblock(sd, p)
    if f"{p}.qkv.weight" in sd:
        return _adm_attn(sd, p)
    if f"{p}.op.weight" in sd:        # Downsample
        return {"conv": _conv(sd, f"{p}.op")}
    if f"{p}.conv.weight" in sd:      # Upsample
        return {"conv": _conv(sd, f"{p}.conv")}
    if f"{p}.weight" in sd:           # bare conv (input_blocks.0.0)
        return _conv(sd, p)
    return None


def convert_adm_unet(sd: Dict[str, np.ndarray], config) -> dict:
    params = {
        "time_embed_0": _dense(sd, "time_embed.0"),
        "time_embed_2": _dense(sd, "time_embed.2"),
        "out_norm": _norm(sd, "out.0"),
        "out_conv": _conv(sd, "out.2"),
    }
    if "label_emb.weight" in sd:
        params["label_emb"] = {"embedding": sd["label_emb.weight"]}

    for group in ("input_blocks", "output_blocks", "middle_block"):
        if group == "middle_block":
            for j in range(3):
                conv = _convert_block(sd, f"middle_block.{j}")
                assert conv is not None, f"middle_block.{j}"
                params[f"middle_block_{j}"] = conv
            continue
        i = 0
        while True:
            j, found_any = 0, False
            while True:
                conv = _convert_block(sd, f"{group}.{i}.{j}")
                if conv is None:
                    break
                params[f"{group}_{i}_{j}"] = conv
                found_any = True
                j += 1
            if not found_any:
                break
            i += 1
    return params


def convert_adm_sigma_head(sd: Dict[str, np.ndarray], dim: int, channels: int,
                           n_blocks: int) -> Tuple[dict, dict]:
    """SigmaModel (unet_adm.py:1029) -> ADMSigmaHead params/batch_stats."""
    import re
    idxs = sorted({int(m.group(1)) for k in sd
                   for m in [re.match(r"down_layer\.(\d+)\.", k)] if m})
    params: dict = {}
    res_i, down_i = 0, 0
    for idx in idxs:
        p = f"down_layer.{idx}"
        if f"{p}.in_layers.0.weight" in sd:
            rb = _adm_resblock(sd, p) if f"{p}.emb_layers.1.weight" in sd else {
                "in_norm": _norm(sd, f"{p}.in_layers.0"),
                "in_conv": _conv(sd, f"{p}.in_layers.2"),
                "out_norm": _norm(sd, f"{p}.out_layers.0"),
                "out_conv": _conv(sd, f"{p}.out_layers.3"),
            }
            params[f"res_{res_i}_in_norm"] = rb["in_norm"]
            params[f"res_{res_i}_in_conv"] = rb["in_conv"]
            params[f"res_{res_i}_out_norm"] = rb["out_norm"]
            params[f"res_{res_i}_out_conv"] = rb["out_conv"]
            res_i += 1
        elif f"{p}.qkv.weight" in sd:
            params["attn_0"] = _adm_attn(sd, p)
        elif f"{p}.op.weight" in sd:
            params[f"down_{down_i}_conv"] = _conv(sd, f"{p}.op")
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


def convert_classifier(sd: Dict[str, np.ndarray], config) -> dict:
    """EncoderUNetModel (classifier) state_dict -> models.classifier params
    (reference src/unet_adm.py:816-1027, incl. the four pooling heads and
    AttentionPool2d :22-51 whose positional embedding is channel-major)."""
    params = {
        "time_embed_0": _dense(sd, "time_embed.0"),
        "time_embed_2": _dense(sd, "time_embed.2"),
        "input_conv": _conv(sd, "input_blocks.0.0"),
    }
    n, bi, ds = 1, 0, 1
    for level, _ in enumerate(config.channel_mult):
        for _ in range(config.num_res_blocks):
            params[f"block_{bi}"] = _adm_resblock(sd, f"input_blocks.{n}.0")
            if ds in config.attention_resolutions:
                params[f"attn_{bi}"] = _adm_attn(sd, f"input_blocks.{n}.1")
            bi += 1
            n += 1
        if level != len(config.channel_mult) - 1:
            if config.resblock_updown:
                params[f"down_{level}"] = _adm_resblock(sd,
                                                        f"input_blocks.{n}.0")
            else:
                params[f"down_{level}"] = {
                    "conv": _conv(sd, f"input_blocks.{n}.0.op")}
            n += 1
            ds *= 2
    params["middle_0"] = _adm_resblock(sd, "middle_block.0")
    params["middle_1"] = _adm_attn(sd, "middle_block.1")
    params["middle_2"] = _adm_resblock(sd, "middle_block.2")

    if config.pool == "adaptive":
        params["out_norm"] = _norm(sd, "out.0")
        params["out_conv"] = _conv(sd, "out.3")
    elif config.pool == "attention":
        params["out_norm"] = _norm(sd, "out.0")
        params["out_pool"] = {
            "positional_embedding": np.transpose(
                sd["out.2.positional_embedding"], (1, 0)),
            "qkv_proj": _conv1d_as_dense(sd, "out.2.qkv_proj"),
            "c_proj": _conv1d_as_dense(sd, "out.2.c_proj"),
        }
    elif config.pool == "spatial":
        params["out_fc1"] = _dense(sd, "out.0")
        params["out_fc2"] = _dense(sd, "out.2")
    else:  # spatial_v2
        params["out_fc1"] = _dense(sd, "out.0")
        params["out_norm"] = _norm(sd, "out.1")
        params["out_fc2"] = _dense(sd, "out.3")
    return params
