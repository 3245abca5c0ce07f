"""Flax-param -> torch-state_dict reverse converters (host-side, numpy only).

The inverse of torch_convert / adm_convert / edm_convert: takes the param
trees our models use and emits a state_dict keyed exactly like the reference
modules (src/unet_simple.py, src/unet_adm.py, src/edm_networks.py), so users
migrating gradually can train/finetune here and load the result back into the
torch reference. Every transform is the exact inverse of the forward
converter's; round-trip equality (torch -> flax -> torch) is asserted in
tests/test_reverse_convert.py.

All functions are pure {nested dict of arrays} -> {flat dict of numpy}; use
`save_torch_state_dict` to write a torch .pt (requires torch on host).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np


def _np(x) -> np.ndarray:
    return np.asarray(x)


def _inv_conv(dst: Dict[str, np.ndarray], prefix: str, leaf: dict) -> None:
    """flax conv {kernel (kh,kw,I,O), bias?} -> torch {prefix}.weight (O,I,kh,kw)."""
    dst[f"{prefix}.weight"] = np.transpose(_np(leaf["kernel"]), (3, 2, 0, 1))
    if "bias" in leaf:
        dst[f"{prefix}.bias"] = _np(leaf["bias"])


def _inv_dense(dst: Dict[str, np.ndarray], prefix: str, leaf: dict) -> None:
    dst[f"{prefix}.weight"] = np.transpose(_np(leaf["kernel"]), (1, 0))
    if "bias" in leaf:
        dst[f"{prefix}.bias"] = _np(leaf["bias"])


def _inv_dense_as_conv1d(dst: Dict[str, np.ndarray], prefix: str, leaf: dict) -> None:
    """flax Dense used for a torch 1x1 Conv1d (adm_convert._conv1d_as_dense)."""
    dst[f"{prefix}.weight"] = np.transpose(_np(leaf["kernel"]), (1, 0))[..., None]
    dst[f"{prefix}.bias"] = _np(leaf["bias"])


def _inv_norm(dst: Dict[str, np.ndarray], prefix: str, leaf: dict) -> None:
    dst[f"{prefix}.weight"] = _np(leaf["scale"])
    dst[f"{prefix}.bias"] = _np(leaf["bias"])


def _inv_flatten_permuted_dense(kernel: np.ndarray, c: int, h: int, w: int) -> np.ndarray:
    """Inverse of torch_convert._flatten_permuted_dense: our (H*W*C, out)
    NHWC-flatten kernel back to torch's (out, C*H*W) CHW-flatten weight."""
    out_dim = kernel.shape[1]
    k = np.transpose(_np(kernel), (1, 0)).reshape(out_dim, h, w, c)
    return np.transpose(k, (0, 3, 1, 2)).reshape(out_dim, c * h * w)


def _sigma_fc_tail(dst: Dict[str, np.ndarray], params: dict, batch_stats: Optional[dict],
                   dim: int, channels: int, n_blocks: int) -> None:
    """fc_layer.[1 Linear, 2 BatchNorm1d] + final_mlp, shared by all three
    sigma-head families (the flatten permutation depends on the post-pad
    spatial size)."""
    inp_dim = dim
    for _ in range(n_blocks):
        if inp_dim % 2 != 0:
            inp_dim += 1
        inp_dim //= 2
    dst["fc_layer.1.weight"] = _inv_flatten_permuted_dense(
        params["fc"]["kernel"], channels, inp_dim, inp_dim)
    dst["fc_layer.1.bias"] = _np(params["fc"]["bias"])
    dst["fc_layer.2.weight"] = _np(params["bn"]["scale"])
    dst["fc_layer.2.bias"] = _np(params["bn"]["bias"])
    if batch_stats is not None:
        dst["fc_layer.2.running_mean"] = _np(batch_stats["bn"]["mean"])
        dst["fc_layer.2.running_var"] = _np(batch_stats["bn"]["var"])
        dst["fc_layer.2.num_batches_tracked"] = np.asarray(0, np.int64)
    _inv_dense(dst, "final_mlp", params["final"])


# --------------------------------------------------------------------------
# DDIM family (src/unet_simple.py)
# --------------------------------------------------------------------------

def _inv_ddim_resblock(dst, p, leaf):
    _inv_norm(dst, f"{p}.norm1", leaf["norm1"])
    _inv_conv(dst, f"{p}.conv1", leaf["conv1"])
    _inv_norm(dst, f"{p}.norm2", leaf["norm2"])
    _inv_conv(dst, f"{p}.conv2", leaf["conv2"])
    if "temb_proj" in leaf:
        _inv_dense(dst, f"{p}.temb_proj", leaf["temb_proj"])
    if "nin_shortcut" in leaf:
        _inv_conv(dst, f"{p}.nin_shortcut", leaf["nin_shortcut"])
    if "conv_shortcut" in leaf:
        _inv_conv(dst, f"{p}.conv_shortcut", leaf["conv_shortcut"])


def _inv_ddim_attn(dst, p, leaf):
    _inv_norm(dst, f"{p}.norm", leaf["norm"])
    for name in ("q", "k", "v", "proj_out"):
        _inv_conv(dst, f"{p}.{name}", leaf[name])


def ddim_unet_to_torch(params: dict) -> Dict[str, np.ndarray]:
    """Inverse of torch_convert.convert_ddim_unet."""
    params = params.get("params", params)
    sd: Dict[str, np.ndarray] = {}
    _inv_dense(sd, "temb.dense.0", params["temb_dense_0"])
    _inv_dense(sd, "temb.dense.1", params["temb_dense_1"])
    _inv_conv(sd, "conv_in", params["conv_in"])
    _inv_ddim_resblock(sd, "mid.block_1", params["mid_block_1"])
    _inv_ddim_attn(sd, "mid.attn_1", params["mid_attn_1"])
    _inv_ddim_resblock(sd, "mid.block_2", params["mid_block_2"])
    _inv_norm(sd, "norm_out", params["norm_out"])
    _inv_conv(sd, "conv_out", params["conv_out"])
    for name, leaf in params.items():
        parts = name.split("_")
        if parts[0] not in ("down", "up") or name in ("norm_out", "conv_out"):
            continue
        side, i, kind = parts[0], parts[1], parts[2]
        if kind == "block":
            _inv_ddim_resblock(sd, f"{side}.{i}.block.{parts[3]}", leaf)
        elif kind == "attn":
            _inv_ddim_attn(sd, f"{side}.{i}.attn.{parts[3]}", leaf)
        elif kind in ("downsample", "upsample"):
            _inv_conv(sd, f"{side}.{i}.{kind}.conv", leaf["conv"])
    return sd


def ddim_sigma_head_to_torch(params: dict, batch_stats: Optional[dict],
                             dim: int, channels: int,
                             n_blocks: int) -> Dict[str, np.ndarray]:
    """Inverse of torch_convert.convert_sigma_head, reconstructing the torch
    ModuleList indices (reference unet_simple.py:484-499: every block i
    appends [pad-or-Identity, PureResnetBlock, (attn iff i==0), Downsample],
    so the pad slot always consumes an index)."""
    params = params.get("params", params)
    sd: Dict[str, np.ndarray] = {}
    idx = 0
    for i in range(n_blocks):
        idx += 1  # ConstantPad2d / Identity slot
        _inv_ddim_resblock(sd, f"down_layer.{idx}", params[f"res_{i}"])
        idx += 1
        if i == 0:
            _inv_ddim_attn(sd, f"down_layer.{idx}", params["attn_0"])
            idx += 1
        _inv_conv(sd, f"down_layer.{idx}.conv", params[f"down_{i}"]["conv"])
        idx += 1
    _sigma_fc_tail(sd, params, batch_stats, dim, channels, n_blocks)
    return sd


# --------------------------------------------------------------------------
# ADM family (src/unet_adm.py)
# --------------------------------------------------------------------------

def _inv_adm_resblock(dst, p, leaf):
    _inv_norm(dst, f"{p}.in_layers.0", leaf["in_norm"])
    _inv_conv(dst, f"{p}.in_layers.2", leaf["in_conv"])
    if "emb_proj" in leaf:
        _inv_dense(dst, f"{p}.emb_layers.1", leaf["emb_proj"])
    _inv_norm(dst, f"{p}.out_layers.0", leaf["out_norm"])
    _inv_conv(dst, f"{p}.out_layers.3", leaf["out_conv"])
    if "skip" in leaf:
        _inv_conv(dst, f"{p}.skip_connection", leaf["skip"])


def _inv_adm_attn(dst, p, leaf):
    _inv_norm(dst, f"{p}.norm", leaf["norm"])
    _inv_dense_as_conv1d(dst, f"{p}.qkv", leaf["qkv"])
    _inv_dense_as_conv1d(dst, f"{p}.proj_out", leaf["proj_out"])


def _inv_adm_block(dst, p, leaf, sample_op: str):
    """Inverse of adm_convert._convert_block. sample_op: 'op' (Downsample in
    input_blocks) or 'conv' (Upsample in output_blocks)."""
    if "in_norm" in leaf:
        _inv_adm_resblock(dst, p, leaf)
    elif "qkv" in leaf:
        _inv_adm_attn(dst, p, leaf)
    elif "conv" in leaf:
        _inv_conv(dst, f"{p}.{sample_op}", leaf["conv"])
    else:  # bare conv (input_blocks.0.0)
        _inv_conv(dst, p, leaf)


def adm_unet_to_torch(params: dict) -> Dict[str, np.ndarray]:
    """Inverse of adm_convert.convert_adm_unet."""
    params = params.get("params", params)
    sd: Dict[str, np.ndarray] = {}
    _inv_dense(sd, "time_embed.0", params["time_embed_0"])
    _inv_dense(sd, "time_embed.2", params["time_embed_2"])
    _inv_norm(sd, "out.0", params["out_norm"])
    _inv_conv(sd, "out.2", params["out_conv"])
    if "label_emb" in params:
        sd["label_emb.weight"] = _np(params["label_emb"]["embedding"])
    for name, leaf in params.items():
        for group, op in (("input_blocks", "op"), ("output_blocks", "conv")):
            if name.startswith(group + "_"):
                i, j = name[len(group) + 1:].split("_")
                _inv_adm_block(sd, f"{group}.{i}.{j}", leaf, op)
        if name.startswith("middle_block_"):
            j = name[len("middle_block_"):]
            _inv_adm_block(sd, f"middle_block.{j}", leaf, "op")
    return sd


def adm_sigma_head_to_torch(params: dict, batch_stats: Optional[dict],
                            dim: int, channels: int,
                            n_blocks: int) -> Dict[str, np.ndarray]:
    """Inverse of adm_convert.convert_adm_sigma_head (same ModuleList layout
    as the DDIM head, reference unet_adm.py:1037-1050)."""
    params = params.get("params", params)
    sd: Dict[str, np.ndarray] = {}
    idx = 0
    for i in range(n_blocks):
        idx += 1  # pad / Identity slot
        p = f"down_layer.{idx}"
        _inv_norm(sd, f"{p}.in_layers.0", params[f"res_{i}_in_norm"])
        _inv_conv(sd, f"{p}.in_layers.2", params[f"res_{i}_in_conv"])
        _inv_norm(sd, f"{p}.out_layers.0", params[f"res_{i}_out_norm"])
        _inv_conv(sd, f"{p}.out_layers.3", params[f"res_{i}_out_conv"])
        idx += 1
        if i == 0:
            _inv_adm_attn(sd, f"down_layer.{idx}", params["attn_0"])
            idx += 1
        _inv_conv(sd, f"down_layer.{idx}.op", params[f"down_{i}_conv"])
        idx += 1
    _sigma_fc_tail(sd, params, batch_stats, dim, channels, n_blocks)
    return sd


def classifier_to_torch(params: dict, config) -> Dict[str, np.ndarray]:
    """Inverse of adm_convert.convert_classifier (EncoderUNetModel, all four
    pooling heads)."""
    params = params.get("params", params)
    sd: Dict[str, np.ndarray] = {}
    _inv_dense(sd, "time_embed.0", params["time_embed_0"])
    _inv_dense(sd, "time_embed.2", params["time_embed_2"])
    _inv_conv(sd, "input_blocks.0.0", params["input_conv"])
    n, bi, ds = 1, 0, 1
    for level, _ in enumerate(config.channel_mult):
        for _ in range(config.num_res_blocks):
            _inv_adm_resblock(sd, f"input_blocks.{n}.0", params[f"block_{bi}"])
            if ds in config.attention_resolutions:
                _inv_adm_attn(sd, f"input_blocks.{n}.1", params[f"attn_{bi}"])
            bi += 1
            n += 1
        if level != len(config.channel_mult) - 1:
            if config.resblock_updown:
                _inv_adm_resblock(sd, f"input_blocks.{n}.0", params[f"down_{level}"])
            else:
                _inv_conv(sd, f"input_blocks.{n}.0.op", params[f"down_{level}"]["conv"])
            n += 1
            ds *= 2
    _inv_adm_resblock(sd, "middle_block.0", params["middle_0"])
    _inv_adm_attn(sd, "middle_block.1", params["middle_1"])
    _inv_adm_resblock(sd, "middle_block.2", params["middle_2"])

    if config.pool == "adaptive":
        _inv_norm(sd, "out.0", params["out_norm"])
        _inv_conv(sd, "out.3", params["out_conv"])
    elif config.pool == "attention":
        _inv_norm(sd, "out.0", params["out_norm"])
        pool = params["out_pool"]
        sd["out.2.positional_embedding"] = np.transpose(
            _np(pool["positional_embedding"]), (1, 0))
        _inv_dense_as_conv1d(sd, "out.2.qkv_proj", pool["qkv_proj"])
        _inv_dense_as_conv1d(sd, "out.2.c_proj", pool["c_proj"])
    elif config.pool == "spatial":
        _inv_dense(sd, "out.0", params["out_fc1"])
        _inv_dense(sd, "out.2", params["out_fc2"])
    else:  # spatial_v2
        _inv_dense(sd, "out.0", params["out_fc1"])
        _inv_norm(sd, "out.1", params["out_norm"])
        _inv_dense(sd, "out.3", params["out_fc2"])
    return sd


# --------------------------------------------------------------------------
# EDM family (src/edm_networks.py)
# --------------------------------------------------------------------------

def _inv_edm_unet_block(dst, p, leaf):
    _inv_norm(dst, f"{p}.norm0", leaf["norm0"])
    _inv_conv(dst, f"{p}.conv0", leaf["conv0"])
    _inv_norm(dst, f"{p}.norm1", leaf["norm1"])
    _inv_conv(dst, f"{p}.conv1", leaf["conv1"])
    if "affine" in leaf:
        _inv_dense(dst, f"{p}.affine", leaf["affine"])
    if "skip" in leaf:
        _inv_conv(dst, f"{p}.skip", leaf["skip"])
    if "norm2" in leaf:
        _inv_norm(dst, f"{p}.norm2", leaf["norm2"])
        _inv_conv(dst, f"{p}.qkv", leaf["qkv"])
        _inv_conv(dst, f"{p}.proj", leaf["proj"])


def song_unet_to_torch(params: dict) -> Dict[str, np.ndarray]:
    """Inverse of edm_convert.convert_song_unet (also covers DhariwalUNet:
    its extra out_norm/out_conv keys are handled below)."""
    params = params.get("params", params)
    sd: Dict[str, np.ndarray] = {}
    for name, leaf in params.items():
        if name == "map_noise_freqs":
            sd["map_noise.freqs"] = _np(leaf)
        elif name in ("map_layer0", "map_layer1", "map_label", "map_augment"):
            _inv_dense(sd, name, leaf)
        elif name == "out_norm":
            _inv_norm(sd, "out_norm", leaf)
        elif name == "out_conv":
            _inv_conv(sd, "out_conv", leaf)
        elif name.startswith(("enc_", "dec_")):
            side, rest = name.split("_", 1)
            p = f"{side}.{rest}"
            if "norm0" in leaf:
                _inv_edm_unet_block(sd, p, leaf)
            elif "scale" in leaf:      # GroupNorm (aux_norm)
                _inv_norm(sd, p, leaf)
            else:                       # bare conv
                _inv_conv(sd, p, leaf)
    return sd


dhariwal_unet_to_torch = song_unet_to_torch


def edm_sigma_head_to_torch(params: dict, batch_stats: Optional[dict],
                            dim: int, channels: int,
                            n_blocks: int) -> Dict[str, np.ndarray]:
    """Inverse of edm_convert.convert_edm_sigma_head (reference
    edm_networks.py:993-1004: [pad-or-Identity, PureUNetBlock, Downsample]
    per block; attention lives inside the block)."""
    params = params.get("params", params)
    sd: Dict[str, np.ndarray] = {}
    idx = 0
    for i in range(n_blocks):
        idx += 1  # pad / Identity slot
        _inv_edm_unet_block(sd, f"down_layer.{idx}", params[f"res_{i}"])
        idx += 1
        _inv_conv(sd, f"down_layer.{idx}.conv", params[f"down_{i}_conv"])
        idx += 1
    _sigma_fc_tail(sd, params, batch_stats, dim, channels, n_blocks)
    return sd


# --------------------------------------------------------------------------
# introspection + host IO
# --------------------------------------------------------------------------

def infer_sigma_head_dims(params: dict) -> Tuple[int, int, int]:
    """Recover (dim, channels, n_blocks) from a sigma-head param tree so the
    reverse converters run config-free. The recovered `dim` is the unique
    even-at-every-stage input size producing the same post-pad spatial size
    (the flatten permutation and ModuleList indices only depend on that and
    on n_blocks, so any original odd/even `dim` round-trips identically)."""
    params = params.get("params", params)
    n_blocks = len([k for k in params if k.startswith("down_")])
    for key in ("res_0", "res_0_in_conv"):  # DDIM/EDM nested vs ADM flat keys
        if key in params:
            leaf = params[key]
            if "conv0" in leaf:      # EDM PureUNetBlock
                leaf = leaf["conv0"]
            elif "conv1" in leaf:    # DDIM PureResnetBlock
                leaf = leaf["conv1"]
            channels = int(np.shape(leaf["kernel"])[-1])
            break
    else:
        raise ValueError("not a sigma-head param tree (no res_0 block)")
    fc_in = int(np.shape(params["fc"]["kernel"])[0])
    inp = int(round((fc_in // channels) ** 0.5))
    assert inp * inp * channels == fc_in, (fc_in, channels)
    return inp << n_blocks, channels, n_blocks

def save_torch_state_dict(sd: Dict[str, np.ndarray], path: str) -> None:
    """Write a {name: numpy} state_dict as a torch .pt checkpoint."""
    import torch  # host-only dependency

    torch.save({k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
               path)
