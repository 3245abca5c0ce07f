"""DDIM ("simple") epsilon-UNet — the CelebA/CelebA-HQ backbone.

Capability parity with reference src/unet_simple.py:192-423 (`Model`):
config-driven channel multipliers, per-resolution attention, nearest-upsample /
asym-pad-downsample, and the three entry points the NLC engine needs:
  __call__(x, t)            -> eps
  encode(x, t)              -> mid-block feature (feat_layer 0: after mid attn,
                               else after mid block_2)
  forward_and_encode(x, t)  -> (eps, feat) in one pass

TPU-first: NHWC activations, fp32 GroupNorm islands inside an optional bf16
compute dtype, shared submodules across the three methods (setup-style) so one
set of params serves all call paths under jit/scan.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .blocks import ResnetBlock
from .layers import GroupNorm, SpatialSelfAttention, Upsample, Downsample, swish, timestep_embedding


@dataclass(frozen=True)
class DDIMUNetConfig:
    """Mirrors the reference YAML `model`/`data` schema (store/config/*.yml,
    consumed at src/unet_simple.py:196-214)."""
    ch: int = 128
    out_ch: int = 3
    ch_mult: Tuple[int, ...] = (1, 2, 2, 2)
    num_res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = (16,)
    dropout: float = 0.0
    in_channels: int = 3
    resolution: int = 32
    resamp_with_conv: bool = True
    feat_layer: int = 0
    # int8 W8A8 conv backend ('taps' | 'conv', ops/quant.py) for interior
    # convs; conv_in / conv_out stay full precision. None = bf16/fp32 path.
    quant_backend: Optional[str] = None

    @property
    def feat_shape(self) -> Tuple[int, int, int]:
        """(H, W, C) of the encode() feature fed to the sigma head."""
        d = int(self.resolution * 0.5 ** (len(self.ch_mult) - 1))
        c = self.ch * self.ch_mult[-1]
        return (d, d, c)


class DDIMUNet(nn.Module):
    config: DDIMUNetConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.temb_dense_0 = nn.Dense(cfg.ch * 4, dtype=self.dtype, name="temb_dense_0")
        self.temb_dense_1 = nn.Dense(cfg.ch * 4, dtype=self.dtype, name="temb_dense_1")
        self.conv_in = nn.Conv(cfg.ch, (3, 3), padding=1, dtype=self.dtype, name="conv_in")

        num_res = len(cfg.ch_mult)
        in_ch_mult = (1,) + tuple(cfg.ch_mult)
        curr_res = cfg.resolution

        down_blocks, down_attns, downsamples, down_has_attn = [], [], [], []
        block_in = cfg.ch
        for i_level in range(num_res):
            blocks, attns = [], []
            block_in = cfg.ch * in_ch_mult[i_level]
            block_out = cfg.ch * cfg.ch_mult[i_level]
            has_attn = curr_res in cfg.attn_resolutions
            for i_block in range(cfg.num_res_blocks):
                blocks.append(ResnetBlock(out_channels=block_out, dropout=cfg.dropout,
                                          dtype=self.dtype, quant=cfg.quant_backend,
                                          name=f"down_{i_level}_block_{i_block}"))
                block_in = block_out
                if has_attn:
                    attns.append(SpatialSelfAttention(dtype=self.dtype,
                                                      name=f"down_{i_level}_attn_{i_block}"))
            down_has_attn.append(has_attn)
            down_blocks.append(blocks)
            down_attns.append(attns)
            if i_level != num_res - 1:
                downsamples.append(Downsample(cfg.resamp_with_conv, dtype=self.dtype,
                                              quant=cfg.quant_backend,
                                              name=f"down_{i_level}_downsample"))
                curr_res //= 2
            else:
                downsamples.append(None)
        self.down_blocks = down_blocks
        self.down_attns = down_attns
        self.downsamples = downsamples
        self._down_has_attn = tuple(down_has_attn)

        self.mid_block_1 = ResnetBlock(dropout=cfg.dropout, dtype=self.dtype, quant=cfg.quant_backend, name="mid_block_1")
        self.mid_attn_1 = SpatialSelfAttention(dtype=self.dtype, name="mid_attn_1")
        self.mid_block_2 = ResnetBlock(dropout=cfg.dropout, dtype=self.dtype, quant=cfg.quant_backend, name="mid_block_2")

        up_blocks, up_attns, upsamples = [], [], []
        up_has_attn = [False] * num_res
        for i_level in reversed(range(num_res)):
            blocks, attns = [], []
            block_out = cfg.ch * cfg.ch_mult[i_level]
            has_attn = curr_res in cfg.attn_resolutions
            for i_block in range(cfg.num_res_blocks + 1):
                blocks.append(ResnetBlock(out_channels=block_out, dropout=cfg.dropout,
                                          dtype=self.dtype, quant=cfg.quant_backend,
                                          name=f"up_{i_level}_block_{i_block}"))
                if has_attn:
                    attns.append(SpatialSelfAttention(dtype=self.dtype,
                                                      name=f"up_{i_level}_attn_{i_block}"))
            up_has_attn[i_level] = has_attn
            up_blocks.insert(0, blocks)
            up_attns.insert(0, attns)
            if i_level != 0:
                upsamples.insert(0, Upsample(cfg.resamp_with_conv, dtype=self.dtype,
                                             quant=cfg.quant_backend,
                                             name=f"up_{i_level}_upsample"))
                curr_res *= 2
            else:
                upsamples.insert(0, None)
        self.up_blocks = up_blocks
        self.up_attns = up_attns
        self.upsamples = upsamples
        self._up_has_attn = tuple(up_has_attn)

        self.norm_out = GroupNorm(name="norm_out")
        self.conv_out = nn.Conv(cfg.out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv_out")

    # ---- shared stages ----
    def _temb(self, t):
        temb = timestep_embedding(t, self.config.ch)
        temb = self.temb_dense_0(temb)
        temb = self.temb_dense_1(swish(temb))
        return temb.astype(self.dtype)

    def _encode_stage(self, x, temb, deterministic):
        cfg = self.config
        hs = [self.conv_in(x.astype(self.dtype))]
        for i_level in range(len(cfg.ch_mult)):
            for i_block in range(cfg.num_res_blocks):
                h = self.down_blocks[i_level][i_block](hs[-1], temb, deterministic)
                if self._down_has_attn[i_level]:
                    h = self.down_attns[i_level][i_block](h)
                hs.append(h)
            if self.downsamples[i_level] is not None:
                hs.append(self.downsamples[i_level](hs[-1]))
        return hs

    def _decode_stage(self, h, hs, temb, deterministic):
        cfg = self.config
        for i_level in reversed(range(len(cfg.ch_mult))):
            for i_block in range(cfg.num_res_blocks + 1):
                h = self.up_blocks[i_level][i_block](
                    jnp.concatenate([h, hs.pop()], axis=-1), temb, deterministic)
                if self._up_has_attn[i_level]:
                    h = self.up_attns[i_level][i_block](h)
            if self.upsamples[i_level] is not None:
                h = self.upsamples[i_level](h)
        h = self.norm_out(h, act="silu")   # fused epilogue (layers.GroupNorm)
        return self.conv_out(h)

    # ---- public entry points ----
    def __call__(self, x, t, deterministic: bool = True):
        temb = self._temb(t)
        hs = self._encode_stage(x, temb, deterministic)
        h = self.mid_block_1(hs[-1], temb, deterministic)
        h = self.mid_attn_1(h)
        h = self.mid_block_2(h, temb, deterministic)
        return self._decode_stage(h, hs, temb, deterministic)

    def encode(self, x, t, deterministic: bool = True):
        temb = self._temb(t)
        hs = self._encode_stage(x, temb, deterministic)
        h = self.mid_block_1(hs[-1], temb, deterministic)
        if self.config.feat_layer == 0:
            return self.mid_attn_1(h)
        h = self.mid_attn_1(h)
        return self.mid_block_2(h, temb, deterministic)

    def forward_and_encode(self, x, t, deterministic: bool = True):
        temb = self._temb(t)
        hs = self._encode_stage(x, temb, deterministic)
        h = self.mid_block_1(hs[-1], temb, deterministic)
        h = self.mid_attn_1(h)
        if self.config.feat_layer == 0:
            feat = h
            h = self.mid_block_2(h, temb, deterministic)
        else:
            h = self.mid_block_2(h, temb, deterministic)
            feat = h
        out = self._decode_stage(h, hs, temb, deterministic)
        return out, feat
