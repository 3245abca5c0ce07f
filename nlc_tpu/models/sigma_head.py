"""Sigma-correction head ("SigmaModel").

Reads the frozen UNet's mid-block feature and predicts a multiplicative
residual for the noise level: sigma_hat = sigma * (1 + residual).

Capability parity with the reference's three SigmaModel variants
(src/unet_simple.py:481-517, src/unet_adm.py:1029-1083,
src/edm_networks.py:979-1022), which share one topology:

  n_blocks x [odd-dim pad -> resblock -> (attention on block 0) -> downsample]
  -> flatten -> Linear(128) -> BatchNorm1d -> GELU -> Linear(out_dim)
  -> reshape (B, 1, 1, 1)

TPU notes: NHWC; flatten order is (H, W, C) — the torch converter permutes the
first Linear's weights to compensate for torch's (C, H, W) flatten. BatchNorm
runs with running averages at inference (torch eval-mode semantics); training
updates batch_stats through the flax mutable-collection mechanism.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
from flax import linen as nn

from .blocks import ResnetBlock
from .layers import SpatialSelfAttention, Downsample


@dataclass(frozen=True)
class SigmaHeadConfig:
    dim: int = 4            # spatial size of the input feature
    channels: int = 64      # feature channels
    n_blocks: int = 2
    out_dim: int = 1
    dropout: float = 0.1
    fc_dim: int = 128


class SigmaHead(nn.Module):
    config: SigmaHeadConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat: jnp.ndarray, deterministic: bool = True,
                 use_running_average: bool = True) -> jnp.ndarray:
        cfg = self.config
        h = feat.astype(self.dtype)
        inp_dim = cfg.dim
        for i in range(cfg.n_blocks):
            if inp_dim % 2 != 0:
                # right/bottom zero pad to even (torch ConstantPad2d((0,1,0,1)))
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                inp_dim += 1
            h = ResnetBlock(dropout=cfg.dropout, dtype=self.dtype,
                            name=f"res_{i}")(h, None, deterministic)
            if i == 0:
                h = SpatialSelfAttention(dtype=self.dtype, name="attn_0")(h)
            h = Downsample(with_conv=True, dtype=self.dtype, name=f"down_{i}")(h)
            inp_dim //= 2

        b = h.shape[0]
        h = h.reshape(b, -1)
        h = nn.Dense(cfg.fc_dim, dtype=self.dtype, name="fc")(h)
        h = nn.BatchNorm(use_running_average=use_running_average, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="bn")(h)
        h = nn.gelu(h, approximate=False)
        out = nn.Dense(cfg.out_dim, dtype=self.dtype, name="final")(h)
        return out.reshape(b, 1, 1, 1)


def sigma_head_for_unet(feat_shape, n_blocks: int = 2, dropout: float = 0.0) -> SigmaHeadConfig:
    """Size the head from the backbone's encode() feature shape (H, W, C) —
    mirrors script_util.create_*_sigma_eps_model (src/script_util.py:198-204)."""
    h, w, c = feat_shape
    assert h == w
    return SigmaHeadConfig(dim=h, channels=c, n_blocks=n_blocks, dropout=dropout)
