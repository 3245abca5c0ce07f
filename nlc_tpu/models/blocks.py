"""Residual blocks shared by the DDIM UNet and the sigma heads."""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from .layers import GroupNorm, swish


class ResnetBlock(nn.Module):
    """DDIM-style resblock (reference src/unet_simple.py:77-134).

    norm -> swish -> conv3x3 -> (+ temb proj) -> norm -> swish -> dropout ->
    conv3x3 -> + shortcut.  With temb=None this is the reference's
    PureResnetBlock (src/unet_simple.py:426-478) used inside SigmaModel.
    """
    out_channels: Optional[int] = None
    conv_shortcut: bool = False
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        in_ch = x.shape[-1]
        out_ch = self.out_channels or in_ch

        h = GroupNorm(name="norm1")(x)
        h = swish(h)
        h = nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        if temb is not None:
            t = nn.Dense(out_ch, dtype=self.dtype, name="temb_proj")(swish(temb))
            h = h + t[:, None, None, :]
        h = GroupNorm(name="norm2")(h)
        h = swish(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)

        if in_ch != out_ch:
            if self.conv_shortcut:
                x = nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype,
                            name="conv_shortcut")(x)
            else:
                x = nn.Conv(out_ch, (1, 1), dtype=self.dtype, name="nin_shortcut")(x)
        return x + h
