"""Residual blocks shared by the DDIM UNet and the sigma heads."""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from .layers import GroupNorm, swish


def _conv(quant, features, kernel_size, *, name, dtype, padding="SAME"):
    """nn.Conv or the W8A8 int8 drop-in — see ops.quant.make_conv."""
    from ..ops.quant import make_conv
    return make_conv(quant, features, kernel_size, name=name, dtype=dtype,
                     padding=padding)


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
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        from ..ops.quant import resolve_backend
        in_ch = x.shape[-1]
        out_ch = self.out_channels or in_ch

        # fused GroupNorm+SiLU(+int8) epilogue (layers.GroupNorm); quantize
        # at the norm only when the consumer conv runs int8 and nothing
        # (dropout) sits between (see adm_unet.ADMResBlock)
        can_q = (self.quant is not None and x.ndim == 4
                 and resolve_backend(self.quant, x.shape[1], 3, 3, (1, 1))
                 is not None)
        h = GroupNorm(name="norm1")(x, act="silu", quant=can_q)
        h = _conv(self.quant, out_ch, 3, padding=1, dtype=self.dtype,
                  name="conv1")(h)
        if temb is not None:
            t = nn.Dense(out_ch, dtype=self.dtype, name="temb_proj")(swish(temb))
            h = h + t[:, None, None, :]
        q2 = can_q and (self.dropout == 0.0 or deterministic)
        h = GroupNorm(name="norm2")(h, act="silu", quant=q2)
        if not isinstance(h, tuple):
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = _conv(self.quant, out_ch, 3, padding=1, dtype=self.dtype,
                  name="conv2")(h)

        if in_ch != out_ch:
            if self.conv_shortcut:
                x = _conv(self.quant, out_ch, 3, padding=1, dtype=self.dtype,
                          name="conv_shortcut")(x)
            else:
                x = _conv(self.quant, out_ch, 1, dtype=self.dtype,
                          name="nin_shortcut")(x)
        return x + h
