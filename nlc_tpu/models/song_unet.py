"""EDM / SongUNet (DDPM++, NCSN++) model family + preconditioning wrappers.

Capability parity with reference src/edm_networks.py:
  Conv2d w/ FIR up-down resampling       :51-103
  GroupNorm (channel-capped groups)      :105-122
  fp32 attention softmax                 :124-139 (AttentionOp)
  UNetBlock (DDPM++/NCSN++/ADM union)    :148-205
  Positional/Fourier embeddings          :212-240
  SongUNet + encode() feature tap        :732-909 (the live, second definition)
  VP/VE/iDDPM/EDM preconditioners        :511-730
  EDM SigmaModel (PureUNetBlock)         :912-1022
  EDMHelper (precond forward + encode)   :1024-1079

TPU-first: NHWC; FIR resampling as depthwise lax convs; attention einsums hit
the MXU with fp32 accumulation; the per-head (ch,3)-interleaved qkv layout of
the reference is reproduced exactly so converted EDM pickles load bit-true.
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import swish


class EDMGroupNorm(nn.Module):
    """GroupNorm with groups = min(32, C // 4) (reference :105-122).

    film_scale/film_shift/act/quant fuse the UNetBlock epilogue (FiLM +
    SiLU + optional int8 quantize) via ops/groupnorm_pallas.py — same
    mechanism as models.layers.GroupNorm, with EDM's group rule."""
    num_groups: int = 32
    min_channels_per_group: int = 4
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, film_scale=None, film_shift=None,
                 act: Optional[str] = None, quant: bool = False):
        c = x.shape[-1]
        g = min(self.num_groups, c // self.min_channels_per_group)
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        if (film_scale is not None or film_shift is not None
                or act is not None or quant) and x.ndim == 4:
            from ..ops.groupnorm_pallas import fused_groupnorm_act
            fs = (film_scale.astype(jnp.float32)
                  if film_scale is not None else None)
            fh = (film_shift.astype(jnp.float32)
                  if film_shift is not None else None)
            return fused_groupnorm_act(x, scale, bias, num_groups=g,
                                       eps=self.eps, film_scale=fs,
                                       film_shift=fh, act=act, quant=quant)
        orig = x.dtype
        shape = x.shape[:-1] + (g, c // g)
        axes = tuple(range(1, x.ndim - 1)) + (x.ndim,)
        # fp32 math + cast back (see models.layers.GroupNorm for the
        # measured rationale)
        xg32 = x.reshape(shape).astype(jnp.float32)
        mean = xg32.mean(axis=axes, keepdims=True)
        var = xg32.var(axis=axes, keepdims=True)
        xn = (xg32 - mean) * jax.lax.rsqrt(var + self.eps)
        return (xn.reshape(x.shape) * scale + bias).astype(orig)


def _fir_filter(resample_filter: Sequence[float]) -> np.ndarray:
    f = np.asarray(resample_filter, np.float32)
    f2 = np.outer(f, f) / (f.sum() ** 2)
    return f2


def fir_downsample(x: jnp.ndarray, resample_filter: Sequence[float]) -> jnp.ndarray:
    """Depthwise stride-2 conv with the FIR filter (reference Conv2d down path)."""
    c = x.shape[-1]
    f2 = _fir_filter(resample_filter)
    k = f2.shape[0]
    pad = (k - 1) // 2
    w = jnp.asarray(f2, x.dtype)[:, :, None, None]          # (k,k,1,1)
    w = jnp.tile(w, (1, 1, 1, c))                            # HWIO depthwise
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(2, 2), padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)


def _depthwise_transposed_conv(x: jnp.ndarray, f2: np.ndarray, torch_pad: int
                               ) -> jnp.ndarray:
    """torch conv_transpose2d(x, w, stride=2, padding=p, groups=C) as a
    fractionally-strided depthwise conv (lhs_dilation=2). The FIR filters are
    symmetric, so the transpose's kernel flip is a no-op."""
    c = x.shape[-1]
    k = f2.shape[0]
    w = jnp.asarray(f2, x.dtype)[:, :, None, None]
    w = jnp.tile(w, (1, 1, 1, c))
    pad = k - 1 - torch_pad
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=[(pad, pad), (pad, pad)],
        lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)


def fir_upsample(x: jnp.ndarray, resample_filter: Sequence[float]) -> jnp.ndarray:
    """Depthwise stride-2 transposed conv with 4x FIR filter (reference up path:
    conv_transpose2d(f*4, groups=C, stride=2, padding=f_pad))."""
    f2 = _fir_filter(resample_filter) * 4.0
    f_pad = (f2.shape[0] - 1) // 2
    return _depthwise_transposed_conv(x, f2, f_pad)


class EDMConv(nn.Module):
    """Conv2d with optional FIR up/downsampling (reference :51-103).

    kernel=0 means resample-only (used for aux skips). fused_resample composes
    resample+conv with adjusted paddings (NCSN++ residual encoder)."""
    out_channels: int
    kernel: int = 3
    use_bias: bool = True
    up: bool = False
    down: bool = False
    resample_filter: Tuple[float, ...] = (1, 1)
    fused_resample: bool = False
    dtype: jnp.dtype = jnp.float32
    quant: Optional[str] = None  # W8A8 backend for the plain conv path

    @nn.compact
    def __call__(self, x):
        k = self.kernel
        w_pad = k // 2 if k else 0
        f = _fir_filter(self.resample_filter)
        f_pad = (f.shape[0] - 1) // 2

        def conv(h, kernel_param, pad):
            return jax.lax.conv_general_dilated(
                h, kernel_param.astype(h.dtype), window_strides=(1, 1),
                padding=[(pad, pad), (pad, pad)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        cin = (x[0] if isinstance(x, tuple) else x).shape[-1]
        if k:
            kern = self.param("kernel",
                              nn.initializers.variance_scaling(1.0, "fan_in", "uniform"),
                              (k, k, cin, self.out_channels), jnp.float32)
        if self.fused_resample and self.up and k:
            x = _depthwise_transposed_conv(x, _fir_filter(self.resample_filter) * 4.0,
                                           max(f_pad - w_pad, 0))
            x = conv(x, kern, max(w_pad - f_pad, 0))
        elif self.fused_resample and self.down and k:
            x = conv(x, kern, w_pad + f_pad)
            c = x.shape[-1]
            f2 = jnp.asarray(_fir_filter(self.resample_filter), x.dtype)
            w = jnp.tile(f2[:, :, None, None], (1, 1, 1, c))
            x = jax.lax.conv_general_dilated(
                x, w, window_strides=(2, 2), padding=[(0, 0), (0, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
        else:
            if self.up:
                x = fir_upsample(x, self.resample_filter)
            if self.down:
                x = fir_downsample(x, self.resample_filter)
            if k and self.quant and not (self.up or self.down):
                # W8A8 path for the stride-1 hot convs (bias added below,
                # outside the dequant epilogue, to keep the two paths'
                # param layout and math identical)
                from ..ops.quant import routed_conv
                x = routed_conv(x, kern, None, (1, 1),
                                [(w_pad, w_pad), (w_pad, w_pad)],
                                self.quant, self.dtype)
            elif k:
                x = conv(x, kern, w_pad)
        if k and self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channels,),
                           jnp.float32)
            x = x + b.astype(x.dtype)
        return x


def edm_attention(x: jnp.ndarray, qkv_out: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """Attention core with the reference's per-head (ch, 3) channel
    interleaving (edm_networks.py:196-200): channel index = h*3ch + c*3 + {q,k,v}."""
    b, hh, ww, c3 = qkv_out.shape
    c = c3 // 3
    ch = c // num_heads
    t = hh * ww
    qkv = qkv_out.reshape(b, t, num_heads, ch, 3)
    q, k, v = qkv[..., 0], qkv[..., 1], qkv[..., 2]      # (B,T,H,ch)
    q = q.transpose(0, 2, 1, 3)
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhqc,bhkc->bhqk", q, k / math.sqrt(ch),
                        preferred_element_type=jnp.float32)
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
    a = jnp.einsum("bhqk,bhkc->bhqc", w, v)
    return a.transpose(0, 2, 1, 3).reshape(b, hh, ww, c)


class EDMUNetBlock(nn.Module):
    """Unified UNet block (reference :148-205). with_emb=False gives
    PureUNetBlock (:912-955)."""
    out_channels: int
    up: bool = False
    down: bool = False
    attention: bool = False
    num_heads: Optional[int] = None
    channels_per_head: int = 64
    dropout: float = 0.0
    skip_scale: float = 1.0
    eps: float = 1e-5
    resample_filter: Tuple[float, ...] = (1, 1)
    resample_proj: bool = False
    adaptive_scale: bool = True
    with_emb: bool = True
    dtype: jnp.dtype = jnp.float32
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, x, emb=None, deterministic: bool = True):
        in_ch = x.shape[-1]
        out_ch = self.out_channels
        heads = 0 if not self.attention else (
            self.num_heads if self.num_heads is not None
            else out_ch // self.channels_per_head)

        from ..ops.quant import resolve_backend

        # fused GroupNorm+FiLM+SiLU(+int8) epilogues (EDMGroupNorm /
        # ops/groupnorm_pallas.py): quantize at the norm only when the
        # consumer EDMConv will actually run int8 (stride-1, no resample —
        # EDMConv's own routing condition) and nothing sits between
        def _can_quant(h_res):
            return (self.quant is not None
                    and resolve_backend(self.quant, h_res, 3, 3, (1, 1))
                    is not None)

        orig = x
        q0 = _can_quant(x.shape[1]) and not (self.up or self.down)
        h = EDMConv(out_ch, 3, up=self.up, down=self.down,
                    resample_filter=self.resample_filter, dtype=self.dtype,
                    quant=self.quant, name="conv0")(
            EDMGroupNorm(eps=self.eps, name="norm0")(x, act="silu", quant=q0))

        # dropout between norm1's SiLU and conv1 must see bf16 (sampling
        # runs deterministic, so the quantized path is unaffected)
        q1 = _can_quant(h.shape[1]) and (self.dropout == 0.0 or deterministic)
        if self.with_emb:
            par = nn.Dense(out_ch * (2 if self.adaptive_scale else 1),
                           dtype=self.dtype, name="affine")(emb)
            if self.adaptive_scale:
                # reference :186: silu(shift + norm(h) * (scale + 1)) — the
                # fused FiLM formula y*(1+scale)+shift exactly
                scale, shift = jnp.split(par, 2, axis=-1)
                h = EDMGroupNorm(eps=self.eps, name="norm1")(
                    h, film_scale=scale, film_shift=shift, act="silu",
                    quant=q1)
            else:
                h = EDMGroupNorm(eps=self.eps, name="norm1")(
                    h + par[:, None, None, :], act="silu", quant=q1)
        else:
            h = EDMGroupNorm(eps=self.eps, name="norm1")(h, act="silu",
                                                         quant=q1)

        if not isinstance(h, tuple):
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = EDMConv(out_ch, 3, dtype=self.dtype, quant=self.quant,
                    name="conv1")(h)

        if out_ch != in_ch or self.up or self.down:
            k = 1 if (self.resample_proj or out_ch != in_ch) else 0
            orig = EDMConv(out_ch, k, up=self.up, down=self.down,
                           resample_filter=self.resample_filter, dtype=self.dtype,
                           name="skip")(orig)
        x = (h + orig) * self.skip_scale

        if heads:
            hn = EDMGroupNorm(eps=self.eps, name="norm2")(x)
            qkv = EDMConv(out_ch * 3, 1, dtype=self.dtype, name="qkv")(hn)
            a = edm_attention(x, qkv, heads)
            x = (EDMConv(out_ch, 1, dtype=self.dtype, name="proj")(a) + x) * self.skip_scale
        return x


def positional_embedding(x: jnp.ndarray, num_channels: int,
                         max_positions: float = 10000.0, endpoint: bool = True
                         ) -> jnp.ndarray:
    """PositionalEmbedding followed by SongUNet's sin/cos swap => [sin, cos]."""
    half = num_channels // 2
    freqs = jnp.arange(half, dtype=jnp.float32) / (half - (1 if endpoint else 0))
    freqs = (1.0 / max_positions) ** freqs
    args = x.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


@dataclass(frozen=True)
class SongUNetConfig:
    """Mirrors create_edm_sigma_eps_model (reference src/script_util.py:222-270)."""
    img_resolution: int = 32
    in_channels: int = 3
    out_channels: int = 3
    label_dim: int = 0
    augment_dim: int = 0
    model_channels: int = 128
    channel_mult: Tuple[int, ...] = (1, 2, 2, 2)
    channel_mult_emb: int = 4
    num_blocks: int = 4
    attn_resolutions: Tuple[int, ...] = (16,)
    dropout: float = 0.10
    label_dropout: float = 0.0
    embedding_type: str = "positional"   # 'positional' | 'fourier'
    channel_mult_noise: int = 1
    encoder_type: str = "standard"       # 'standard' | 'skip' | 'residual'
    decoder_type: str = "standard"       # 'standard' | 'skip'
    resample_filter: Tuple[float, ...] = (1, 1)
    quant_backend: Optional[str] = None  # W8A8 backend for stride-1 3x3 convs

    @property
    def feat_shape(self) -> Tuple[int, int, int]:
        d = int(self.img_resolution * 0.5 ** (len(self.channel_mult) - 1))
        c = int(self.model_channels * self.channel_mult[-1])
        return (d, d, c)


class SongUNet(nn.Module):
    config: SongUNetConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        emb_ch = cfg.model_channels * cfg.channel_mult_emb
        noise_ch = cfg.model_channels * cfg.channel_mult_noise
        self._emb_ch = emb_ch
        self._noise_ch = noise_ch
        bk = dict(num_heads=1, dropout=cfg.dropout, skip_scale=math.sqrt(0.5),
                  eps=1e-6, resample_filter=cfg.resample_filter, resample_proj=True,
                  adaptive_scale=False, dtype=self.dtype, quant=cfg.quant_backend)

        if cfg.embedding_type == "fourier":
            self.fourier_freqs = self.param(
                "map_noise_freqs", nn.initializers.normal(16.0), (noise_ch // 2,),
                jnp.float32)
        if cfg.label_dim:
            self.map_label = nn.Dense(noise_ch, dtype=self.dtype, name="map_label")
        if cfg.augment_dim:
            self.map_augment = nn.Dense(noise_ch, use_bias=False, dtype=self.dtype,
                                        name="map_augment")
        self.map_layer0 = nn.Dense(emb_ch, dtype=self.dtype, name="map_layer0")
        self.map_layer1 = nn.Dense(emb_ch, dtype=self.dtype, name="map_layer1")

        # Encoder — ordered (name, kind, module); kind in
        # {conv, block, aux_down, aux_skip, aux_residual}
        enc = []
        cout = cfg.in_channels
        caux = cfg.in_channels
        skip_chans = []
        for level, mult in enumerate(cfg.channel_mult):
            res = cfg.img_resolution >> level
            if level == 0:
                cout = cfg.model_channels
                # stem conv stays bf16, matching the ADM family's policy
                # (first/last layers are quality-sensitive, tiny FLOPs)
                enc.append((f"enc_{res}x{res}_conv", "conv",
                            EDMConv(cout, 3, dtype=self.dtype,
                                    name=f"enc_{res}x{res}_conv")))
                skip_chans.append(cout)
            else:
                enc.append((f"enc_{res}x{res}_down", "block",
                            EDMUNetBlock(out_channels=cout, down=True, **bk,
                                         name=f"enc_{res}x{res}_down")))
                skip_chans.append(cout)
                if cfg.encoder_type == "skip":
                    enc.append((f"enc_{res}x{res}_aux_down", "aux_down",
                                EDMConv(caux, 0, down=True,
                                        resample_filter=cfg.resample_filter,
                                        dtype=self.dtype,
                                        name=f"enc_{res}x{res}_aux_down")))
                    enc.append((f"enc_{res}x{res}_aux_skip", "aux_skip",
                                EDMConv(cout, 1, dtype=self.dtype,
                                        name=f"enc_{res}x{res}_aux_skip")))
                if cfg.encoder_type == "residual":
                    enc.append((f"enc_{res}x{res}_aux_residual", "aux_residual",
                                EDMConv(cout, 3, down=True,
                                        resample_filter=cfg.resample_filter,
                                        fused_resample=True, dtype=self.dtype,
                                        name=f"enc_{res}x{res}_aux_residual")))
                    caux = cout
            for idx in range(cfg.num_blocks):
                cout = cfg.model_channels * mult
                enc.append((f"enc_{res}x{res}_block{idx}", "block",
                            EDMUNetBlock(out_channels=cout,
                                         attention=(res in cfg.attn_resolutions), **bk,
                                         name=f"enc_{res}x{res}_block{idx}")))
                skip_chans.append(cout)
        self.enc_layers = enc

        # Decoder
        dec = []
        skips = list(skip_chans)
        for level, mult in reversed(list(enumerate(cfg.channel_mult))):
            res = cfg.img_resolution >> level
            if level == len(cfg.channel_mult) - 1:
                dec.append((f"dec_{res}x{res}_in0", "block", False,
                            EDMUNetBlock(out_channels=cout, attention=True, **bk,
                                         name=f"dec_{res}x{res}_in0")))
                dec.append((f"dec_{res}x{res}_in1", "block", False,
                            EDMUNetBlock(out_channels=cout, **bk,
                                         name=f"dec_{res}x{res}_in1")))
            else:
                dec.append((f"dec_{res}x{res}_up", "block", False,
                            EDMUNetBlock(out_channels=cout, up=True, **bk,
                                         name=f"dec_{res}x{res}_up")))
            for idx in range(cfg.num_blocks + 1):
                cin = cout + skips.pop()
                cout = cfg.model_channels * mult
                attn = (idx == cfg.num_blocks and res in cfg.attn_resolutions)
                dec.append((f"dec_{res}x{res}_block{idx}", "block", True,
                            EDMUNetBlock(out_channels=cout, attention=attn, **bk,
                                         name=f"dec_{res}x{res}_block{idx}")))
            if cfg.decoder_type == "skip" or level == 0:
                if cfg.decoder_type == "skip" and level < len(cfg.channel_mult) - 1:
                    dec.append((f"dec_{res}x{res}_aux_up", "aux_up",
                                False,
                                EDMConv(cfg.out_channels, 0, up=True,
                                        resample_filter=cfg.resample_filter,
                                        dtype=self.dtype,
                                        name=f"dec_{res}x{res}_aux_up")))
                dec.append((f"dec_{res}x{res}_aux_norm", "aux_norm", False,
                            EDMGroupNorm(eps=1e-6, name=f"dec_{res}x{res}_aux_norm")))
                dec.append((f"dec_{res}x{res}_aux_conv", "aux_conv", False,
                            EDMConv(cfg.out_channels, 3, dtype=self.dtype,
                                    name=f"dec_{res}x{res}_aux_conv")))
        self.dec_layers = dec

    def _mapping(self, noise_labels, class_labels, augment_labels, deterministic):
        cfg = self.config
        if cfg.embedding_type == "positional":
            emb = positional_embedding(noise_labels, self._noise_ch)
        else:
            f = 2 * jnp.pi * self.fourier_freqs
            args = noise_labels.astype(jnp.float32)[:, None] * f[None, :]
            emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
        if cfg.label_dim:
            assert class_labels is not None
            emb = emb + self.map_label(class_labels * math.sqrt(cfg.label_dim))
        if cfg.augment_dim and augment_labels is not None:
            emb = emb + self.map_augment(augment_labels)
        emb = swish(self.map_layer0(emb.astype(self.dtype)))
        return swish(self.map_layer1(emb))

    def _encode_stage(self, x, emb, deterministic):
        skips = []
        aux = x = x.astype(self.dtype)
        for name, kind, layer in self.enc_layers:
            if kind == "aux_down":
                aux = layer(aux)
            elif kind == "aux_skip":
                x = x + layer(aux)
                skips[-1] = x
            elif kind == "aux_residual":
                x = aux = (x + layer(aux)) / math.sqrt(2)
                skips[-1] = x
            elif kind == "conv":
                x = layer(x)
                skips.append(x)
            else:
                x = layer(x, emb, deterministic)
                skips.append(x)
        return x, skips

    def _decode_stage(self, x, skips, emb, deterministic):
        aux = None
        tmp = None
        for name, kind, needs_cat, layer in self.dec_layers:
            if kind == "aux_up":
                aux = layer(aux)
            elif kind == "aux_norm":
                tmp = layer(x)
            elif kind == "aux_conv":
                tmp = layer(swish(tmp))
                aux = tmp if aux is None else tmp + aux
            else:
                if needs_cat:
                    x = jnp.concatenate([x, skips.pop()], axis=-1)
                x = layer(x, emb, deterministic)
        return aux.astype(jnp.float32)

    def __call__(self, x, noise_labels, class_labels=None, augment_labels=None,
                 deterministic: bool = True):
        emb = self._mapping(noise_labels, class_labels, augment_labels, deterministic)
        x, skips = self._encode_stage(x, emb, deterministic)
        return self._decode_stage(x, skips, emb, deterministic)

    def encode(self, x, noise_labels, class_labels=None, augment_labels=None,
               deterministic: bool = True):
        """Encoder-bottom feature for the sigma head (reference :880-909)."""
        emb = self._mapping(noise_labels, class_labels, augment_labels, deterministic)
        x, _ = self._encode_stage(x, emb, deterministic)
        return x

    def forward_and_encode(self, x, noise_labels, class_labels=None,
                           augment_labels=None, deterministic: bool = True):
        """One fused pass: (output, encoder-bottom feature). The encoder runs
        once and feeds both the decoder and the sigma head — the fused
        counterpart of separate __call__ + encode calls."""
        emb = self._mapping(noise_labels, class_labels, augment_labels, deterministic)
        h, skips = self._encode_stage(x, emb, deterministic)
        return self._decode_stage(h, skips, emb, deterministic), h


@dataclass(frozen=True)
class DhariwalUNetConfig:
    """EDM's ADM reimplementation (reference edm_networks.py:406-510)."""
    img_resolution: int = 64
    in_channels: int = 3
    out_channels: int = 3
    label_dim: int = 0
    augment_dim: int = 0
    model_channels: int = 192
    channel_mult: Tuple[int, ...] = (1, 2, 3, 4)
    channel_mult_emb: int = 4
    num_blocks: int = 3
    attn_resolutions: Tuple[int, ...] = (32, 16, 8)
    dropout: float = 0.10
    label_dropout: float = 0.0

    @property
    def feat_shape(self) -> Tuple[int, int, int]:
        d = int(self.img_resolution * 0.5 ** (len(self.channel_mult) - 1))
        c = int(self.model_channels * self.channel_mult[-1])
        return (d, d, c)


class DhariwalUNet(nn.Module):
    """ADM-architecture UNet with EDM block internals: adaptive-scale FiLM,
    64-channels-per-head attention, every encoder block (incl. down) feeding a
    skip, decoder cat-on-channel-mismatch (reference :406-510).

    encode() (encoder-bottom feature) is an extension for sigma-head parity —
    the reference DhariwalUNet has no encode, only its SongUNet does.
    """
    config: DhariwalUNetConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        emb_ch = cfg.model_channels * cfg.channel_mult_emb
        bk = dict(channels_per_head=64, dropout=cfg.dropout, adaptive_scale=True,
                  eps=1e-5, skip_scale=1.0, resample_proj=False, dtype=self.dtype)

        if cfg.augment_dim:
            self.map_augment = nn.Dense(cfg.model_channels, use_bias=False,
                                        dtype=self.dtype, name="map_augment")
        self.map_layer0 = nn.Dense(emb_ch, dtype=self.dtype, name="map_layer0")
        self.map_layer1 = nn.Dense(emb_ch, dtype=self.dtype, name="map_layer1")
        if cfg.label_dim:
            self.map_label = nn.Dense(emb_ch, use_bias=False, dtype=self.dtype,
                                      name="map_label")

        enc = []
        cout = cfg.in_channels
        skips = []
        for level, mult in enumerate(cfg.channel_mult):
            res = cfg.img_resolution >> level
            if level == 0:
                cout = cfg.model_channels * mult
                # stem conv stays bf16, matching the ADM family's policy
                # (first/last layers are quality-sensitive, tiny FLOPs)
                enc.append((f"enc_{res}x{res}_conv", "conv",
                            EDMConv(cout, 3, dtype=self.dtype,
                                    name=f"enc_{res}x{res}_conv")))
            else:
                enc.append((f"enc_{res}x{res}_down", "block",
                            EDMUNetBlock(out_channels=cout, down=True, **bk,
                                         name=f"enc_{res}x{res}_down")))
            skips.append(cout)
            for idx in range(cfg.num_blocks):
                cout = cfg.model_channels * mult
                enc.append((f"enc_{res}x{res}_block{idx}", "block",
                            EDMUNetBlock(out_channels=cout,
                                         attention=(res in cfg.attn_resolutions),
                                         **bk, name=f"enc_{res}x{res}_block{idx}")))
                skips.append(cout)
        self.enc_layers = enc

        dec = []
        sk = list(skips)
        for level, mult in reversed(list(enumerate(cfg.channel_mult))):
            res = cfg.img_resolution >> level
            if level == len(cfg.channel_mult) - 1:
                dec.append((f"dec_{res}x{res}_in0", "block", False,
                            EDMUNetBlock(out_channels=cout, attention=True, **bk,
                                         name=f"dec_{res}x{res}_in0")))
                dec.append((f"dec_{res}x{res}_in1", "block", False,
                            EDMUNetBlock(out_channels=cout, **bk,
                                         name=f"dec_{res}x{res}_in1")))
            else:
                dec.append((f"dec_{res}x{res}_up", "block", False,
                            EDMUNetBlock(out_channels=cout, up=True, **bk,
                                         name=f"dec_{res}x{res}_up")))
            for idx in range(cfg.num_blocks + 1):
                cout = cfg.model_channels * mult
                dec.append((f"dec_{res}x{res}_block{idx}", "block", True,
                            EDMUNetBlock(out_channels=cout,
                                         attention=(res in cfg.attn_resolutions),
                                         **bk, name=f"dec_{res}x{res}_block{idx}")))
                sk.pop()
        self.dec_layers = dec
        self.out_norm = EDMGroupNorm(eps=1e-5, name="out_norm")
        self.out_conv = EDMConv(cfg.out_channels, 3, dtype=self.dtype,
                                name="out_conv")

    def _mapping(self, noise_labels, class_labels, augment_labels):
        cfg = self.config
        emb = positional_embedding(noise_labels, cfg.model_channels,
                                   endpoint=False)
        # Dhariwal keeps the raw [cos, sin] order (no SongUNet flip)
        half = cfg.model_channels // 2
        emb = jnp.concatenate([emb[:, half:], emb[:, :half]], axis=-1)
        if cfg.augment_dim and augment_labels is not None:
            emb = emb + self.map_augment(augment_labels)
        emb = self.map_layer1(swish(self.map_layer0(emb.astype(self.dtype))))
        if cfg.label_dim:
            assert class_labels is not None
            emb = emb + self.map_label(class_labels)
        return swish(emb)

    def _encode_stage(self, x, emb, deterministic):
        x = x.astype(self.dtype)
        skips = []
        for name, kind, layer in self.enc_layers:
            x = layer(x) if kind == "conv" else layer(x, emb, deterministic)
            skips.append(x)
        return x, skips

    def _decode_stage(self, x, skips, emb, deterministic):
        for name, kind, needs_cat, layer in self.dec_layers:
            if needs_cat:
                x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = layer(x, emb, deterministic)
        return self.out_conv(swish(self.out_norm(x))).astype(jnp.float32)

    def __call__(self, x, noise_labels, class_labels=None, augment_labels=None,
                 deterministic: bool = True):
        emb = self._mapping(noise_labels, class_labels, augment_labels)
        x, skips = self._encode_stage(x, emb, deterministic)
        return self._decode_stage(x, skips, emb, deterministic)

    def encode(self, x, noise_labels, class_labels=None, augment_labels=None,
               deterministic: bool = True):
        emb = self._mapping(noise_labels, class_labels, augment_labels)
        x, _ = self._encode_stage(x, emb, deterministic)
        return x

    def forward_and_encode(self, x, noise_labels, class_labels=None,
                           augment_labels=None, deterministic: bool = True):
        """One fused pass: (output, encoder-bottom feature)."""
        emb = self._mapping(noise_labels, class_labels, augment_labels)
        h, skips = self._encode_stage(x, emb, deterministic)
        return self._decode_stage(h, skips, emb, deterministic), h


# --------------------------------------------------------------------------
# Preconditioners (pure functions; reference :511-730)
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class EDMPrecond:
    """EDM preconditioning (reference :679-730). sigma shape (B,1,1,1)."""
    sigma_data: float = 0.5
    sigma_min: float = 0.0
    sigma_max: float = float("inf")

    def coeffs(self, sigma):
        sd = self.sigma_data
        c_skip = sd ** 2 / (sigma ** 2 + sd ** 2)
        c_out = sigma * sd / jnp.sqrt(sigma ** 2 + sd ** 2)
        c_in = 1.0 / jnp.sqrt(sd ** 2 + sigma ** 2)
        c_noise = jnp.log(sigma) / 4.0
        return c_skip, c_out, c_in, c_noise

    def __call__(self, model_fn, x, sigma, **kw):
        sigma = jnp.asarray(sigma, jnp.float32).reshape(-1, 1, 1, 1)
        c_skip, c_out, c_in, c_noise = self.coeffs(sigma)
        F_x = model_fn(c_in * x, c_noise.reshape(-1), **kw)
        return c_skip * x + c_out * F_x.astype(jnp.float32)

    def encode(self, encode_fn, x, sigma, **kw):
        sigma = jnp.asarray(sigma, jnp.float32).reshape(-1, 1, 1, 1)
        _, _, c_in, c_noise = self.coeffs(sigma)
        return encode_fn(c_in * x, c_noise.reshape(-1), **kw)

    def forward_and_encode(self, fused_fn, x, sigma, **kw):
        """Preconditioned fused pass: fused_fn returns (F_x, feat); the
        denoised output and the raw encoder feature come from one UNet run."""
        sigma = jnp.asarray(sigma, jnp.float32).reshape(-1, 1, 1, 1)
        c_skip, c_out, c_in, c_noise = self.coeffs(sigma)
        F_x, feat = fused_fn(c_in * x, c_noise.reshape(-1), **kw)
        return c_skip * x + c_out * F_x.astype(jnp.float32), feat


@dataclass(frozen=True)
class VPPrecond:
    """VP preconditioning (reference :511-565)."""
    beta_d: float = 19.9
    beta_min: float = 0.1
    M: int = 1000
    epsilon_t: float = 1e-5

    def sigma(self, t):
        t = jnp.asarray(t, jnp.float64 if False else jnp.float32)
        return jnp.sqrt(jnp.exp(0.5 * self.beta_d * t ** 2 + self.beta_min * t) - 1.0)

    def sigma_inv(self, sigma):
        return (jnp.sqrt(self.beta_min ** 2
                         + 2 * self.beta_d * jnp.log1p(sigma ** 2)) - self.beta_min) \
            / self.beta_d

    def __call__(self, model_fn, x, sigma, **kw):
        sigma = jnp.asarray(sigma, jnp.float32).reshape(-1, 1, 1, 1)
        c_out = -sigma
        c_in = 1.0 / jnp.sqrt(sigma ** 2 + 1.0)
        c_noise = (self.M - 1) * self.sigma_inv(sigma)
        F_x = model_fn(c_in * x, c_noise.reshape(-1), **kw)
        return x + c_out * F_x.astype(jnp.float32)


@dataclass(frozen=True)
class VEPrecond:
    """VE preconditioning (reference :573-620)."""
    sigma_min: float = 0.02
    sigma_max: float = 100.0

    def __call__(self, model_fn, x, sigma, **kw):
        sigma = jnp.asarray(sigma, jnp.float32).reshape(-1, 1, 1, 1)
        c_noise = jnp.log(0.5 * sigma)
        F_x = model_fn(x, c_noise.reshape(-1), **kw)
        return x + sigma * F_x.astype(jnp.float32)


@dataclass(frozen=True)
class iDDPMPrecond:
    """iDDPM preconditioning with the u-table sigma rounding (reference :628-676)."""
    C_1: float = 0.001
    C_2: float = 0.008
    M: int = 1000
    img_channels: int = 3
    u: np.ndarray = field(default=None, compare=False)

    def __post_init__(self):
        if self.u is None:
            u = np.zeros(self.M + 1, np.float64)

            def alpha_bar(j):
                return np.sin(0.5 * np.pi * j / self.M / (self.C_2 + 1)) ** 2

            for j in range(self.M, 0, -1):
                u[j - 1] = np.sqrt((u[j] ** 2 + 1)
                                   / max(alpha_bar(j - 1) / alpha_bar(j), self.C_1) - 1)
            object.__setattr__(self, "u", u.astype(np.float32))

    def round_sigma(self, sigma, return_index=False):
        u = jnp.asarray(self.u)
        idx = jnp.argmin(jnp.abs(jnp.asarray(sigma).reshape(-1, 1) - u[None, :]), axis=1)
        if return_index:
            return idx.reshape(jnp.asarray(sigma).shape)
        return u[idx].reshape(jnp.asarray(sigma).shape)

    def __call__(self, model_fn, x, sigma, **kw):
        sigma = jnp.asarray(sigma, jnp.float32).reshape(-1, 1, 1, 1)
        c_out = -sigma
        c_in = 1.0 / jnp.sqrt(sigma ** 2 + 1.0)
        c_noise = (self.M - 1 - self.round_sigma(sigma, return_index=True)
                   .astype(jnp.float32))
        F_x = model_fn(c_in * x, c_noise.reshape(-1), **kw)
        return x + c_out * F_x[..., :self.img_channels].astype(jnp.float32)


class EDMSigmaHead(nn.Module):
    """EDM sigma head (reference :979-1022): PureUNetBlocks (attention on even
    blocks), DDIM-style asymmetric-pad downsample, SiLU fc stack."""
    dim: int = 4
    channels: int = 64
    n_blocks: int = 2
    out_dim: int = 1
    dropout: float = 0.1
    resample_filter: Tuple[float, ...] = (1, 1)
    fc_dim: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, deterministic: bool = True,
                 use_running_average: bool = True):
        h = feat.astype(self.dtype)
        inp_dim = self.dim
        for i in range(self.n_blocks):
            if inp_dim % 2 != 0:
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                inp_dim += 1
            h = EDMUNetBlock(out_channels=self.channels, attention=(i % 2 == 0),
                             num_heads=1, dropout=self.dropout,
                             skip_scale=math.sqrt(0.5), eps=1e-6,
                             resample_filter=self.resample_filter,
                             resample_proj=True, adaptive_scale=False,
                             with_emb=False, dtype=self.dtype,
                             name=f"res_{i}")(h, None, deterministic)
            h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
            h = nn.Conv(self.channels, (3, 3), strides=(2, 2), padding="VALID",
                        dtype=self.dtype, name=f"down_{i}_conv")(h)
            inp_dim //= 2

        b = h.shape[0]
        h = h.reshape(b, -1)
        h = nn.Dense(self.fc_dim, dtype=self.dtype, name="fc")(h)
        h = nn.BatchNorm(use_running_average=use_running_average, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="bn")(h)
        h = swish(h)
        out = nn.Dense(self.out_dim, dtype=self.dtype, name="final")(h)
        return out.reshape(b, 1, 1, 1)
