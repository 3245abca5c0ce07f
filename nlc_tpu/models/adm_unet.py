"""ADM / guided-diffusion epsilon-UNet — the CIFAR-10 / ImageNet / LSUN backbone.

Capability parity with reference src/unet_adm.py:396-731 (`UNetModel`) and its
SigmaModel (:1029-1083): scale-shift (FiLM) conditioning, multi-head attention
with the fp16-stable 1/sqrt(sqrt(ch)) scaling (:381-385), resblock up/down
sampling, class conditioning, learned-variance 2C output, and the `encode`
feature tap (feat_layer 0: after input blocks; 1: after middle block, :668-693).

TPU-first: NHWC activations; attention runs on (B, heads, T, ch) with fp32
softmax and MXU einsums; qkv/proj are Dense layers over the token axis
(the reference uses 1x1 conv1d — same math, better layout); norms fp32 inside
an optional bf16 compute dtype; optional jax.checkpoint rematerialization per
block replaces the reference's CheckpointFunction (src/nn_util.py:124-170).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import GroupNorm, adm_timestep_embedding, attention, swish
from ..ops.quant import make_conv


_make_conv = make_conv  # single dispatch point lives in ops/quant.py


class ADMResBlock(nn.Module):
    """ResBlock with scale-shift norm and optional internal up/downsampling
    (reference unet_adm.py:143-256)."""
    out_channels: Optional[int] = None
    dropout: float = 0.0
    use_conv_skip: bool = False
    use_scale_shift_norm: bool = False
    up: bool = False
    down: bool = False
    dtype: jnp.dtype = jnp.float32
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, x, emb, deterministic: bool = True):
        from ..ops.quant import resolve_backend
        in_ch = x.shape[-1]
        out_ch = self.out_channels or in_ch

        # fused GroupNorm+SiLU(+int8) epilogues (layers.GroupNorm /
        # ops/groupnorm_pallas.py): quantize at the norm only when the
        # consumer conv will actually run int8 (resolve_backend keeps the
        # two decisions in sync) and nothing sits between norm and conv
        def _can_quant(h_res):
            return (self.quant is not None
                    and resolve_backend(self.quant, h_res, 3, 3, (1, 1))
                    is not None)

        q_in = _can_quant(x.shape[1]) and not (self.up or self.down)
        h = GroupNorm(eps=1e-5, name="in_norm")(x, act="silu", quant=q_in)
        if self.up:
            h = _nearest_up(h)
            x = _nearest_up(x)
        elif self.down:
            h = nn.avg_pool(h, (2, 2), strides=(2, 2))
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        h = _make_conv(self.quant, out_ch, 3, padding=1, dtype=self.dtype,
                       name="in_conv")(h)

        e = nn.Dense(2 * out_ch if self.use_scale_shift_norm else out_ch,
                     dtype=self.dtype, name="emb_proj")(swish(emb))
        # dropout between SiLU and out_conv must see bf16 (sampling runs
        # deterministic, so the quantized path is unaffected)
        q_out = _can_quant(h.shape[1]) and (self.dropout == 0.0
                                            or deterministic)
        if self.use_scale_shift_norm:
            scale, shift = jnp.split(e, 2, axis=-1)
            h = GroupNorm(eps=1e-5, name="out_norm")(
                h, film_scale=scale, film_shift=shift, act="silu",
                quant=q_out)
        else:
            h = GroupNorm(eps=1e-5, name="out_norm")(
                h + e[:, None, None, :], act="silu", quant=q_out)
        if not isinstance(h, tuple):
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = _make_conv(self.quant, out_ch, 3, padding=1, dtype=self.dtype,
                       kernel_init=nn.initializers.zeros_init(),
                       name="out_conv")(h)

        if out_ch != in_ch:
            if self.use_conv_skip:
                x = _make_conv(self.quant, out_ch, 3, padding=1,
                               dtype=self.dtype, name="skip")(x)
            else:
                x = _make_conv(self.quant, out_ch, 1, dtype=self.dtype,
                               name="skip")(x)
        return x + h


def _nearest_up(x):
    b, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class ADMAttention(nn.Module):
    """Multi-head spatial attention (reference unet_adm.py:259-393).

    legacy order (use_new_attention_order=False): the fused qkv projection
    produces per-head contiguous [q_h | k_h | v_h] channel blocks; new order
    produces [Q | K | V]. The distinction only matters for checkpoint layout —
    both are reproduced so converted torch weights land correctly.
    """
    num_heads: int = 1
    num_head_channels: int = -1
    use_new_attention_order: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        if self.num_head_channels == -1:
            heads = self.num_heads
        else:
            assert c % self.num_head_channels == 0
            heads = c // self.num_head_channels
        ch = c // heads
        t = hh * ww

        hn = GroupNorm(eps=1e-5, name="norm")(x).reshape(b, t, c)
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(hn)  # (B,T,3C)
        if self.use_new_attention_order:
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(b, t, heads, ch).transpose(0, 2, 1, 3)
            k = k.reshape(b, t, heads, ch).transpose(0, 2, 1, 3)
            v = v.reshape(b, t, heads, ch).transpose(0, 2, 1, 3)
        else:
            qkv = qkv.reshape(b, t, heads, 3 * ch).transpose(0, 2, 1, 3)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        # reference scales q and k each by ch^-1/4 before the matmul
        o = attention(q, k, v, scale=float(ch) ** -0.5)
        o = o.transpose(0, 2, 1, 3).reshape(b, t, c)
        o = nn.Dense(c, dtype=self.dtype,
                     kernel_init=nn.initializers.zeros_init(), name="proj_out")(o)
        return x + o.reshape(b, hh, ww, c)


class ADMUpsample(nn.Module):
    use_conv: bool = True
    dtype: jnp.dtype = jnp.float32
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        x = _nearest_up(x)
        if self.use_conv:
            x = _make_conv(self.quant, x.shape[-1], 3, padding=1,
                           dtype=self.dtype, name="conv")(x)
        return x


class ADMDownsample(nn.Module):
    """Stride-2 3x3 conv with symmetric pad 1 (torch padding=1), or avg pool."""
    use_conv: bool = True
    dtype: jnp.dtype = jnp.float32
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        if self.use_conv:
            return _make_conv(self.quant, x.shape[-1], 3, strides=(2, 2),
                              padding=1, dtype=self.dtype, name="conv")(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


@dataclass(frozen=True)
class ADMUNetConfig:
    """Mirrors create_model / create_sigma_eps_model flags
    (reference src/script_util.py:79-206)."""
    image_size: int = 64
    in_channels: int = 3
    model_channels: int = 128
    out_channels: int = 3            # 6 when learn_sigma
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = (8, 16)   # downsample RATES (ds)
    dropout: float = 0.0
    channel_mult: Tuple[float, ...] = (1, 2, 3, 4)
    conv_resample: bool = True
    num_classes: Optional[int] = None
    num_heads: int = 4
    num_head_channels: int = -1
    num_heads_upsample: int = -1
    use_scale_shift_norm: bool = True
    resblock_updown: bool = False
    use_new_attention_order: bool = False
    feat_layer: int = 1
    # int8 W8A8 conv backend ('taps' | 'conv', ops/quant.py) for the interior
    # convs; the stem conv and the output conv stay in the compute dtype
    # (standard first/last-layer exemption). None = full-precision path.
    quant_backend: Optional[str] = None
    # storage dtype for the encoder skip stack (the hs list live across the
    # whole encoder->decoder span — the largest persistent activation set at
    # 256^2). 'float8_e4m3fn' halves that footprint vs bf16: an HBM-capacity
    # relief lever for large batch (docs/BENCHMARKS.md "The B=16 question").
    # None = keep the compute dtype.
    skip_store_dtype: Optional[str] = None

    @property
    def learn_epsvar(self) -> bool:
        return self.out_channels == 2 * self.in_channels

    @property
    def feat_shape(self) -> Tuple[int, int, int]:
        d = int(self.image_size * 0.5 ** (len(self.channel_mult) - 1))
        c = int(self.model_channels * self.channel_mult[-1])
        return (d, d, c)


class ADMUNet(nn.Module):
    config: ADMUNetConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        ted = cfg.model_channels * 4
        self.time_embed_0 = nn.Dense(ted, dtype=self.dtype, name="time_embed_0")
        self.time_embed_2 = nn.Dense(ted, dtype=self.dtype, name="time_embed_2")
        if cfg.num_classes is not None:
            self.label_emb = nn.Embed(cfg.num_classes, ted, name="label_emb")

        heads_up = cfg.num_heads if cfg.num_heads_upsample == -1 else cfg.num_heads_upsample

        def res(idx, **kw):
            return ADMResBlock(dropout=cfg.dropout,
                               use_scale_shift_norm=cfg.use_scale_shift_norm,
                               dtype=self.dtype, quant=cfg.quant_backend,
                               name=idx, **kw)

        def attn(idx, heads):
            return ADMAttention(num_heads=heads, num_head_channels=cfg.num_head_channels,
                                use_new_attention_order=cfg.use_new_attention_order,
                                dtype=self.dtype, name=idx)

        ch = input_ch = int(cfg.channel_mult[0] * cfg.model_channels)
        input_blocks = [[("conv", nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                                          name="input_blocks_0_0"))]]
        input_chans = [ch]
        ds = 1
        bi = 1
        for level, mult in enumerate(cfg.channel_mult):
            for _ in range(cfg.num_res_blocks):
                layers = [("res", res(f"input_blocks_{bi}_0",
                                      out_channels=int(mult * cfg.model_channels)))]
                ch = int(mult * cfg.model_channels)
                if ds in cfg.attention_resolutions:
                    layers.append(("attn", attn(f"input_blocks_{bi}_1", cfg.num_heads)))
                input_blocks.append(layers)
                input_chans.append(ch)
                bi += 1
            if level != len(cfg.channel_mult) - 1:
                if cfg.resblock_updown:
                    layers = [("res", res(f"input_blocks_{bi}_0", out_channels=ch,
                                          down=True))]
                else:
                    layers = [("down", ADMDownsample(cfg.conv_resample, dtype=self.dtype,
                                                     quant=cfg.quant_backend,
                                                     name=f"input_blocks_{bi}_0"))]
                input_blocks.append(layers)
                input_chans.append(ch)
                ds *= 2
                bi += 1
        self.input_block_layers = input_blocks
        self._input_chans = tuple(input_chans)

        self.middle_block_0 = res("middle_block_0")
        self.middle_block_1 = attn("middle_block_1", cfg.num_heads)
        self.middle_block_2 = res("middle_block_2")

        output_blocks = []
        chans = list(input_chans)
        bo = 0
        for level, mult in list(enumerate(cfg.channel_mult))[::-1]:
            for i in range(cfg.num_res_blocks + 1):
                chans.pop()
                layers = [("res", res(f"output_blocks_{bo}_0",
                                      out_channels=int(cfg.model_channels * mult)))]
                ch = int(cfg.model_channels * mult)
                li = 1
                if ds in cfg.attention_resolutions:
                    layers.append(("attn", attn(f"output_blocks_{bo}_{li}", heads_up)))
                    li += 1
                if level and i == cfg.num_res_blocks:
                    if cfg.resblock_updown:
                        layers.append(("res", res(f"output_blocks_{bo}_{li}",
                                                  out_channels=ch, up=True)))
                    else:
                        layers.append(("up", ADMUpsample(cfg.conv_resample,
                                                         dtype=self.dtype,
                                                         quant=cfg.quant_backend,
                                                         name=f"output_blocks_{bo}_{li}")))
                    ds //= 2
                output_blocks.append(layers)
                bo += 1
        self.output_block_layers = output_blocks

        self.out_norm = GroupNorm(eps=1e-5, name="out_norm")
        self.out_conv = nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype,
                                kernel_init=nn.initializers.zeros_init(),
                                name="out_conv")

    def _emb(self, t, y):
        cfg = self.config
        emb = adm_timestep_embedding(t, cfg.model_channels)
        emb = self.time_embed_2(swish(self.time_embed_0(emb)))
        if cfg.num_classes is not None:
            assert y is not None, "class-conditional model needs labels"
            emb = emb + self.label_emb(y)
        return emb.astype(self.dtype)

    def _run_layers(self, layers, h, emb, deterministic):
        for kind, layer in layers:
            if kind == "res":
                h = layer(h, emb, deterministic)
            else:
                h = layer(h)
        return h

    def _encode_stage(self, x, emb, deterministic):
        sd = (jnp.dtype(self.config.skip_store_dtype)
              if self.config.skip_store_dtype else None)
        h = x.astype(self.dtype)
        hs = []
        for layers in self.input_block_layers:
            h = self._run_layers(layers, h, emb, deterministic)
            hs.append(h.astype(sd) if sd is not None else h)
        return h, hs

    def _middle(self, h, emb, deterministic):
        h = self.middle_block_0(h, emb, deterministic)
        h = self.middle_block_1(h)
        return self.middle_block_2(h, emb, deterministic)

    def _decode_stage(self, h, hs, emb, deterministic):
        for layers in self.output_block_layers:
            h = jnp.concatenate([h, hs.pop().astype(h.dtype)], axis=-1)
            h = self._run_layers(layers, h, emb, deterministic)
        h = self.out_norm(h, act="silu")   # fused; out_conv stays bf16
        return self.out_conv(h).astype(jnp.float32)

    def __call__(self, x, t, y=None, deterministic: bool = True):
        emb = self._emb(t, y)
        h, hs = self._encode_stage(x, emb, deterministic)
        h = self._middle(h, emb, deterministic)
        return self._decode_stage(h, hs, emb, deterministic)

    def encode(self, x, t, y=None, deterministic: bool = True):
        emb = self._emb(t, y)
        h, _ = self._encode_stage(x, emb, deterministic)
        if self.config.feat_layer == 0:
            return h
        return self._middle(h, emb, deterministic)

    def forward_and_encode(self, x, t, y=None, deterministic: bool = True):
        emb = self._emb(t, y)
        h, hs = self._encode_stage(x, emb, deterministic)
        feat = h if self.config.feat_layer == 0 else None
        h = self._middle(h, emb, deterministic)
        if self.config.feat_layer != 0:
            feat = h
        out = self._decode_stage(h, hs, emb, deterministic)
        return out, feat


class SuperResADMUNet(nn.Module):
    """ADM UNet conditioned on a low-resolution image: the bilinear-upsampled
    low_res concatenates to the input channels (reference unet_adm.py:799-813
    SuperResModel). Build with in_channels doubled in the config."""
    config: ADMUNetConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t, low_res, y=None, deterministic: bool = True):
        b, h, w, c = x.shape
        up = jax.image.resize(low_res, (b, h, w, low_res.shape[-1]), "bilinear")
        inner = ADMUNet(self.config, dtype=self.dtype, name="unet")
        return inner(jnp.concatenate([x, up], axis=-1), t, y, deterministic)


class ADMSigmaHead(nn.Module):
    """ADM-flavored sigma head (reference unet_adm.py:1029-1083): same topology
    as the DDIM one but with ADM blocks (PureResNetBlock, qkv attention,
    symmetric-pad downsample)."""
    dim: int = 4
    channels: int = 64
    n_blocks: int = 2
    out_dim: int = 1
    dropout: float = 0.1
    num_heads: int = 1
    num_head_channels: int = -1
    use_new_attention_order: bool = False
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
            # PureResNetBlock == ADMResBlock without temb (emb_proj unused):
            h_in = GroupNorm(eps=1e-5, name=f"res_{i}_in_norm")(h)
            h_in = nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype,
                           name=f"res_{i}_in_conv")(swish(h_in))
            h_out = GroupNorm(eps=1e-5, name=f"res_{i}_out_norm")(h_in)
            h_out = nn.Dropout(self.dropout, deterministic=deterministic)(swish(h_out))
            h_out = nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype,
                            kernel_init=nn.initializers.zeros_init(),
                            name=f"res_{i}_out_conv")(h_out)
            h = h + h_out
            if i == 0:
                h = ADMAttention(num_heads=self.num_heads,
                                 num_head_channels=self.num_head_channels,
                                 use_new_attention_order=self.use_new_attention_order,
                                 dtype=self.dtype, name="attn_0")(h)
            h = nn.Conv(self.channels, (3, 3), strides=(2, 2), padding=1,
                        dtype=self.dtype, name=f"down_{i}_conv")(h)
            inp_dim //= 2

        b = h.shape[0]
        h = h.reshape(b, -1)
        h = nn.Dense(self.fc_dim, dtype=self.dtype, name="fc")(h)
        h = nn.BatchNorm(use_running_average=use_running_average, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="bn")(h)
        h = nn.gelu(h, approximate=False)
        out = nn.Dense(self.out_dim, dtype=self.dtype, name="final")(h)
        return out.reshape(b, 1, 1, 1)
