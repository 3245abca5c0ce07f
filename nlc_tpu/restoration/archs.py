"""Restoration CNN architectures (BasicSR/NAFNet parity).

Parity targets:
  NAFNet / NAFBlock (SimpleGate + simplified channel attention)
      reference basicsr/models/archs/NAFNet_arch.py:29-165
  LayerNorm2d   arch_util.py (channel layernorm per pixel)
  NAFNetLocal / TLC test-time local conversion
      reference local_arch.py (AvgPool2d local-window replacement) — here a
      `tlc_window` flag swaps the SCA global pool for a local-window mean at
      inference, the same train-free conversion.
  NAFSSR (stereo SR with cross-attention fusion)
      reference NAFSSR_arch.py — NAFSSR class below.
  Registry-based dynamic instantiation (define_network by `type` string)
      reference basicsr/models/archs/__init__.py:50-53.

NHWC; PixelShuffle upsampling = depth-to-space.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

ARCH_REGISTRY = {}


def register_arch(cls):
    ARCH_REGISTRY[cls.__name__] = cls
    return cls


def define_network(opt: dict):
    """Instantiate an arch from an options dict with a `type` key
    (reference define_network semantics)."""
    opt = dict(opt)
    name = opt.pop("type")
    if name not in ARCH_REGISTRY:
        raise KeyError(f"unknown arch {name!r}; have {sorted(ARCH_REGISTRY)}")
    return ARCH_REGISTRY[name](**opt)


class LayerNorm2d(nn.Module):
    """Per-pixel channel layer norm (BasicSR LayerNorm2d)."""
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        mu = x.mean(axis=-1, keepdims=True)
        var = ((x - mu) ** 2).mean(axis=-1, keepdims=True)
        xn = (x - mu) * jax.lax.rsqrt(var + self.eps)
        w = self.param("scale", nn.initializers.ones, (c,))
        b = self.param("bias", nn.initializers.zeros, (c,))
        return xn * w + b


def simple_gate(x):
    a, b = jnp.split(x, 2, axis=-1)
    return a * b


def _local_window_mean(x, window: Tuple[int, int]):
    """TLC: replace the global average with a train-size local-window mean
    (reference local_arch.AvgPool2d semantics via box filtering)."""
    kh = min(window[0], x.shape[1])
    kw = min(window[1], x.shape[2])
    c = x.shape[-1]
    w = jnp.ones((kh, kw, 1, c), x.dtype) / (kh * kw)
    pad_h = (kh - 1) // 2, kh - 1 - (kh - 1) // 2
    pad_w = (kw - 1) // 2, kw - 1 - (kw - 1) // 2
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [pad_h, pad_w], dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)


def _prompt_attention(h, ft):
    """Semantic-prompt attention: cosine similarity between the feature map
    and a prompt vector, used as a spatial attention weight (the SPANet-family
    mechanism, reference SPANet_arch.py:70-76)."""
    hn = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-12)
    fn = ft / jnp.maximum(jnp.linalg.norm(ft, axis=-1, keepdims=True), 1e-12)
    w = (hn * fn).sum(axis=-1, keepdims=True)
    return h * w


class NAFBlock(nn.Module):
    """NAFNet-family block. conv_attn / ffn_attn select the attention
    mechanism — the axis along which the reference's NAF variants differ:

      conv_attn: 'sca' (NAFNet), 'ca' learned per-channel scale (CANet),
                 'none' (NOANet), 'prompt' learned-vector cosine (SSANet),
                 'pooled_prompt' SCA-pooled prompt (SCSANet),
                 'sca_prompt' SCA then learned prompt (SSSANet),
                 'sca_pooled_prompt' SCA then second-SCA prompt (SSCSANet)
      ffn_attn:  'none', 'prompt' (SPANet), 'prompt_residual' (RSPANet),
                 'clip_prompt' external CLIP text feature via an affine
                 projection (PANet — reference PABlock, PANet_arch.py:122-193;
                 the 512-d feature arrives as the ft argument)
    """
    dw_expand: int = 2
    ffn_expand: int = 2
    drop_out_rate: float = 0.0
    tlc_window: Optional[Tuple[int, int]] = None
    conv_attn: str = "sca"
    ffn_attn: str = "none"

    def _pool(self, h):
        if self.tlc_window is None:
            return h.mean(axis=(1, 2), keepdims=True)
        return _local_window_mean(h, self.tlc_window)

    @nn.compact
    def __call__(self, x, deterministic: bool = True, ft=None):
        c = x.shape[-1]
        dw = c * self.dw_expand

        h = LayerNorm2d(name="norm1")(x)
        h = nn.Conv(dw, (1, 1), name="conv1")(h)
        h = nn.Conv(dw, (3, 3), padding=1, feature_group_count=dw, name="conv2")(h)
        h = simple_gate(h)
        if self.conv_attn in ("sca", "sca_prompt", "sca_pooled_prompt"):
            att = nn.Conv(dw // 2, (1, 1), name="sca_conv")(self._pool(h))
            h = h * att
        if self.conv_attn == "ca":
            ca = self.param("ca", nn.initializers.ones, (1, 1, 1, dw // 2))
            h = h * ca
        if self.conv_attn in ("prompt", "sca_prompt"):
            ft = self.param("ft", nn.initializers.ones, (1, dw // 2))
            h = _prompt_attention(h, ft.reshape(1, 1, 1, -1))
        if self.conv_attn in ("pooled_prompt", "sca_pooled_prompt"):
            name = "sca2_conv" if self.conv_attn == "sca_pooled_prompt" else "sca_conv"
            ft = nn.Conv(dw // 2, (1, 1), name=name)(self._pool(h))
            h = _prompt_attention(h, ft)
        h = nn.Conv(c, (1, 1), name="conv3")(h)
        h = nn.Dropout(self.drop_out_rate, deterministic=deterministic)(h)
        beta = self.param("beta", nn.initializers.zeros, (1, 1, 1, c))
        y = x + h * beta

        f = LayerNorm2d(name="norm2")(y)
        f = nn.Conv(self.ffn_expand * c, (1, 1), name="conv4")(f)
        f = simple_gate(f)
        if self.ffn_attn in ("prompt", "prompt_residual"):
            pft = self.param("ffn_ft", nn.initializers.ones,
                             (1, self.ffn_expand * c // 2))
            attn = _prompt_attention(f, pft.reshape(1, 1, 1, -1))
            f = attn + f if self.ffn_attn == "prompt_residual" else attn
        if self.ffn_attn == "clip_prompt":
            # PANet: project the frozen-CLIP text feature into the gated FFN
            # channel space and use its cosine weight (PANet_arch.py:182-187)
            assert ft is not None, "clip_prompt block needs a text feature"
            ftc = nn.Dense(self.ffn_expand * c // 2, name="affine")(ft)
            f = _prompt_attention(f, ftc.reshape(1, 1, 1, -1))
        f = nn.Conv(c, (1, 1), name="conv5")(f)
        f = nn.Dropout(self.drop_out_rate, deterministic=deterministic)(f)
        gamma = self.param("gamma", nn.initializers.zeros, (1, 1, 1, c))
        return y + f * gamma


def depth_to_space(x, factor: int = 2):
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, factor, factor, c // factor ** 2)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h * factor, w * factor, c // factor ** 2)


@register_arch
class NAFNet(nn.Module):
    img_channel: int = 3
    out_channel: Optional[int] = None   # defaults to img_channel; video models
                                        # consume an N-frame channel stack and
                                        # emit the center frame
    width: int = 16
    middle_blk_num: int = 1
    enc_blk_nums: Sequence[int] = ()
    dec_blk_nums: Sequence[int] = ()
    drop_out_rate: float = 0.0
    tlc_window: Optional[Tuple[int, int]] = None   # set at test time for TLC
    conv_attn: str = "sca"
    ffn_attn: str = "none"
    spa_enc_levels: Tuple[int, ...] = ()   # encoder levels using SPA blocks
                                           # (NSPANet uses level 3)
    # PANet: per-block prompts through a frozen CLIP text tower
    # (PANet_arch.py:66-114 PromptLearner + :243-247). n_ctx learned context
    # tokens per prompt; prefix/suffix are the frozen SOT / ".(EOT)pad"
    # embeddings taken from the CLIP checkpoint at conversion time.
    clip_prompt: bool = False
    n_ctx: int = 3
    clip_width: int = 512
    clip_layers: int = 12
    clip_heads: int = 8
    clip_embed_dim: int = 512
    clip_ctx_len: int = 77
    # rematerialize each block in the backward pass (jax.checkpoint): deep
    # configs (e.g. NAFNet-width32 SIDD, 36 blocks) train at 256² within a
    # 16 GB chip's HBM at the cost of one extra forward per block
    remat: bool = False

    @property
    def frozen_prefixes(self) -> Tuple[str, ...]:
        """Param-path prefixes the trainer must not update (the reference
        freezes the CLIP tower and prompt prefix/suffix embeddings,
        PANet_arch.py:245 requires_grad_(False))."""
        if self.clip_prompt:
            return ("text_encoder", "token_prefix", "token_suffix")
        return ()

    def _block(self, name, enc_level=None):
        # deterministic (argnum 2, counting self) is a Python bool -> static
        cls = nn.remat(NAFBlock, static_argnums=(2,)) if self.remat \
            else NAFBlock
        if enc_level is not None and enc_level in self.spa_enc_levels:
            return cls(drop_out_rate=self.drop_out_rate,
                       tlc_window=self.tlc_window, conv_attn="sca",
                       ffn_attn="prompt", name=name)
        return cls(drop_out_rate=self.drop_out_rate,
                   tlc_window=self.tlc_window, conv_attn=self.conv_attn,
                   ffn_attn=self.ffn_attn, name=name)

    def _text_features(self):
        """One frozen-CLIP pass over all learned prompts -> (ft_num, 512),
        unit-normalized (PANet_arch.py forward :257-261)."""
        from .clip_text import CLIPTextEncoder
        ft_num = self.middle_blk_num + sum(self.enc_blk_nums) + \
            sum(self.dec_blk_nums)
        ctx = self.param("ctx", nn.initializers.normal(0.02),
                         (ft_num, self.n_ctx, self.clip_width))
        prefix = self.param("token_prefix", nn.initializers.normal(0.02),
                            (ft_num, 1, self.clip_width))
        suffix = self.param(
            "token_suffix", nn.initializers.normal(0.02),
            (ft_num, self.clip_ctx_len - 1 - self.n_ctx, self.clip_width))
        prompts = jnp.concatenate([prefix, ctx, suffix], axis=1)
        # fixed "X X X." template: EOT sits right after [SOT][ctx...][.]
        tf = CLIPTextEncoder(self.clip_width, self.clip_layers, self.clip_heads,
                             self.clip_ctx_len, self.clip_embed_dim,
                             name="text_encoder")(prompts, eot_idx=self.n_ctx + 2)
        return tf / jnp.maximum(jnp.linalg.norm(tf, axis=-1, keepdims=True),
                                1e-12)

    @nn.compact
    def __call__(self, inp, deterministic: bool = True):
        b, h0, w0, _ = inp.shape
        pad = 2 ** len(self.enc_blk_nums)
        ph = (pad - h0 % pad) % pad
        pw = (pad - w0 % pad) % pad
        x_in = jnp.pad(inp, ((0, 0), (0, ph), (0, pw), (0, 0)))

        tfs = self._text_features() if self.clip_prompt else None
        ctr = 0

        def blk(x, name, enc_level=None):
            nonlocal ctr
            ft = tfs[ctr] if tfs is not None else None
            ctr += 1
            return self._block(name, enc_level=enc_level)(x, deterministic,
                                                          ft=ft)

        x = nn.Conv(self.width, (3, 3), padding=1, name="intro")(x_in)
        chan = self.width
        skips = []
        for i, num in enumerate(self.enc_blk_nums):
            for j in range(num):
                x = blk(x, f"enc_{i}_{j}", enc_level=i)
            skips.append(x)
            x = nn.Conv(2 * chan, (2, 2), strides=(2, 2), name=f"down_{i}")(x)
            chan *= 2
        for j in range(self.middle_blk_num):
            x = blk(x, f"middle_{j}")
        for i, num in enumerate(self.dec_blk_nums):
            x = nn.Conv(chan * 2, (1, 1), use_bias=False, name=f"up_{i}")(x)
            x = depth_to_space(x, 2)
            chan //= 2
            x = x + skips[-(i + 1)]
            for j in range(num):
                x = blk(x, f"dec_{i}_{j}")
        out_ch = self.out_channel or self.img_channel
        x = nn.Conv(out_ch, (3, 3), padding=1, name="ending")(x)
        if out_ch == x_in.shape[-1]:
            x = x + x_in
        else:
            mid = (x_in.shape[-1] - out_ch) // 2
            x = x + x_in[..., mid:mid + out_ch]
        return x[:, :h0, :w0, :]


def _variant(name: str, **block_kw):
    """Register a NAFNet skeleton with a different block mechanism
    (reference CANet/NOANet/SPANet/SSANet/SCSANet/SSSANet/SSCSANet/RSPANet/
    NSPANet *_arch.py files — identical nets, different block attention)."""

    def ctor(**kw):
        return NAFNet(**{**block_kw, **kw})

    ctor.__name__ = name
    ARCH_REGISTRY[name] = ctor
    return ctor


CANet = _variant("CANet", conv_attn="ca")
NOANet = _variant("NOANet", conv_attn="none")
SSANet = _variant("SSANet", conv_attn="prompt")
SCSANet = _variant("SCSANet", conv_attn="pooled_prompt")
SSSANet = _variant("SSSANet", conv_attn="sca_prompt")
SSCSANet = _variant("SSCSANet", conv_attn="sca_pooled_prompt")
SPANet = _variant("SPANet", conv_attn="sca", ffn_attn="prompt")
RSPANet = _variant("RSPANet", conv_attn="sca", ffn_attn="prompt_residual")
NSPANet = _variant("NSPANet", conv_attn="sca", spa_enc_levels=(3,))
PANet = _variant("PANet", conv_attn="sca", ffn_attn="clip_prompt",
                 clip_prompt=True)


def _register_local_variants():
    """<Name>Local aliases (reference NAFNetLocal/SPANetLocal/... classes):
    the TLC test-time conversion — same weights, SCA pooling over a local
    window sized 1.5x the train size (Local_Base.convert semantics,
    local_arch.py + NAFNet_arch.py:168-180). Accepts the reference's
    train_size=(N, C, H, W) option and maps it to tlc_window."""
    for base_name in ["NAFNet", "CANet", "NOANet", "SSANet", "SCSANet",
                      "SSSANet", "SSCSANet", "SPANet", "RSPANet", "NSPANet",
                      "PANet"]:
        base_ctor = ARCH_REGISTRY[base_name]

        def local_ctor(_base=base_ctor, train_size=(1, 3, 256, 256),
                       fast_imp=False, **kw):
            h, w = train_size[-2], train_size[-1]
            kw.setdefault("tlc_window", (int(h * 1.5), int(w * 1.5)))
            return _base(**kw)

        local_ctor.__name__ = base_name + "Local"
        ARCH_REGISTRY[base_name + "Local"] = local_ctor


_register_local_variants()


@register_arch
class NAFSSR(nn.Module):
    """Stereo super-resolution: shared NAFNet trunk + stereo cross-attention
    fusion (reference NAFSSR_arch.py capability). Input (B, H, W, 2*C) packs
    the left/right views channel-wise; output upscaled by `up_scale`."""
    up_scale: int = 4
    width: int = 48
    num_blks: int = 16
    img_channel: int = 3
    fusion_from: int = -1
    fusion_to: int = 1000
    drop_out_rate: float = 0.0

    @nn.compact
    def __call__(self, inp, deterministic: bool = True):
        c = self.img_channel
        left, right = inp[..., :c], inp[..., c:]
        # shared trunk: the same submodules process both views
        intro = nn.Conv(self.width, (3, 3), padding=1, name="intro")
        xl, xr = intro(left), intro(right)
        for i in range(self.num_blks):
            blk = NAFBlock(drop_out_rate=self.drop_out_rate, name=f"blk_{i}")
            xl = blk(xl, deterministic)
            xr = blk(xr, deterministic)
            if self.fusion_from <= i <= self.fusion_to:
                xl, xr = self._scam(xl, xr, i)
        up = nn.Conv(c * self.up_scale ** 2, (3, 3), padding=1, name="up_conv")
        ol = depth_to_space(up(xl), self.up_scale)
        orr = depth_to_space(up(xr), self.up_scale)
        base_l = jax.image.resize(left, (left.shape[0],
                                         left.shape[1] * self.up_scale,
                                         left.shape[2] * self.up_scale, c),
                                  "bilinear")
        base_r = jax.image.resize(right, base_l.shape, "bilinear")
        return jnp.concatenate([ol + base_l, orr + base_r], axis=-1)

    def _scam(self, xl, xr, i):
        """Stereo cross-attention module: attend along the epipolar (width)
        axis between views."""
        cdim = xl.shape[-1]
        ql = LayerNorm2d(name=f"scam_{i}_nl")(xl) @ \
            self.param(f"scam_{i}_wl", nn.initializers.lecun_normal(), (cdim, cdim))
        qr = LayerNorm2d(name=f"scam_{i}_nr")(xr) @ \
            self.param(f"scam_{i}_wr", nn.initializers.lecun_normal(), (cdim, cdim))
        vl = xl @ self.param(f"scam_{i}_vl", nn.initializers.lecun_normal(),
                             (cdim, cdim))
        vr = xr @ self.param(f"scam_{i}_vr", nn.initializers.lecun_normal(),
                             (cdim, cdim))
        att = jnp.einsum("bhwc,bhvc->bhwv", ql, qr) * (cdim ** -0.5)
        fl = jnp.einsum("bhwv,bhvc->bhwc", jax.nn.softmax(att, axis=-1), vr)
        fr = jnp.einsum("bhwv,bhwc->bhvc", jax.nn.softmax(att, axis=-2), vl)
        bl = self.param(f"scam_{i}_bl", nn.initializers.zeros, (1, 1, 1, cdim))
        br = self.param(f"scam_{i}_br", nn.initializers.zeros, (1, 1, 1, cdim))
        return xl + fl * bl, xr + fr * br
