"""Model factories pairing eps backbones with sized sigma heads.

Parity with reference src/script_util.py:
  create_sigma_eps_model         :136-206 (ADM UNet + ADM SigmaModel)
  create_simple_sigma_eps_model  :209-219 (DDIM UNet + DDIM SigmaModel)
  create_edm_sigma_eps_model     :222-270 (SongUNet + EDM SigmaModel)
incl. the per-image-size channel_mult defaults (:158-170).
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from .adm_unet import ADMUNet, ADMUNetConfig, ADMSigmaHead
from .ddim_unet import DDIMUNet, DDIMUNetConfig
from .sigma_head import SigmaHead, sigma_head_for_unet
from .song_unet import SongUNet, SongUNetConfig, EDMSigmaHead

NUM_CLASSES = 1000

_CHANNEL_MULTS = {
    512: (0.5, 1, 1, 2, 2, 4, 4),
    256: (1, 1, 2, 2, 4, 4),
    128: (1, 1, 2, 3, 4),
    64: (1, 2, 3, 4),
    32: (1, 2, 2, 2),
}


def default_channel_mult(image_size: int) -> Tuple[float, ...]:
    try:
        return _CHANNEL_MULTS[image_size]
    except KeyError:
        raise ValueError(f"unsupported image size: {image_size}")


def create_sigma_eps_model(image_size: int, num_channels: int, num_res_blocks: int,
                           channel_mult: str = "", learn_sigma: bool = False,
                           class_cond: bool = False,
                           attention_resolutions: str = "16",
                           num_heads: int = 1, num_head_channels: int = -1,
                           num_heads_upsample: int = -1,
                           use_scale_shift_norm: bool = False, dropout: float = 0.0,
                           resblock_updown: bool = False,
                           use_new_attention_order: bool = False,
                           sigma_block: int = 2, sigma_dropout: float = 0.0,
                           feat_layer: int = 1, dtype=jnp.float32,
                           quant_backend=None, **_ignored):
    if channel_mult == "":
        cm = default_channel_mult(image_size)
    else:
        cm = tuple(int(c) for c in str(channel_mult).split(","))
    attn_ds = tuple(image_size // int(r)
                    for r in str(attention_resolutions).split(","))
    cfg = ADMUNetConfig(
        image_size=image_size, in_channels=3, model_channels=num_channels,
        out_channels=6 if learn_sigma else 3, num_res_blocks=num_res_blocks,
        attention_resolutions=attn_ds, dropout=dropout, channel_mult=cm,
        num_classes=NUM_CLASSES if class_cond else None, num_heads=num_heads,
        num_head_channels=num_head_channels, num_heads_upsample=num_heads_upsample,
        use_scale_shift_norm=use_scale_shift_norm, resblock_updown=resblock_updown,
        use_new_attention_order=use_new_attention_order, feat_layer=feat_layer,
        quant_backend=quant_backend)
    model = ADMUNet(cfg, dtype=dtype)
    d, _, c = cfg.feat_shape[0], cfg.feat_shape[1], cfg.feat_shape[2]
    head = ADMSigmaHead(dim=d, channels=c, n_blocks=sigma_block, out_dim=1,
                        dropout=sigma_dropout, num_heads=num_heads,
                        num_head_channels=num_head_channels,
                        use_new_attention_order=use_new_attention_order, dtype=dtype)
    return model, head, cfg


def create_simple_sigma_eps_model(config, dtype=jnp.float32, quant_backend=None):
    """config: the YAML ConfigDict (model/data/diffusion sections)."""
    m = config.model
    cfg = DDIMUNetConfig(
        ch=m.ch, out_ch=m.out_ch, ch_mult=tuple(m.ch_mult),
        num_res_blocks=m.num_res_blocks, attn_resolutions=tuple(m.attn_resolutions),
        dropout=m.dropout, in_channels=m.in_channels,
        resolution=config.data.image_size, resamp_with_conv=m.resamp_with_conv,
        feat_layer=m.get("feat_layer", 0), quant_backend=quant_backend)
    model = DDIMUNet(cfg, dtype=dtype)
    hcfg = sigma_head_for_unet(cfg.feat_shape, n_blocks=m.get("sigma_block", 2),
                               dropout=m.get("sigma_dropout", 0.0))
    head = SigmaHead(hcfg, dtype=dtype)
    return model, head, cfg


def create_classifier(image_size: int, classifier_width: int = 128,
                      classifier_depth: int = 2,
                      classifier_attention_resolutions: str = "32,16,8",
                      classifier_use_scale_shift_norm: bool = True,
                      classifier_resblock_updown: bool = True,
                      classifier_pool: str = "attention", dtype=jnp.float32,
                      **_ignored):
    """ADM noisy-image classifier (reference src/script_util.py:273-311)."""
    from .classifier import EncoderUNetModel, EncoderUNetConfig
    cm = default_channel_mult(image_size)
    attn_ds = tuple(image_size // int(r)
                    for r in classifier_attention_resolutions.split(","))
    cfg = EncoderUNetConfig(
        image_size=image_size, in_channels=3, model_channels=classifier_width,
        out_channels=1000, num_res_blocks=classifier_depth,
        attention_resolutions=attn_ds, channel_mult=cm, num_head_channels=64,
        use_scale_shift_norm=classifier_use_scale_shift_norm,
        resblock_updown=classifier_resblock_updown, pool=classifier_pool)
    return EncoderUNetModel(cfg, dtype=dtype), cfg


def create_edm_sigma_eps_model(img_resolution: int, in_channels: int = 3,
                               out_channels: int = 3, augment_dim: int = 0,
                               model_channels: int = 128,
                               channel_mult=(1, 2, 2, 2), channel_mult_emb: int = 4,
                               num_blocks: int = 4, attn_resolutions=(16,),
                               dropout: float = 0.10,
                               embedding_type: str = "positional",
                               encoder_type: str = "standard",
                               decoder_type: str = "standard",
                               resample_filter=(1, 1), sigma_block: int = 2,
                               sigma_dropout: float = 0.0, dtype=jnp.float32,
                               sigma_dtype=None, quant_backend=None, **_ignored):
    cfg = SongUNetConfig(
        img_resolution=img_resolution, in_channels=in_channels,
        out_channels=out_channels, augment_dim=augment_dim,
        model_channels=model_channels, channel_mult=tuple(channel_mult),
        channel_mult_emb=channel_mult_emb, num_blocks=num_blocks,
        attn_resolutions=tuple(attn_resolutions), dropout=dropout,
        embedding_type=embedding_type, channel_mult_noise=1,
        encoder_type=encoder_type, decoder_type=decoder_type,
        resample_filter=tuple(resample_filter),
        quant_backend=quant_backend or None)
    model = SongUNet(cfg, dtype=dtype)
    d, _, c = cfg.feat_shape
    head = EDMSigmaHead(dim=d, channels=c, n_blocks=sigma_block, out_dim=1,
                        dropout=sigma_dropout,
                        resample_filter=tuple(resample_filter),
                        dtype=dtype if sigma_dtype is None else sigma_dtype)
    return model, head, cfg
