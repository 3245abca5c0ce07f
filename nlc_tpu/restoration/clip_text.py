"""CLIP text transformer (flax) — the frozen prompt encoder PANet needs.

Covers the text tower of the reference's vendored CLIP
(basicsr/models/clip/model.py:167-307: ResidualAttentionBlock / Transformer /
CLIP.encode_text) as used by PANet's TextEncoder wrapper
(basicsr/models/archs/PANet_arch.py:43-63): the input is an already-embedded
prompt matrix (PromptLearner output), not token ids, and the output is the
projected EOT-row feature.

TPU notes: sequence length is the fixed CLIP context (77) and width 512, so
this whole tower is tiny next to the conv stack — one jitted einsum-attention
pass, fp32 LayerNorm islands, static EOT index (the PANet prompts are the
fixed "X X X." template, so argmax-of-token-ids is a compile-time constant
n_ctx + 2 rather than a gather).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn


def quick_gelu(x):
    """CLIP's QuickGELU (model.py:162-164)."""
    return x * jax.nn.sigmoid(1.702 * x)


class ResidualAttentionBlock(nn.Module):
    """Pre-LN transformer block with causal mask (model.py:167-188)."""
    width: int
    heads: int

    @nn.compact
    def __call__(self, x, mask):
        b, l, _ = x.shape
        hd = self.width // self.heads
        h = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x.astype(jnp.float32))
        h = h.astype(x.dtype)
        qkv = nn.Dense(3 * self.width, name="in_proj")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, l, self.heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, l, self.heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, l, self.heads, hd).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(hd) + mask
        att = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", att, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, l, self.width)
        x = x + nn.Dense(self.width, name="out_proj")(o)

        f = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x.astype(jnp.float32))
        f = f.astype(x.dtype)
        f = nn.Dense(4 * self.width, name="c_fc")(f)
        f = quick_gelu(f)
        f = nn.Dense(self.width, name="c_proj")(f)
        return x + f


class CLIPTextEncoder(nn.Module):
    """Text tower over pre-embedded prompts -> projected EOT features.

    ViT-B/32 text defaults: width 512, 12 layers, 8 heads, ctx 77,
    embed_dim 512.
    """
    width: int = 512
    layers: int = 12
    heads: int = 8
    ctx_len: int = 77
    embed_dim: int = 512

    @nn.compact
    def __call__(self, prompt_embeds, eot_idx: int):
        l = prompt_embeds.shape[1]
        pos = self.param("positional_embedding",
                         nn.initializers.normal(0.01), (self.ctx_len, self.width))
        x = prompt_embeds + pos[:l]
        # causal additive mask (CLIP.build_attention_mask, model.py:317-322)
        mask = jnp.triu(jnp.full((l, l), -jnp.inf, jnp.float32), k=1)[None, None]
        for i in range(self.layers):
            x = ResidualAttentionBlock(self.width, self.heads,
                                       name=f"resblock_{i}")(x, mask)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_final")(x.astype(jnp.float32))
        x = x.astype(prompt_embeds.dtype)
        x = x[:, eot_idx]
        proj = self.param("text_projection", nn.initializers.normal(0.02),
                          (self.width, self.embed_dim))
        return x @ proj


def convert_clip_text(sd: dict, prefix: str = "text_encoder.",
                      layers: int = 12) -> dict:
    """Torch CLIP text-tower state dict -> flax CLIPTextEncoder params.

    Key layout per the vendored model.py / PANet's TextEncoder wrapper:
    {prefix}positional_embedding, {prefix}transformer.resblocks.N.*,
    {prefix}ln_final.*, {prefix}text_projection.
    """
    def lin(key):
        return {"kernel": np.ascontiguousarray(sd[f"{key}.weight"].T),
                "bias": sd[f"{key}.bias"]}

    def ln(key):
        return {"scale": sd[f"{key}.weight"], "bias": sd[f"{key}.bias"]}

    params = {
        "positional_embedding": sd[f"{prefix}positional_embedding"],
        "ln_final": ln(f"{prefix}ln_final"),
        "text_projection": sd[f"{prefix}text_projection"],
    }
    for i in range(layers):
        t = f"{prefix}transformer.resblocks.{i}"
        params[f"resblock_{i}"] = {
            "ln_1": ln(f"{t}.ln_1"),
            "in_proj": {"kernel": np.ascontiguousarray(
                            sd[f"{t}.attn.in_proj_weight"].T),
                        "bias": sd[f"{t}.attn.in_proj_bias"]},
            "out_proj": lin(f"{t}.attn.out_proj"),
            "ln_2": ln(f"{t}.ln_2"),
            "c_fc": lin(f"{t}.mlp.c_fc"),
            "c_proj": lin(f"{t}.mlp.c_proj"),
        }
    return params
