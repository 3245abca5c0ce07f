"""InceptionV3 (FID variant) in flax + torchvision-checkpoint converter.

Gives FID numbers comparable to pytorch_fid / the reference's fid_helper
(src/experiments.py:210-226) when loaded with the standard
pt_inception-2015-12-05 weights (user-supplied, store/models pattern — the
reference equally downloads them at first use).

Architecture: torchvision inception_v3 with the pytorch_fid modifications —
average pooling with count_include_pad=False inside the Inception blocks and
a max-pool branch in the final InceptionE. Input: float images in [0, 1],
any size; resized to 299x299 bilinear and scaled to [-1, 1]; output: 2048-d
pool3 features.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn


class ConvBN(nn.Module):
    features: int
    kernel: tuple
    strides: tuple = (1, 1)
    padding: Any = (0, 0)

    @nn.compact
    def __call__(self, x):
        pad = self.padding
        if isinstance(pad, tuple) and len(pad) == 2 and isinstance(pad[0], int):
            pad = [(pad[0], pad[0]), (pad[1], pad[1])]
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    padding=pad, use_bias=False, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         name="bn")(x)
        return nn.relu(x)


def _avg_pool_nopad_count(x, window=(3, 3), strides=(1, 1), padding=(1, 1)):
    """Average pool with count_include_pad=False (the FID modification)."""
    pads = [(0, 0), (padding[0], padding[0]), (padding[1], padding[1]), (0, 0)]
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add,
                                   (1, window[0], window[1], 1),
                                   (1, strides[0], strides[1], 1), pads)
    ones = jnp.ones_like(x[..., :1])
    counts = jax.lax.reduce_window(ones, 0.0, jax.lax.add,
                                   (1, window[0], window[1], 1),
                                   (1, strides[0], strides[1], 1), pads)
    return summed / counts


def _max_pool(x, window=(3, 3), strides=(2, 2)):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, window[0], window[1], 1),
                                 (1, strides[0], strides[1], 1),
                                 [(0, 0), (0, 0), (0, 0), (0, 0)])


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = ConvBN(64, (1, 1), name="branch1x1")(x)
        b5 = ConvBN(48, (1, 1), name="branch5x5_1")(x)
        b5 = ConvBN(64, (5, 5), padding=(2, 2), name="branch5x5_2")(b5)
        b3 = ConvBN(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = ConvBN(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(b3)
        b3 = ConvBN(96, (3, 3), padding=(1, 1), name="branch3x3dbl_3")(b3)
        bp = _avg_pool_nopad_count(x)
        bp = ConvBN(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = ConvBN(384, (3, 3), strides=(2, 2), name="branch3x3")(x)
        bd = ConvBN(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = ConvBN(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = ConvBN(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3")(bd)
        bp = _max_pool(x)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    c7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.c7
        b1 = ConvBN(192, (1, 1), name="branch1x1")(x)
        b7 = ConvBN(c7, (1, 1), name="branch7x7_1")(x)
        b7 = ConvBN(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = ConvBN(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = ConvBN(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = ConvBN(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = ConvBN(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = ConvBN(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = ConvBN(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = _avg_pool_nopad_count(x)
        bp = ConvBN(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = ConvBN(192, (1, 1), name="branch3x3_1")(x)
        b3 = ConvBN(320, (3, 3), strides=(2, 2), name="branch3x3_2")(b3)
        b7 = ConvBN(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = ConvBN(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = ConvBN(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = ConvBN(192, (3, 3), strides=(2, 2), name="branch7x7x3_4")(b7)
        bp = _max_pool(x)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool_mode: str = "avg"    # 'avg' (E_1) | 'max' (E_2, pytorch_fid's last)

    @nn.compact
    def __call__(self, x):
        b1 = ConvBN(320, (1, 1), name="branch1x1")(x)
        b3 = ConvBN(384, (1, 1), name="branch3x3_1")(x)
        b3a = ConvBN(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3)
        b3b = ConvBN(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = ConvBN(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = ConvBN(384, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bda = ConvBN(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd)
        bdb = ConvBN(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool_mode == "max":
            bp = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                                       (1, 1, 1, 1),
                                       [(0, 0), (1, 1), (1, 1), (0, 0)])
        else:
            bp = _avg_pool_nopad_count(x)
        bp = ConvBN(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3FID(nn.Module):
    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, 3) in [0, 1] -> (B, 2048) pool3 features."""
        x = jax.image.resize(x, (x.shape[0], 299, 299, 3), "bilinear")
        x = x * 2.0 - 1.0
        x = ConvBN(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3")(x)
        x = ConvBN(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = ConvBN(64, (3, 3), padding=(1, 1), name="Conv2d_2b_3x3")(x)
        x = _max_pool(x)
        x = ConvBN(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = ConvBN(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _max_pool(x)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE("avg", name="Mixed_7b")(x)
        x = InceptionE("max", name="Mixed_7c")(x)
        return x.mean(axis=(1, 2))


# ---- converter ------------------------------------------------------------

def convert_inception(sd: Dict[str, np.ndarray]) -> dict:
    """torchvision/pytorch_fid state_dict -> flax variables
    ({'params': ..., 'batch_stats': ...})."""
    params: dict = {}
    stats: dict = {}

    def put(tree, keypath, val):
        node = tree
        for k in keypath[:-1]:
            node = node.setdefault(k, {})
        node[keypath[-1]] = val

    for k, v in sd.items():
        if k.endswith("num_batches_tracked") or k.startswith("fc.") or \
                k.startswith("AuxLogits"):
            continue
        parts = k.split(".")
        # e.g. Mixed_5b.branch1x1.conv.weight -> ['Mixed_5b','branch1x1','conv','weight']
        *mods, layer, name = parts
        flax_path = mods + [layer]
        if layer == "conv" and name == "weight":
            put(params, flax_path + ["kernel"], np.transpose(v, (2, 3, 1, 0)))
        elif layer == "bn":
            if name == "weight":
                put(params, flax_path + ["scale"], v)
            elif name == "bias":
                put(params, flax_path + ["bias"], v)
            elif name == "running_mean":
                put(stats, flax_path + ["mean"], v)
            elif name == "running_var":
                put(stats, flax_path + ["var"], v)
    return {"params": params, "batch_stats": stats}


def load_inception_variables(ckpt_path: str) -> dict:
    """Load pt_inception-2015-12-05-*.pth (or torchvision inception) weights."""
    import torch

    obj = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    sd = {k: v.detach().cpu().numpy() for k, v in obj.items()
          if hasattr(v, "detach")}
    return convert_inception(sd)


def make_inception_extractor(ckpt_path: str, batch_size: int = 64):
    """-> callable (N, H, W, 3) [0,1] numpy -> (N, 2048) features."""
    variables = load_inception_variables(ckpt_path)
    model = InceptionV3FID()
    apply_fn = jax.jit(lambda x: model.apply(variables, x))

    def extract(images: np.ndarray) -> np.ndarray:
        outs = []
        for i in range(0, len(images), batch_size):
            chunk = jnp.asarray(images[i:i + batch_size], jnp.float32)
            outs.append(np.asarray(apply_fn(chunk)))
        return np.concatenate(outs, axis=0)

    return extract
