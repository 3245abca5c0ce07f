"""Config system: YAML model/data/diffusion schema + args.json round-trip.

Parity targets:
  store/config/<name>.yml nested schema + dict2namespace
      (reference image_sample.py:123-136)
  args.json persistence and rehydration (image_sample.py:112-121, 720-736)

ConfigDict is an attribute dict that nests, so `config.model.ch` etc. works
exactly like the reference's namespace tree.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict

import yaml


class ConfigDict(dict):
    """Nested attribute-access dict."""

    def __getattr__(self, name):
        try:
            v = self[name]
        except KeyError:
            raise AttributeError(name)
        return v

    def __setattr__(self, name, value):
        self[name] = value

    @classmethod
    def from_nested(cls, d: Dict[str, Any]) -> "ConfigDict":
        out = cls()
        for k, v in d.items():
            out[k] = cls.from_nested(v) if isinstance(v, dict) else v
        return out

    def to_nested(self) -> Dict[str, Any]:
        return {k: (v.to_nested() if isinstance(v, ConfigDict) else v)
                for k, v in self.items()}

    def setdefaults(self, **kw):
        for k, v in kw.items():
            self.setdefault(k, v)
        return self


def load_yaml_config(path: str) -> ConfigDict:
    with open(path) as f:
        raw = yaml.safe_load(f)
    cfg = ConfigDict.from_nested(raw)
    # schema defaults the reference reads but configs may omit
    cfg.setdefault("model", ConfigDict())
    cfg.setdefault("data", ConfigDict())
    cfg.setdefault("diffusion", ConfigDict())
    cfg.diffusion.setdefaults(num_diffusion_timesteps=1000, beta_schedule="linear",
                              beta_start=0.0001, beta_end=0.02)
    cfg.data.setdefaults(channels=3, num_workers=0, subset_1k=False)
    cfg.model.setdefaults(type="simple", feat_layer=0, sigma_block=2,
                          sigma_dropout=0.0, use_sigma_fp16=False, use_fp16=False)
    return cfg


def dump_args(args, path: str) -> None:
    """Persist run arguments (args.json schema)."""
    d = dict(vars(args)) if not isinstance(args, dict) else dict(args)
    for k, v in list(d.items()):
        if not isinstance(v, (str, int, float, bool, list, tuple, type(None))):
            d[k] = str(v)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(d, f, indent=1)


def load_args(path: str) -> Dict[str, Any]:
    with open(path) as f:
        return json.load(f)


def default_yaml_configs() -> Dict[str, dict]:
    """Built-in equivalents of the store/config/*.yml files the reference
    expects users to supply (SURVEY.md §0: store/ is not shipped). These cover
    the four documented dataset configs."""
    return {
        "cifar10_adm": {
            "model": {"type": "openai", "image_size": 32, "num_channels": 128,
                      "num_res_blocks": 3, "channel_mult": "", "learn_sigma": True,
                      "class_cond": False, "use_checkpoint": False,
                      "attention_resolutions": "16,8", "num_heads": 4,
                      "num_head_channels": 64, "num_heads_upsample": -1,
                      "use_scale_shift_norm": True, "dropout": 0.3,
                      "resblock_updown": True, "use_fp16": False,
                      "use_new_attention_order": True, "feat_layer": 1},
            "data": {"dataset": "CIFAR10", "image_size": 32, "channels": 3},
            "diffusion": {"num_diffusion_timesteps": 1000,
                          "beta_schedule": "cosine"},
        },
        "celeba_ddim": {
            "model": {"type": "simple", "ch": 128, "out_ch": 3,
                      "ch_mult": [1, 2, 2, 2, 4], "num_res_blocks": 2,
                      "attn_resolutions": [16], "dropout": 0.1,
                      "in_channels": 3, "resamp_with_conv": True, "feat_layer": 0},
            "data": {"dataset": "CELEBA", "image_size": 64, "channels": 3},
            "diffusion": {"num_diffusion_timesteps": 1000,
                          "beta_schedule": "linear"},
        },
        "celeba_hq": {
            "model": {"type": "simple", "ch": 128, "out_ch": 3,
                      "ch_mult": [1, 1, 2, 2, 4, 4], "num_res_blocks": 2,
                      "attn_resolutions": [16], "dropout": 0.0,
                      "in_channels": 3, "resamp_with_conv": True, "feat_layer": 0},
            "data": {"dataset": "CelebA_HQ", "image_size": 256, "channels": 3},
            "diffusion": {"num_diffusion_timesteps": 1000,
                          "beta_schedule": "linear"},
        },
        "imagenet": {
            "model": {"type": "openai", "image_size": 256, "num_channels": 256,
                      "num_res_blocks": 2, "channel_mult": "", "learn_sigma": True,
                      "class_cond": False, "use_checkpoint": False,
                      "attention_resolutions": "32,16,8", "num_heads": 4,
                      "num_head_channels": 64, "num_heads_upsample": -1,
                      "use_scale_shift_norm": True, "dropout": 0.0,
                      "resblock_updown": True, "use_fp16": False,
                      "use_new_attention_order": False, "feat_layer": 1},
            "data": {"dataset": "ImageNet", "image_size": 256, "channels": 3,
                     "subset_1k": True},
            "diffusion": {"num_diffusion_timesteps": 1000,
                          "beta_schedule": "linear"},
        },
    }


def get_config(name_or_path: str) -> ConfigDict:
    """Load a YAML config by path, or fall back to the built-in schema by name."""
    if os.path.exists(name_or_path):
        return load_yaml_config(name_or_path)
    builtin = default_yaml_configs()
    if name_or_path in builtin:
        cfg = ConfigDict.from_nested(builtin[name_or_path])
        cfg.diffusion.setdefaults(beta_start=0.0001, beta_end=0.02)
        cfg.data.setdefaults(channels=3, num_workers=0, subset_1k=False)
        cfg.model.setdefaults(type="simple", feat_layer=0, sigma_block=2,
                              sigma_dropout=0.0, use_sigma_fp16=False,
                              use_fp16=False)
        return cfg
    raise FileNotFoundError(f"no config file or builtin named {name_or_path!r}")
