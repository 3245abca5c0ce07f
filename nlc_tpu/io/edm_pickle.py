"""Standalone loader for EDM persistence pickles (network-snapshot-*.pkl).

EDM snapshots embed the source code of their network classes
(reference torch_utils/persistence.py:34-139) and unpickle through
`torch_utils.persistence._reconstruct_persistent_obj`. This module installs a
minimal compatible shim so the snapshots load WITHOUT the original repo:
the embedded source is exec'd into a synthetic module (exactly what the
original loader does — note this runs code stored in the pickle; only load
trusted checkpoints), the class is instantiated via __new__ + __setstate__.

load_edm_state_dict(path) returns the EMA model's state_dict as numpy arrays,
matching the access pattern pickle.load(f)['ema'].model.state_dict() used at
reference edm_image_sample.py:152-156.
"""
from __future__ import annotations

import sys
import types
import uuid
from typing import Dict

import numpy as np

_VERSION = 6  # persistence format version used by EDM snapshots


class EasyDict(dict):
    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)

    def __setattr__(self, name, value):
        self[name] = value


_src_modules: dict = {}


def _src_to_module(src: str):
    mod = _src_modules.get(src)
    if mod is None:
        name = "_nlc_edm_snapshot_" + uuid.uuid4().hex
        mod = types.ModuleType(name)
        sys.modules[name] = mod
        _src_modules[src] = mod
        exec(src, mod.__dict__)
    return mod


def _reconstruct_persistent_obj(meta):
    meta = EasyDict(meta)
    assert meta.type == "class"
    module = _src_to_module(meta.module_src)
    cls = module.__dict__[meta.class_name]
    obj = cls.__new__(cls)
    setstate = getattr(obj, "__setstate__", None)
    if callable(setstate):
        setstate(meta.state)
    else:
        obj.__dict__.update(meta.state)
    return obj


def _identity_persistent_class(cls):
    return cls


def install_persistence_shim() -> None:
    """Register fake torch_utils.persistence + dnnlib modules so persistence
    pickles resolve their global references."""
    if "torch_utils.persistence" in sys.modules:
        mod = sys.modules["torch_utils.persistence"]
        if getattr(mod, "_nlc_shim", False) or hasattr(mod, "_reconstruct_persistent_obj"):
            return
    tu = sys.modules.get("torch_utils") or types.ModuleType("torch_utils")
    pers = types.ModuleType("torch_utils.persistence")
    pers._nlc_shim = True
    pers._version = _VERSION
    pers._reconstruct_persistent_obj = _reconstruct_persistent_obj
    pers.persistent_class = _identity_persistent_class
    pers.is_persistent = lambda obj: True
    pers.import_hook = lambda hook: None
    tu.persistence = pers
    sys.modules["torch_utils"] = tu
    sys.modules["torch_utils.persistence"] = pers
    if "dnnlib" not in sys.modules:
        dn = types.ModuleType("dnnlib")
        dn.EasyDict = EasyDict
        util = types.ModuleType("dnnlib.util")
        util.EasyDict = EasyDict
        dn.util = util
        sys.modules["dnnlib"] = dn
        sys.modules["dnnlib.util"] = util


def load_edm_snapshot(path: str, key: str = "ema"):
    """Load a persistence pickle and return the requested network object."""
    import pickle

    install_persistence_shim()
    with open(path, "rb") as f:
        data = pickle.load(f)
    return data[key] if isinstance(data, dict) else data


def load_edm_state_dict(path: str, key: str = "ema") -> Dict[str, np.ndarray]:
    """EMA SongUNet/DhariwalUNet weights as {torch_key: numpy array}.

    Handles both precond wrappers (state dict under 'model.') and bare nets.
    """
    net = load_edm_snapshot(path, key)
    model = getattr(net, "model", net)
    sd = model.state_dict()
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}
