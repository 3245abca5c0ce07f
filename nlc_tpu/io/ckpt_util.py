"""Known-checkpoint registry + verified fetch.

Parity with reference functions/ckpt_util.py (~:1-80): a URL/md5 registry for
the public DDIM CelebA-HQ checkpoints with get_ckpt_path returning a cached
local file. Downloads verify md5; in network-less deployments the function
resolves an existing cache (or raises with the URL to fetch manually).
"""
from __future__ import annotations

import hashlib
import os
import urllib.request

# public checkpoint registry (the DDIM release the reference points at)
CKPT_REGISTRY = {
    "celeba_hq": {
        "url": "https://image-editing-test-12345.s3-us-west-2.amazonaws.com/"
               "checkpoints/celeba_hq.ckpt",
        "md5": "75e594e290591560267325fc5e0acfb9",
        "file": "celeba_hq.ckpt",
    },
}


def md5_hash(path: str, chunk: int = 1 << 20) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        while True:
            data = f.read(chunk)
            if not data:
                break
            h.update(data)
    return h.hexdigest()


def download(url: str, path: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".part"
    urllib.request.urlretrieve(url, tmp)
    os.replace(tmp, path)


def get_ckpt_path(name: str, root: str = "store/models",
                  check_md5: bool = True, allow_download: bool = True) -> str:
    """Resolve a registered checkpoint to a local path, fetching if needed."""
    if name not in CKPT_REGISTRY:
        raise KeyError(f"unknown checkpoint {name!r}; have {sorted(CKPT_REGISTRY)}")
    entry = CKPT_REGISTRY[name]
    path = os.path.join(root, entry["file"])
    if not os.path.exists(path):
        if not allow_download:
            raise FileNotFoundError(
                f"{path} missing; fetch manually from {entry['url']}")
        try:
            download(entry["url"], path)
        except Exception as e:
            raise FileNotFoundError(
                f"could not download {entry['url']} ({e}); place the file at "
                f"{path} manually") from e
    if check_md5 and entry.get("md5"):
        got = md5_hash(path)
        if got != entry["md5"]:
            raise ValueError(f"md5 mismatch for {path}: {got} != {entry['md5']}")
    return path


def get_model_size(variables) -> float:
    """Parameter+buffer size in MiB (reference src/utils.py get_model_size)."""
    import numpy as np
    import jax
    total = 0
    for leaf in jax.tree_util.tree_leaves(variables):
        total += np.asarray(leaf).nbytes
    return total / 1024 ** 2
