"""Measure the restoration training input-wait fraction (VERDICT r2 #6).

Runs the round-2 measured NAFNet-256² config (width 32, 36 blocks, B=16,
remat — docs/BENCHMARKS.md "restoration CNN" row) over a real on-disk PNG
pipeline (synthetic image content, real decode/crop/augment host path), once
with the synchronous loader and once with prefetch_mode: cpu
(restoration/prefetch.py, reference basicsr/data/prefetch_dataloader.py),
and prints one JSON line per run with imgs/sec and input_wait_frac.
Round-3 addition: a sync+native row measuring the C++ paired loader
(native/image_loader.cpp nlc_load_paired_batch) — on few-core hosts the
GIL-free decode is the fix, not thread overlap.

Usage: python benchmarks/input_wait_bench.py [--iters N] [--batch B]
       [--width W] [--size S] [--n_images K]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_dataset(root: str, n: int, size: int) -> None:
    from PIL import Image
    import numpy as np
    gt_dir = os.path.join(root, "gt")
    lq_dir = os.path.join(root, "lq")
    os.makedirs(gt_dir, exist_ok=True)
    os.makedirs(lq_dir, exist_ok=True)
    rng = np.random.RandomState(0)
    for i in range(n):
        # structured content so PNGs are realistically sized (not all-noise,
        # not trivially compressible)
        yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
        img = (127 + 80 * np.sin(xx / (7 + i) + i) * np.cos(yy / (11 + i))
               + rng.randn(size, size) * 18)
        img = np.clip(img, 0, 255).astype(np.uint8)
        img = np.stack([img, np.roll(img, i, 0), np.roll(img, i, 1)], -1)
        Image.fromarray(img).save(os.path.join(gt_dir, f"{i:04d}.png"))
        noisy = np.clip(img.astype(np.int16) + rng.randint(-25, 25, img.shape),
                        0, 255).astype(np.uint8)
        Image.fromarray(noisy).save(os.path.join(lq_dir, f"{i:04d}.png"))


def run(root: str, a, prefetch: bool, native: bool = False,
        u8: bool = False) -> dict:
    import numpy as np
    import jax
    import jax.numpy as jnp
    from nlc_tpu.restoration.data import PairedImageDataset, paired_loader
    from nlc_tpu.restoration.prefetch import wrap_prefetch
    from nlc_tpu.restoration.model import RestorationModel

    opt = {
        "name": "inputwait", "manual_seed": 0,
        "network_g": {"type": "NAFNet", "width": a.width,
                      "middle_blk_num": 12,
                      "enc_blk_nums": [2, 2, 4, 8],
                      "dec_blk_nums": [2, 2, 2, 2], "remat": True},
        "train": {"total_iter": a.iters, "pixel_opt": {"type": "PSNRLoss"},
                  "optim_g": {"lr": 1e-3},
                  "scheduler": {"type": "LinearLR", "total_iter": a.iters}},
        "path": {},
    }
    ds = PairedImageDataset(dataroot_gt=os.path.join(root, "gt"),
                            dataroot_lq=os.path.join(root, "lq"),
                            gt_size=a.size, scale=1, phase="train",
                            use_flip=True, use_rot=True)
    it = paired_loader(ds, a.batch, infinite=True, native=native,
                       native_dtype="uint8" if u8 else "float32")
    dopt = {"prefetch_mode": "cpu", "num_prefetch_queue": 4} if prefetch else {}
    it, loader = wrap_prefetch(it, dopt)

    model = RestorationModel(opt)
    lq0, _ = ds[0]
    state = model.init_state(jnp.zeros((1,) + lq0.shape))
    key = jax.random.PRNGKey(0)

    # warmup: compile + first batches
    for _ in range(3):
        lq, gt = next(it)
        state, loss = model.train_step(state, jnp.asarray(lq), jnp.asarray(gt),
                                       jax.random.fold_in(key, int(state.step)))
    np.asarray(loss)  # fence (axon: block_until_ready is unreliable)

    input_wait = 0.0
    t0 = time.perf_counter()
    for _ in range(a.iters):
        tw = time.perf_counter()
        lq, gt = next(it)
        input_wait += time.perf_counter() - tw
        state, loss = model.train_step(state, jnp.asarray(lq), jnp.asarray(gt),
                                       jax.random.fold_in(key, int(state.step)))
    np.asarray(loss)  # host fetch fences the whole measured span
    elapsed = time.perf_counter() - t0
    return {
        "mode": ("prefetch-cpu" if prefetch else "sync")
                + ("+native" if native else "+pil") + ("-u8" if u8 else ""),
        "imgs_per_sec": round(a.iters * a.batch / elapsed, 2),
        "sec_per_iter": round(elapsed / a.iters, 4),
        "input_wait_frac": round(input_wait / elapsed, 4),
        "batch": a.batch, "size": a.size, "width": a.width,
        "iters": a.iters,
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--width", type=int, default=32)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--n_images", type=int, default=64)
    p.add_argument("--platform", type=str, default=None,
                   help="force jax platform (e.g. cpu) for rehearsal")
    a = p.parse_args()
    if a.platform:
        import jax
        jax.config.update("jax_platforms", a.platform)
    with tempfile.TemporaryDirectory(prefix="inputwait_") as root:
        print(f"generating {a.n_images} paired {a.size}^2 PNGs...",
              file=sys.stderr, flush=True)
        make_dataset(root, a.n_images, a.size)
        # (sync, PIL) is the reference-parity baseline; (sync, native) the
        # GIL-free C++ decode; the -u8 rows ship raw bytes and normalize
        # on-device (4x smaller transfers — the host-work fix that holds
        # even on 1-core hosts, where thread overlap measurably cannot);
        # the prefetch row measures overlap on top.
        for prefetch, native, u8 in ((False, False, False),
                                     (False, True, False),
                                     (False, True, True),
                                     (True, True, True)):
            r = run(root, a, prefetch, native, u8)
            print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
