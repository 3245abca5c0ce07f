"""Asynchronous input prefetching for restoration training.

Rebuilds basicsr/data/prefetch_dataloader.py:1-120 (PrefetchGenerator /
PrefetchDataLoader / CPUPrefetcher / CUDAPrefetcher) TPU-natively:

- mode="cpu": a daemon thread runs the host-side pipeline (decode, crop,
  augment, stack) ahead of the training loop into a bounded queue — the
  PrefetchDataLoader/CPUPrefetcher analogue.
- mode="device": the thread additionally `jax.device_put`s each batch, so
  the host->HBM transfer of batch N overlaps the device compute of batch
  N-1 — the CUDAPrefetcher analogue (reference: `.cuda(non_blocking=True)`
  under a side stream). Accepts a `jax.sharding.Sharding` so multi-device
  DP batches land pre-sharded.

The wrapper is sequence-transparent: it yields exactly the items of the
wrapped iterator, in order, and re-raises any worker exception at the
corresponding `next()`. `wait_time`/`batches` expose how long the consumer
actually blocked, which the training CLI turns into the measured
`input_wait_frac` (VERDICT r2 #6: measure, then fix or close).
"""
from __future__ import annotations

import queue
import threading
import time
from typing import Iterator, Optional

__all__ = ["PrefetchLoader", "wrap_prefetch"]

_SENTINEL = object()


class PrefetchLoader:
    """Bounded background-thread prefetcher over any batch iterator."""

    def __init__(self, it: Iterator, num_prefetch_queue: int = 4,
                 mode: str = "cpu", sharding=None):
        if mode not in ("cpu", "device"):
            raise ValueError(f"prefetch mode must be cpu|device, got {mode!r}")
        self._mode = mode
        self._sharding = sharding
        self._q: queue.Queue = queue.Queue(maxsize=max(1, num_prefetch_queue))
        self._err: Optional[BaseException] = None
        self.wait_time = 0.0   # seconds the consumer spent blocked in next()
        self.batches = 0       # batches delivered
        self._thread = threading.Thread(target=self._fill, args=(it,),
                                        daemon=True)
        self._thread.start()

    def _fill(self, it):
        try:
            for item in it:
                if self._mode == "device":
                    item = self._to_device(item)
                self._q.put(item)
        except BaseException as e:  # propagate into the consumer
            self._err = e
        finally:
            self._q.put(_SENTINEL)

    def _to_device(self, item):
        import jax
        put = (lambda x: jax.device_put(x, self._sharding)) \
            if self._sharding is not None else jax.device_put
        if isinstance(item, tuple):
            return tuple(put(x) for x in item)
        if isinstance(item, dict):
            return {k: put(v) for k, v in item.items()}
        return put(item)

    def __iter__(self):
        return self

    def __next__(self):
        t0 = time.perf_counter()
        item = self._q.get()
        self.wait_time += time.perf_counter() - t0
        if item is _SENTINEL:
            if self._err is not None:
                raise self._err
            raise StopIteration
        self.batches += 1
        return item


def wrap_prefetch(it: Iterator, dopt: Optional[dict], sharding=None):
    """Wrap `it` per the dataset options' reference keys.

    `prefetch_mode: ~ | cpu | cuda` and `num_prefetch_queue` are the
    reference YAML schema (basicsr/data/prefetch_dataloader.py:60-120);
    'cuda' maps to the device prefetcher. Returns (iterator, loader|None).
    """
    mode = (dopt or {}).get("prefetch_mode")
    if mode in (None, "", "none", "~"):
        return it, None
    mode = "device" if mode in ("cuda", "device") else "cpu"
    loader = PrefetchLoader(it, num_prefetch_queue=(dopt or {}).get(
        "num_prefetch_queue", 4), mode=mode, sharding=sharding)
    return loader, loader
