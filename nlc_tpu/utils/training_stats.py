"""Cross-host training statistics collection.

Parity with reference torch_utils/training_stats.py: report()/report0() into
named phase buffers (num, sum, sum-of-squares), a Collector exposing
mean/std/num since the last update, and default_collector convenience. The
reference's all_gather sync (:233 ff) maps to jax.process-level aggregation:
on multi-host runs call `reduce_across_hosts` (a psum over a tiny array via
jit) before Collector.update; single-process runs need nothing.
"""
from __future__ import annotations

import re
from typing import Dict

import numpy as np

import jax
import jax.numpy as jnp

_NUM_MOMENTS = 3
_counters: Dict[str, np.ndarray] = {}


def report(name: str, value) -> None:
    """Accumulate [count, sum, sum-of-squares] for `name`."""
    arr = np.asarray(value, np.float64).reshape(-1)
    if arr.size == 0:
        return
    moments = np.asarray([arr.size, arr.sum(), (arr ** 2).sum()], np.float64)
    if name not in _counters:
        _counters[name] = np.zeros(_NUM_MOMENTS, np.float64)
    _counters[name] += moments


def report0(name: str, value):
    """Report only on the primary host; returns value (reference report0)."""
    if jax.process_index() == 0:
        report(name, value)
    return value


def reduce_across_hosts() -> None:
    """Sum the counter buffers over all hosts (all_gather parity). No-op for
    a single process."""
    if jax.process_count() == 1 or not _counters:
        return
    names = sorted(_counters)
    stacked = np.stack([_counters[n] for n in names])
    from jax.experimental import multihost_utils
    reduced = multihost_utils.process_allgather(stacked).sum(axis=0)
    for i, n in enumerate(names):
        _counters[n] = np.asarray(reduced[i])


class Collector:
    """Snapshot deltas of the counters matching a regex (reference Collector)."""

    def __init__(self, regex: str = ".*"):
        self._regex = re.compile(regex)
        self._cumulative: Dict[str, np.ndarray] = {}
        self._deltas: Dict[str, np.ndarray] = {}

    def names(self):
        return [n for n in _counters if self._regex.fullmatch(n)]

    def update(self):
        for name in self.names():
            cur = _counters[name].copy()
            prev = self._cumulative.get(name, np.zeros(_NUM_MOMENTS))
            self._deltas[name] = cur - prev
            self._cumulative[name] = cur

    def _delta(self, name):
        return self._deltas.get(name, np.zeros(_NUM_MOMENTS))

    def num(self, name) -> int:
        return int(self._delta(name)[0])

    def mean(self, name) -> float:
        d = self._delta(name)
        return float(d[1] / d[0]) if d[0] > 0 else float("nan")

    def std(self, name) -> float:
        d = self._delta(name)
        if d[0] <= 1:
            return 0.0
        mean = d[1] / d[0]
        var = max(d[2] / d[0] - mean ** 2, 0.0)
        return float(np.sqrt(var))

    def as_dict(self) -> dict:
        return {n: {"num": self.num(n), "mean": self.mean(n), "std": self.std(n)}
                for n in self.names()}


def reset() -> None:
    _counters.clear()


def print_module_summary(module, variables, sample_args, max_rows: int = 200):
    """Per-submodule parameter-count table (reference
    torch_utils/misc.py:196 print_module_summary / print per-module tables).
    Uses the flax param tree; returns the formatted string."""
    rows = [("module", "params", "shape-sample")]
    total = 0

    def walk(tree, path):
        nonlocal total
        leaf_count = 0
        sample = ""
        subdirs = []
        for k, v in tree.items():
            if isinstance(v, dict):
                subdirs.append((k, v))
            else:
                leaf_count += int(np.prod(v.shape))
                if not sample:
                    sample = str(tuple(v.shape))
        if leaf_count:
            rows.append((".".join(path) or "<root>", str(leaf_count), sample))
            total += leaf_count
        for k, v in subdirs:
            walk(v, path + [k])

    walk(variables.get("params", variables), [])
    rows.append(("TOTAL", str(total), ""))
    widths = [max(len(r[i]) for r in rows) for i in range(3)]
    lines = ["  ".join(r[i].ljust(widths[i]) for i in range(3))
             for r in rows[:max_rows]]
    out = "\n".join(lines)
    print(out)
    return out
