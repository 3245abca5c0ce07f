"""Component-ablation switches for performance itemization.

benchmarks/stepparts.py runs the flagship sampling loop with individual
compute components neutralized to attribute wall-clock to them (the
"itemize the non-conv bucket" measurement, docs/BENCHMARKS.md). Ablations
are selected via the NLC_ABLATE env var (comma-separated), read once at
import: benchmark processes set it before importing model code. Never set
in production paths; every hook site guards a measurement-only shortcut
that keeps parameter trees identical so compiled program structure stays
comparable.

Known names: norm (GroupNorm -> per-channel affine, no statistics),
swish (identity), attn (attention core -> value passthrough),
dyn_ascale (int8 activation scale pinned to a constant — removes the
per-call absmax reduce).
"""
from __future__ import annotations

import os

_SET = frozenset(filter(None, os.environ.get("NLC_ABLATE", "").split(",")))


def ablated(name: str) -> bool:
    return name in _SET
