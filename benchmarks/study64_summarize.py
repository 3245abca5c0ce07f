"""Summarize study64 sweep cells into a stamped measurement artifact.

Round-4 tail: the isolation cells (base vs base+int8conv vs NLC-pred vs
NLC-pred+int8conv on ONE model) answer whether the 64² int8 FID delta is
raw quant drift or int8 interacting with the NLC correction loop. After
the third re-image these run on a fresh reduced-budget model
(NLC_STUDY64_KIMG=128) — comparisons are valid only WITHIN this file's
cells, and are stamped as such.

Usage: python benchmarks/study64_summarize.py [out.json]
"""
import glob
import json
import os
import re
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
STUDY = os.environ.get("NLC_STUDY64_DIR",
                       os.path.join(os.path.dirname(HERE), "study64"))


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        HERE, "measurements", "r4", "study64_isolation.json")
    cells = {}
    snapshots = set()
    for p in sorted(glob.glob(os.path.join(STUDY, "sweep", "*", "0",
                                           "results.json"))):
        tag = p.split(os.sep)[-3]
        with open(p) as f:
            r = json.load(f)
        cells[tag] = {k: r[k] for k in ("fid", "fid_backend", "fid_note",
                                        "eps_snapshot", "eps_kimg")
                      if k in r}
        snapshots.add(r.get("eps_snapshot"))
    if not cells:
        raise SystemExit(f"no sweep cells found under {STUDY}/sweep — "
                         "nothing to summarize")
    # Provenance comes from the cells themselves (ADVICE r4: stamping from
    # env vars read at summarize time could falsely record the training
    # budget). Every compared cell must have sampled ONE snapshot, or the
    # internal-controls claim does not hold — fail loudly, don't stamp.
    if len(snapshots) != 1 or None in snapshots:
        raise SystemExit(
            "sweep cells disagree on (or lack) their eps_snapshot stamp — "
            f"{sorted(str(s) for s in snapshots)}; clear {STUDY}/sweep and "
            "re-run all compared cells on one model before summarizing")
    snap = snapshots.pop()
    kimg = int(re.search(r"(\d+)$", snap).group(1))
    head = os.environ.get("NLC_STUDY64_HEAD_EPOCHS", "unknown")
    summary = {
        "note": ("int8-isolation cells on a FRESH reduced-budget model "
                 f"(SongUNet-64 62M, {kimg} kimg, {head} head epochs — the "
                 "third VM re-image erased the 400-kimg model, so these "
                 "cells are NOT comparable to study64_results.json; all "
                 "compared styles were re-sampled on this one model, "
                 "asserted via per-cell eps_snapshot stamps). "
                 "Fallback-embedding FID, 1024 same-seed samples/cell."),
        "eps_snapshot": snap,
        "eps_kimg": kimg,
        "cells": cells,
    }
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
