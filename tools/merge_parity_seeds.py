#!/usr/bin/env python
"""Merge per-seed training-parity artifacts into one multi-seed artifact.

VERDICT r03 weak #2 asks for a >=5-seed, pre-registered-horizon gate.
The three big models already have 3 recorded seeds at the 25-epoch
horizon (TRAIN_PARITY_*_long.json, round 3); retraining those ~3x1400 s
seed-pairs adds nothing statistically over extending them with fresh
seeds at the SAME config. This tool concatenates the per-seed `runs`
lists of N artifacts (config fields must match exactly), recomputes
mean/min/max, gap_of_means and the within-framework spread, and writes
the merged artifact with full provenance. Host note: seeds may come
from different 1-core relay hosts (torch oneDNN kernel choice differs
by microarch), so cross-host seed variance is part of the measured
noise — which only WIDENS the strict gate's confidence bound, never
narrows it (tools/regate_parity.py --strict).
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

# Filler-semantics fields are part of the config identity: merging a
# deviant-semantics ablation run (--torch-repeat-fillers or
# POINTSEG_BQ_FILLER=index) into a canonical gate artifact would corrupt
# the strict gate's gap. Artifacts written before the field existed get
# the default (the canonical semantics) so they still merge.
_CONFIG_KEYS: dict = {
    "model": None, "epochs": None, "batches_per_epoch": None,
    "npoints": None, "same_init": None, "bn_stats": None, "tol": None,
    "torch_repeat_fillers": False, "bq_filler": "repeat",
    # r05: 'init' replicates re-initialize both models per seed; the
    # r03/r04 artifacts predate the field and used the legacy
    # train-draws-only protocol
    "seed_protocol": "train",
    # r05: class-correlated synthetic rgb (PointNet gate); pre-r05
    # artifacts used uniform-noise rgb
    "class_colors": False,
}


def merge(paths: list[str]) -> dict:
    arts = []
    for p in paths:
        with open(p) as f:
            arts.append(json.load(f))
    base = arts[0]
    for a in arts[1:]:
        for k, dflt in _CONFIG_KEYS.items():
            if a.get(k, dflt) != base.get(k, dflt):
                raise SystemExit(
                    f"config mismatch on {k!r}: {base.get(k, dflt)} vs "
                    f"{a.get(k, dflt)}"
                    f" ({paths[0]} vs {paths[arts.index(a)]})")
    seeds = [s for a in arts for s in a["train_seeds"]]
    if len(set(seeds)) != len(seeds):
        raise SystemExit(f"duplicate seeds across artifacts: {seeds}")

    out = {k: base.get(k, dflt) for k, dflt in _CONFIG_KEYS.items()}
    out["train_seeds"] = seeds
    out["merged_from"] = [{"path": p, "seeds": a["train_seeds"]}
                          for p, a in zip(paths, arts)]
    summary: dict = {}
    for side in ("reference_torch", "pointseg"):
        summary[side] = {}
        for regime in ("sampled", "whole"):
            summary[side][regime] = {}
            for metric in base["summary"][side][regime]:
                runs = [v for a in arts
                        for v in a["summary"][side][regime][metric]["runs"]]
                arr = np.asarray(runs, float)
                summary[side][regime][metric] = {
                    "mean": round(float(arr.mean()), 4),
                    "min": round(float(arr.min()), 4),
                    "max": round(float(arr.max()), 4),
                    "runs": [round(float(v), 4) for v in runs],
                }
    out["summary"] = summary
    out["gap_of_means"] = {
        regime: {
            metric: round(
                summary["pointseg"][regime][metric]["mean"]
                - summary["reference_torch"][regime][metric]["mean"], 4)
            for metric in summary["pointseg"][regime]
        }
        for regime in ("sampled", "whole")
    }
    out["within_framework_miou_spread"] = round(max(
        summary[side][regime]["miou"]["max"]
        - summary[side][regime]["miou"]["min"]
        for side in summary for regime in summary[side]), 4)
    out["train_seconds"] = {
        side: [v for a in arts
               for v in a.get("train_seconds", {}).get(side, [])]
        for side in ("reference_torch", "pointseg")
    }
    # transferred-weights forward equivalence is seed-independent; keep
    # the first artifact's record
    if "pointseg_with_torch_weights" in base:
        out["pointseg_with_torch_weights"] = base["pointseg_with_torch_weights"]
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("artifacts", nargs="+")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    merged = merge(args.artifacts)
    with open(args.out, "w") as f:
        json.dump(merged, f, indent=2)
    print(f"wrote {args.out}: model {merged['model']}, "
          f"seeds {merged['train_seeds']}, gaps "
          f"{merged['gap_of_means']}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
