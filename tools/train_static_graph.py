#!/usr/bin/env python
"""Accuracy cost of the static-graph DGCNN mode, measured.

Same-init, same-data, same-step-count training of DeepGraphCnn with
dynamic (reference-parity) vs static (xyz-graph-reuse) neighborhoods
on the synthetic block dataset, across seeds; evaluates both in the
sampled regime (the density-matched regime the parity harness gates,
CLAUDE.md round-2 findings). Complements the chip-time A/B
(tools/ab_static_graph.py): together they quantify the speed/accuracy
trade the --static-graph flag offers.

Writes STATIC_GRAPH_CONVERGENCE_r03.json. CPU-friendly scale.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    ap.add_argument("--npoints", type=int, default=512)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--data-dir", default="/tmp/static_graph_blocks")
    ap.add_argument("--out", default="STATIC_GRAPH_CONVERGENCE_r03.json")
    args = ap.parse_args()

    import jax

    from pointseg.runtime import setup_runtime

    setup_runtime()

    from pointseg.data.datasets import create_block_dataloaders
    from pointseg.data.synthetic import make_block_dataset
    from pointseg.models import create_model
    from pointseg.train.loop import evaluate, train_epoch
    from pointseg.train.state import create_train_state

    if not os.path.isdir(os.path.join(args.data_dir, "area_1")):
        make_block_dataset(args.data_dir, areas=(1, 2, 3, 4, 5, 6),
                           rooms_per_area=1, points_per_room=3000, seed=0)

    results = {"config": vars(args), "runs": []}
    for seed in args.seeds:
        train_loader, test_loader = create_block_dataloaders(
            data_dir=args.data_dir, test_areas={6},
            train_batch_size=args.batch_size, test_batch_size=2,
            train_sampling=args.npoints, test_sampling=args.npoints,
            seed=seed, num_workers=0,
        )
        per_mode = {}
        for mode, static in (("dynamic", False), ("static", True)):
            model = create_model("DeepGraphCnn", num_classes=14,
                                 static_graph=static)
            example = next(iter(train_loader))[0]
            # same seed -> same init: static_graph adds no parameters
            state = create_train_state(model, example, 1e-3, seed=seed)
            rng = jax.random.key(seed)
            step = 0
            for _ in range(args.epochs):
                state, _, step = train_epoch(
                    state, train_loader, rng, None, 10**9, step,
                    verbose=False)
            ev = evaluate(state, test_loader, num_classes=14)
            per_mode[mode] = {"mean_iou": round(ev["mean_iou"], 4),
                              "accuracy": round(ev["accuracy"], 4)}
            print(f"seed {seed} {mode:8s} mIoU {ev['mean_iou']:.4f} "
                  f"OA {ev['accuracy']:.4f}", flush=True)
        results["runs"].append({"seed": seed, **per_mode})

    for metric in ("mean_iou", "accuracy"):
        d = [r["dynamic"][metric] for r in results["runs"]]
        s = [r["static"][metric] for r in results["runs"]]
        results[f"{metric}_dynamic_mean"] = round(float(np.mean(d)), 4)
        results[f"{metric}_static_mean"] = round(float(np.mean(s)), 4)
        results[f"{metric}_gap"] = round(float(np.mean(s) - np.mean(d)), 4)
    print({k: v for k, v in results.items() if k.endswith(("mean", "gap"))},
          flush=True)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
