#!/usr/bin/env python
"""Matched A/B: dynamic vs static-graph DGCNN train step on chip.

kNN selection is 4 x ~5 ms of the 72.7 ms DGCNN bf16 step
(FUSION_TABLE_r03_dgcnn.json) and the kernel itself is at its measured
floor (AB_KNN_TOPK_r02.json), so `static_graph=True` (models/dgcnn.py)
computes the graph once on xyz and reuses it — expected ~-15 ms. Both
variants run in ONE process (relay wall noise is ±15-40% across
sessions; matched A/B only). The accuracy cost of frozen graphs is
measured separately by tools/train_static_graph.py (same-init synthetic
training comparison on CPU).

Writes AB_STATIC_GRAPH_r03.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--npoints", type=int, default=4096)
    ap.add_argument("--bf16", action=argparse.BooleanOptionalAction,
                    default=True)
    ap.add_argument("--out", default="AB_STATIC_GRAPH_r03.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pointseg.models import create_model
    from pointseg.runtime import setup_runtime, watchdog_devices
    from pointseg.train import state as state_mod
    from pointseg.train.state import create_train_state

    setup_runtime()
    init_timeout = float(os.environ.get("POINTSEG_BENCH_INIT_TIMEOUT", "240"))
    devs, err = watchdog_devices(init_timeout, probe_compute=True)
    if devs is None:
        print(json.dumps({"error": err}))
        return 1
    print(f"devices: {devs}", flush=True)

    B, N = args.batch_size, args.npoints
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(size=(B, N, 9)).astype(np.float32))
    lab = jnp.asarray(np.eye(14, dtype=np.uint8)[rng.integers(0, 14, (B, N))])
    ln = jnp.full((B,), N, jnp.int32)
    key = jax.random.key(0)

    def sync(x):
        jax.device_get(x.ravel()[0])

    results = {"batch": [B, N], "dtype": str(dtype.__name__)}

    for tag, static in (("dynamic", False), ("static", True)):
        model = create_model("DeepGraphCnn", num_classes=14, dtype=dtype,
                             static_graph=static)
        train_step = jax.jit(
            state_mod.train_step.__wrapped__, donate_argnums=(0,))
        state = create_train_state(model, pts, 1e-3)
        chunks = []
        for _ in range(4):
            t0 = time.perf_counter()
            for _ in range(args.reps):
                state, m = train_step(state, pts, lab, ln, key)
            sync(m["loss"])
            chunks.append((time.perf_counter() - t0) / args.reps * 1e3)
        ms = sorted(chunks[1:])[len(chunks) // 2 - 1]
        results[tag] = {"ms_per_step": round(ms, 2),
                        "chunks": [round(c, 2) for c in chunks]}
        print(f"{tag:8s} {ms:8.2f} ms/step  chunks="
              f"{[round(c, 1) for c in chunks]}", flush=True)

    if "dynamic" in results and "static" in results:
        d, s = results["dynamic"]["ms_per_step"], results["static"]["ms_per_step"]
        results["speedup"] = round(d / s, 3)
        print(f"speedup {results['speedup']}x ({d} -> {s} ms)", flush=True)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
