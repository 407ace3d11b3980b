#!/usr/bin/env python
"""Matched f32-vs-bf16 train-step A/B across model families.

Round-2 finding: with the gather backward moved to the one-hot MXU
matmul, DGCNN became copy-stall-bound (bf16 operand retile copies from
default-precision matmuls) and bf16-resident activations cut its step
114.8 -> 79.5 ms (tools/ab_dgcnn_copies.py). This tool measures the
same switch for the other families in one process (matched-session:
relay wall noise is ±15-40% across sessions).
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
    ap.add_argument("--models", nargs="+", default=["PointNet++", "PointNeXt"])
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--npoints", type=int, default=4096)
    ap.add_argument("--out", default="/tmp/ab_bf16_models.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pointseg.models import create_model
    from pointseg.runtime import setup_runtime
    from pointseg.train.state import create_train_state
    from pointseg.train import state as state_mod

    setup_runtime()
    print(f"devices: {jax.devices()}", flush=True)
    B, N = args.batch_size, args.npoints
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(size=(B, N, 9)).astype(np.float32))
    lab = jnp.asarray(np.eye(14, dtype=np.uint8)[rng.integers(0, 14, (B, N))])
    ln = jnp.full((B,), N, jnp.int32)
    key = jax.random.key(0)

    def sync(x):
        jax.device_get(x.ravel()[0])

    results = {}
    for name in args.models:
        for dtype_name in ("float32", "bfloat16"):
            tag = f"{name}/{dtype_name}"
            model = create_model(name, num_classes=14,
                                 dtype=getattr(jnp, dtype_name))
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
            ms = sorted(chunks[1:])[1]
            results[tag] = {"ms_per_step": round(ms, 2),
                            "chunks": [round(c, 2) for c in chunks],
                            "loss": float(jax.device_get(m["loss"]))}
            print(f"{tag:24s} {ms:8.2f} ms/step  chunks={results[tag]['chunks']}",
                  flush=True)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
