#!/usr/bin/env python
"""Chip A/B: one-hot MXU forward gather vs XLA take_along_axis.

VERDICT round-2 item 3: the XLA dynamic row gather costs ~10 ns/ROW on
v5e regardless of width (descriptor-bound, AB_GATHER_SORTED_r02.json).
For SMALL tables a one-hot matmul fetches the same rows as a dense
contraction — O(N) FLOPs/row, nearly free at N=64/256 — sidestepping
the per-row floor. This measures:

1. op-level: gather_rows at SA-stage shapes (small tables) and at the
   DGCNN edge-gather shape (big table, the rejected case) in f32+bf16,
   onehot vs xla, with an exactness cross-check on chip;
2. model-level: PointNeXt + PointNet++ + DGCNN bf16 train steps with
   the bf16 auto dispatch (POINTSEG_GATHER_FWD_N_BF16) at 0 (= all
   take_along_axis) vs 4096 (= every production table one-hot).

Writes AB_FWD_GATHER_r03.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="AB_FWD_GATHER_r03.json")
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--skip-models", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pointseg.ops import gather as G
    from pointseg.runtime import setup_runtime, watchdog_devices

    setup_runtime()
    devs, err = watchdog_devices(240, probe_compute=True)
    if devs is None:
        print(json.dumps({"error": err}))
        return 1
    print(f"devices: {devs}", flush=True)

    rng = np.random.default_rng(0)
    results: dict = {"device": str(devs[0]), "op_level": {}, "model_level": {}}

    def sync(x):
        jax.device_get(x.ravel()[0])

    def timeit(fn, arg_list, reps):
        out = fn(*arg_list)
        sync(out)
        chunks = []
        for _ in range(4):
            t0 = time.perf_counter()
            for _ in range(reps):
                out = fn(*arg_list)
            sync(out)
            chunks.append((time.perf_counter() - t0) / reps * 1e3)
        return sorted(chunks)[1]  # 2nd-smallest: relay-noise robust

    # ---- op level ----
    # (tag, table_rows N, channels C, fetched rows M) per batch of 8
    shapes = [
        ("sa4_like", 64, 256, 16 * 32),
        ("sa3_like", 256, 128, 64 * 32),
        ("sa2_like", 1024, 96, 256 * 32),
        ("dgcnn_edge", 4096, 64, 4096 * 20),
    ]
    B = 8
    for dtype_name in ("float32", "bfloat16"):
        dt = jnp.dtype(dtype_name)
        for tag, N, C, M in shapes:
            table = jnp.asarray(
                rng.normal(size=(B, N, C)).astype(np.float32)).astype(dt)
            idx = jnp.asarray(rng.integers(0, N, size=(B, M)), jnp.int32)
            rec = {}
            outs = {}
            for mode in ("xla", "onehot"):
                G.set_gather_forward(mode)
                f = jax.jit(G.gather_rows)
                rec[f"{mode}_ms"] = round(timeit(f, (table, idx), args.reps), 3)
                outs[mode] = np.asarray(jax.device_get(f(table, idx)))
            G.set_gather_forward(None)
            rec["exact"] = bool((outs["xla"] == outs["onehot"]).all())
            rec["speedup"] = round(rec["xla_ms"] / rec["onehot_ms"], 2)
            results["op_level"][f"{tag}/{dtype_name}"] = rec
            print(f"{tag}/{dtype_name}: {rec}", flush=True)

    # ---- model level ----
    if not args.skip_models:
        from pointseg.models import create_model
        from pointseg.train import state as state_mod
        from pointseg.train.state import create_train_state

        Bm, Nm = 8, 4096
        pts = jnp.asarray(rng.normal(size=(Bm, Nm, 9)).astype(np.float32))
        lab = jnp.asarray(
            np.eye(14, dtype=np.uint8)[rng.integers(0, 14, (Bm, Nm))])
        ln = jnp.full((Bm,), Nm, jnp.int32)
        key = jax.random.key(0)

        for name in ("PointNeXt", "PointNet++", "DeepGraphCnn"):
            rec = {}
            for thresh in (0, 4096):
                os.environ["POINTSEG_GATHER_FWD_N_BF16"] = str(thresh)
                G.set_gather_forward(None)
                jax.clear_caches()
                model = create_model(name, num_classes=14,
                                     dtype=jnp.bfloat16)
                step = jax.jit(state_mod.train_step.__wrapped__,
                               donate_argnums=(0,))
                state = create_train_state(model, pts, 1e-3)

                def run(s):
                    s2, m = step(s, pts, lab, ln, key)
                    return s2, m

                state, m = run(state)
                sync(m["loss"])
                chunks = []
                for _ in range(4):
                    t0 = time.perf_counter()
                    for _ in range(20):
                        state, m = run(state)
                    sync(m["loss"])
                    chunks.append((time.perf_counter() - t0) / 20 * 1e3)
                rec[f"thresh{thresh}_ms"] = round(sorted(chunks)[1], 2)
                print(f"{name} bf16 thresh={thresh}: "
                      f"{rec[f'thresh{thresh}_ms']} ms", flush=True)
            rec["speedup"] = round(rec["thresh0_ms"] / rec["thresh4096_ms"], 3)
            results["model_level"][f"{name}/bfloat16"] = rec
        os.environ.pop("POINTSEG_GATHER_FWD_N_BF16", None)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
