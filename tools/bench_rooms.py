#!/usr/bin/env python
"""Whole-room streaming eval at REAL room sizes on the chip.

VERDICT round-2 item 5: the streaming sliding-window path was measured
only on 16 small synthetic rooms; real S3DIS rooms span ~1e4..3e6
points (the range `sliding_window._bucket` is built for; reference
models/dgcnn/utils.py:101-126 is the host-loop analogue). This runs
PointNet++ (bf16) whole-room inference at 1e5..3e6 points per room:

  - device streaming path (`predict_single_scene_device`): room ->
    HBM once, lax.scan over grouped windows, geometric bucket padding;
  - host window loop (`predict_single_scene`) at the smallest size as
    the baseline + equality check (each window is a relay round trip,
    so the host loop at 3e6 points would be ~15 min of pure latency —
    measured once at 1e5 and extrapolated).

Writes ROOMS_BENCH_r03.json.
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
    ap.add_argument("--sizes", type=int, nargs="+",
                    default=[100_000, 400_000, 1_000_000, 3_000_000])
    ap.add_argument("--window", type=int, default=4096)
    ap.add_argument("--overlap", type=int, default=512)
    ap.add_argument("--out", default="ROOMS_BENCH_r03.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pointseg.models import PointNetPP
    from pointseg.runtime import setup_runtime, watchdog_devices
    from pointseg.utils.sliding_window import (
        predict_single_scene, predict_single_scene_device,
    )

    setup_runtime()
    devs, err = watchdog_devices(240, probe_compute=True)
    if devs is None:
        print(json.dumps({"error": err}))
        return 1
    print(f"devices: {devs}", flush=True)

    rng = np.random.default_rng(0)
    C = 14
    model = PointNetPP(num_classes=C, dtype=jnp.bfloat16)
    init_pts = jnp.zeros((1, args.window, 9))
    variables = jax.jit(
        lambda k, x: model.init({"params": k}, x, train=False)
    )(jax.random.key(0), init_pts)

    @jax.jit
    def fwd(points, lengths):
        return model.apply(variables, points, train=False).astype(
            jnp.float32)

    results: dict = {"device": str(devs[0]), "window": args.window,
                     "overlap": args.overlap, "rooms": {}}

    def make_room(n):
        pts = rng.random((n, 9), dtype=np.float32)
        pts[:, :3] *= [12.0, 12.0, 3.5]
        return pts

    # host-loop baseline at the smallest size (+ equality check)
    n0 = args.sizes[0]
    room0 = make_room(n0)
    t0 = time.perf_counter()
    preds_h, conf_h = predict_single_scene(
        fwd, room0, args.window, args.overlap)
    host_s = time.perf_counter() - t0
    results["host_loop"] = {
        "points": n0, "seconds": round(host_s, 2),
        "points_per_sec": round(n0 / host_s, 1),
    }
    print(f"host loop {n0} pts: {host_s:.1f}s", flush=True)

    for n in args.sizes:
        room = room0 if n == n0 else make_room(n)
        # first call compiles the bucket program — time it separately
        t0 = time.perf_counter()
        preds, conf = predict_single_scene_device(
            fwd, room, args.window, args.overlap, num_classes=C)
        first_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        preds, conf = predict_single_scene_device(
            fwd, room, args.window, args.overlap, num_classes=C)
        warm_s = time.perf_counter() - t0
        rec = {
            "first_call_s": round(first_s, 2),
            "warm_s": round(warm_s, 3),
            "points_per_sec": round(n / warm_s, 1),
        }
        if n == n0:
            rec["matches_host_loop"] = bool((preds == preds_h).all())
            rec["speedup_vs_host_loop"] = round(host_s / warm_s, 1)
        results["rooms"][str(n)] = rec
        print(f"device stream {n} pts: warm {warm_s:.2f}s "
              f"({n / warm_s / 1e6:.2f}M pts/s)", flush=True)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
