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

Equality accounting: the host loop forwards windows ONE at a time while
the device path batches 8 windows per forward — in bf16 those are
different fusion/layout programs, so near-tie argmaxes can legitimately
flip (fp reassociation). The bench therefore reports the mismatch
FRACTION plus the confidence at mismatched points (ties sit near
1/num_classes..0.5), and `--f32-check` repeats the smallest size with a
float32 model, where flips should all but vanish (f32 logit ties are
rare). A LARGE or high-confidence mismatch population in either dtype
would indicate a schedule/accumulation bug, not reassociation.

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
    ap.add_argument("--f32-check", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="also run host+device paths with an f32 model "
                         "at the smallest size and require EXACT "
                         "prediction equality")
    ap.add_argument("--skip-scaling", action="store_true",
                    help="only run the equality checks (reuse a prior "
                         "run's scaling numbers)")
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

    def make_fwd(dtype):
        model = PointNetPP(num_classes=C, dtype=dtype)
        init_pts = jnp.zeros((1, args.window, 9))
        variables = jax.jit(
            lambda k, x: model.init({"params": k}, x, train=False)
        )(jax.random.key(0), init_pts)

        @jax.jit
        def fwd(points, lengths):
            return model.apply(variables, points, train=False).astype(
                jnp.float32)

        return fwd

    fwd = make_fwd(jnp.bfloat16)

    results: dict = {"device": str(devs[0]), "window": args.window,
                     "overlap": args.overlap, "rooms": {}}
    if args.skip_scaling and os.path.exists(args.out):
        with open(args.out) as f:
            results.update(json.load(f))

    def make_room(n):
        pts = rng.random((n, 9), dtype=np.float32)
        pts[:, :3] *= [12.0, 12.0, 3.5]
        return pts

    def mismatch_stats(preds, conf, preds_h, conf_h):
        """Host-vs-device prediction agreement, with the evidence needed
        to tell bf16 near-tie flips (expected) from schedule bugs: the
        confidence distribution AT the mismatched points."""
        mm = preds != preds_h
        cnt = int(mm.sum())
        rec = {"mismatch_count": cnt,
               "mismatch_frac": round(cnt / preds.size, 6)}
        if cnt:
            c = np.concatenate([conf[mm], conf_h[mm]])
            rec["mismatch_conf"] = {
                "mean": round(float(c.mean()), 4),
                "p95": round(float(np.percentile(c, 95)), 4),
                "max": round(float(c.max()), 4),
            }
            rec["matched_conf_mean"] = round(float(conf[~mm].mean()), 4)
        return rec

    # host-loop baseline at the smallest size (+ equality accounting)
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

    sizes = [n0] if args.skip_scaling else args.sizes
    for n in sizes:
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
            rec.update(mismatch_stats(preds, conf, preds_h, conf_h))
            rec["speedup_vs_host_loop"] = round(host_s / warm_s, 1)
            print(f"bf16 host-vs-device mismatches: "
                  f"{rec['mismatch_count']}/{n}", flush=True)
        results["rooms"][str(n)] = rec
        print(f"device stream {n} pts: warm {warm_s:.2f}s "
              f"({n / warm_s / 1e6:.2f}M pts/s)", flush=True)

    if args.f32_check:
        fwd32 = make_fwd(jnp.float32)
        t0 = time.perf_counter()
        ph32, ch32 = predict_single_scene(
            fwd32, room0, args.window, args.overlap)
        host32_s = time.perf_counter() - t0
        pd32, cd32 = predict_single_scene_device(
            fwd32, room0, args.window, args.overlap, num_classes=C)
        rec = mismatch_stats(pd32, cd32, ph32, ch32)
        rec["exact_match"] = rec["mismatch_count"] == 0
        rec["host_seconds"] = round(host32_s, 2)
        results["f32_check"] = rec
        print(f"f32 host-vs-device mismatches: {rec['mismatch_count']}"
              f"/{n0} (exact={rec['exact_match']})", flush=True)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
