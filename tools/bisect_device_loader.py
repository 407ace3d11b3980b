#!/usr/bin/env python
"""Bisect the device-loader slowdown seen in PIPELINE_BENCH_r02.json.

Observed: DeviceBlockStore sampling alone costs ~4 ms (PROFILE_r02
"sample") and the PointNet++ train step ~18 ms, yet the combined
DeviceEpochLoader pipeline measured only 0.10x of step-only throughput
(~180 ms/batch). This tool times each composition on the real chip to
locate the pathology:

  step_resident     train_step on one resident batch (baseline)
  sample_only       chained store.sample, step/key threaded on device
  interleave_drop   sample each iter, but train_step consumes the
                    RESIDENT batch (tests dispatch interference alone)
  interleave_feed   sample feeds train_step (the real pipeline)
  loader_feed       DeviceEpochLoader driving train_step (adds the
                    epoch_order/fold_in machinery)

Writes a JSON summary to --out.
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
    ap.add_argument("--num-blocks", type=int, default=10000)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--npoints", type=int, default=4096)
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--out", default="/tmp/bisect_device_loader.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pointseg.data.device import DeviceBlockStore, DeviceEpochLoader
    from pointseg.models import PointNetPP
    from pointseg.runtime import setup_runtime
    from pointseg.train.state import create_train_state, train_step

    setup_runtime()
    print(f"devices: {jax.devices()}", flush=True)
    B, N = args.batch_size, args.npoints
    rng = np.random.default_rng(0)

    counts = rng.integers(2500, 5800, size=args.num_blocks)
    T = int(counts.sum())
    store = DeviceBlockStore(
        rng.normal(size=(T, 9)).astype(np.float32),
        rng.integers(0, 14, size=T).astype(np.uint8), counts)
    order = store.epoch_order(jax.random.key(0), B)

    pts0 = jnp.asarray(rng.normal(size=(B, N, 9)).astype(np.float32))
    lab0 = jnp.asarray(np.eye(14, dtype=np.uint8)[rng.integers(0, 14, (B, N))])
    len0 = jnp.full((B,), N, jnp.int32)
    model = PointNetPP(num_classes=14)
    state = create_train_state(model, pts0, 1e-3)
    key = jax.random.key(0)

    def sync(x):
        jax.device_get(jax.tree.leaves(x)[0].ravel()[0])

    results = {}

    def bench(tag, body, warmup=3):
        nonlocal state
        for _ in range(warmup):
            out = body()
        sync(out)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = body()
        sync(out)
        ms = (time.perf_counter() - t0) / args.reps * 1e3
        results[tag] = round(ms, 2)
        print(f"{tag:18s} {ms:8.2f} ms/iter", flush=True)

    # step on resident batch
    def step_resident():
        nonlocal state
        state, m = train_step(state, pts0, lab0, len0, key)
        return m["loss"]

    bench("step_resident", step_resident)

    # sample only, threading step/key
    th = {"step": jnp.zeros((), jnp.int32), "key": jax.random.key(1)}

    def sample_only():
        pts, oh, ln, th["step"], th["key"] = store.sample(
            order, th["step"] % 1000, th["key"], B, N)
        return pts

    bench("sample_only", sample_only)

    # sample runs but step eats the resident batch
    def interleave_drop():
        nonlocal state
        pts, oh, ln, th["step"], th["key"] = store.sample(
            order, th["step"] % 1000, th["key"], B, N)
        state, m = train_step(state, pts0, lab0, len0, key)
        return m["loss"]

    bench("interleave_drop", interleave_drop)

    # the real pipeline: sample feeds step
    def interleave_feed():
        nonlocal state
        pts, oh, ln, th["step"], th["key"] = store.sample(
            order, th["step"] % 1000, th["key"], B, N)
        state, m = train_step(state, pts, oh, ln, key)
        return m["loss"]

    bench("interleave_feed", interleave_feed)

    # full DeviceEpochLoader driving train_step
    loader = DeviceEpochLoader(store, B, N, drop_last=True)
    it = iter(loader)

    def loader_feed():
        nonlocal state, it
        try:
            pts, oh, ln = next(it)
        except StopIteration:
            it = iter(loader)
            pts, oh, ln = next(it)
        state, m = train_step(state, pts, oh, ln, key)
        return m["loss"]

    bench("loader_feed", loader_feed)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
