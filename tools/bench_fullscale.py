#!/usr/bin/env python
"""Full-S3DIS-scale data-path validation on the real chip.

VERDICT round-2 item 4: the device store was only ever validated at
1.5 GB / 10k blocks while `data/device.py` claims full S3DIS (~10 GB
f32, ~273M points) fits a 16 GB chip alongside a model's step
temporaries. This measures exactly that:

  - synthetic flat tables at S3DIS scale (default 273M points / 100k
    blocks, uniform room-like coordinates);
  - chunked upload time + effective GB/s over the relay
    (pointseg.data.device.upload_flat);
  - HBM footprint from device memory_stats before/after;
  - sampled-epoch training throughput (PointNet++ bf16) through
    DeviceEpochLoader vs the same step on prebaked batches;
  - the DGCNN worst case: its ~4.8 GB of step temporaries coexisting
    with the resident store (--dgcnn, on by default — records OOM +
    fallback advice if it doesn't fit);
  - the policy decision both ways via device_store_or_host_loader's
    budget arithmetic (no 10 GB host dataset files exist here; the
    host-fallback mechanics are covered by
    tests/test_device_data.py::test_device_store_or_host_loader_fallback).

Writes PIPELINE_BENCH_r03.json. Replaces the reference's full-area
training input path (data_processing/block_datasets.py:133-183) at the
scale it actually runs.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def hbm_used(dev) -> int | None:
    try:
        s = dev.memory_stats()
        return int(s.get("bytes_in_use")) if s else None
    except Exception:
        return None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=273_000_000)
    ap.add_argument("--blocks", type=int, default=100_000)
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--dgcnn", action=argparse.BooleanOptionalAction,
                    default=True)
    ap.add_argument("--out", default="PIPELINE_BENCH_r03.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pointseg.data.device import (
        DeviceBlockStore, DeviceEpochLoader, hbm_bytes_limit, upload_flat,
    )
    from pointseg.models import create_model
    from pointseg.runtime import setup_runtime, watchdog_devices
    from pointseg.train import state as state_mod
    from pointseg.train.state import create_train_state

    setup_runtime()
    devs, err = watchdog_devices(240, probe_compute=True)
    if devs is None:
        print(json.dumps({"error": err}))
        return 1
    dev = devs[0]
    print(f"devices: {devs}; hbm limit {hbm_bytes_limit()}", flush=True)

    results: dict = {
        "device": str(dev),
        "hbm_bytes_limit": hbm_bytes_limit(),
        "scale": {"points": args.points, "blocks": args.blocks},
    }

    def sync(x):
        jax.device_get(x.ravel()[0])

    # ---- synthesize flat tables at scale (room-like uniform coords) ----
    rng = np.random.default_rng(0)
    T, M = args.points, args.blocks
    base = T // M
    counts = np.full(M, base, np.int32)
    counts[: T - base * M] += 1
    t0 = time.perf_counter()
    pts = rng.random((T, 9), dtype=np.float32)
    pts[:, :3] *= [8.0, 8.0, 3.0]  # room extents
    labels = rng.integers(0, 14, size=T).astype(np.uint8)
    results["host_synthesis_s"] = round(time.perf_counter() - t0, 1)
    gb = (pts.nbytes + labels.nbytes) / 1e9
    results["store_gb"] = round(gb, 2)
    print(f"synthesized {gb:.1f} GB in {results['host_synthesis_s']}s",
          flush=True)

    # ---- upload ----
    before = hbm_used(dev)
    t0 = time.perf_counter()
    dpts = upload_flat(pts)
    dlab = upload_flat(labels)
    sync(dpts)
    up_s = time.perf_counter() - t0
    store = DeviceBlockStore(dpts, dlab, counts)
    after = hbm_used(dev)
    results["upload_s"] = round(up_s, 1)
    results["upload_gbps"] = round(gb / up_s, 3)
    results["hbm_in_use_after_upload"] = after
    results["store_nbytes"] = store.nbytes
    print(f"upload {up_s:.1f}s ({gb / up_s:.2f} GB/s); "
          f"hbm {before} -> {after}", flush=True)
    del pts, labels  # free ~10 GB host RAM

    # ---- policy arithmetic both ways ----
    limit = hbm_bytes_limit()
    if limit:
        results["policy"] = {
            "store_plus_dgcnn_fits": bool(
                store.nbytes + (5 << 30) <= limit),
            "store_2x_would_fall_back": bool(
                2 * store.nbytes + (5 << 30) > limit),
        }

    # ---- PointNet++ bf16 training through the device loader ----
    B, N = 8, 4096
    key = jax.random.key(0)
    model = create_model("PointNet++", num_classes=14, dtype=jnp.bfloat16)
    step = jax.jit(state_mod.train_step.__wrapped__, donate_argnums=(0,))
    tstate = create_train_state(model, jnp.zeros((B, N, 9)), 1e-3)

    loader = DeviceEpochLoader(store, B, N, seed=0)
    it = iter(loader)
    batch = next(it)
    tstate, m = step(tstate, *batch, key)
    sync(m["loss"])  # compile both sampler and step

    # pure step on a fixed batch
    fixed = batch
    chunks = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(args.steps):
            tstate, m = step(tstate, *fixed, key)
        sync(m["loss"])
        chunks.append((time.perf_counter() - t0) / args.steps)
    pure = float(np.median(chunks))

    # sampled pipeline (device sampler feeding the step)
    chunks = []
    for _ in range(3):
        it = iter(loader)
        t0 = time.perf_counter()
        n_done = 0
        for batch in it:
            tstate, m = step(tstate, *batch, key)
            n_done += 1
            if n_done >= args.steps:
                break
        sync(m["loss"])
        chunks.append((time.perf_counter() - t0) / n_done)
    piped = float(np.median(chunks))
    results["pointnetpp_bf16"] = {
        "pure_step_ms": round(pure * 1e3, 2),
        "device_pipeline_ms": round(piped * 1e3, 2),
        "pipeline_efficiency": round(pure / piped, 3),
        "points_per_sec": round(B * N / piped, 1),
    }
    print(f"PointNet++ bf16: pure {pure * 1e3:.2f} ms, piped "
          f"{piped * 1e3:.2f} ms", flush=True)

    # ---- DGCNN worst case next to the resident store ----
    if args.dgcnn:
        try:
            model = create_model("DeepGraphCnn", num_classes=14,
                                 dtype=jnp.bfloat16)
            dstep = jax.jit(state_mod.train_step.__wrapped__,
                            donate_argnums=(0,))
            dstate = create_train_state(model, jnp.zeros((B, N, 9)), 1e-3)
            it = iter(DeviceEpochLoader(store, B, N, seed=1))
            batch = next(it)
            dstate, m = dstep(dstate, *batch, key)
            sync(m["loss"])
            t0 = time.perf_counter()
            n_done = 0
            for batch in it:
                dstate, m = dstep(dstate, *batch, key)
                n_done += 1
                if n_done >= 20:
                    break
            sync(m["loss"])
            ms = (time.perf_counter() - t0) / n_done * 1e3
            results["dgcnn_bf16_next_to_store"] = {
                "ok": True, "step_ms": round(ms, 2),
                "hbm_in_use": hbm_used(dev),
            }
            print(f"DGCNN bf16 with store resident: {ms:.1f} ms/step",
                  flush=True)
        except Exception as e:  # noqa: BLE001 — record the OOM outcome
            from pointseg.runtime import is_oom_error, oom_advice

            results["dgcnn_bf16_next_to_store"] = {
                "ok": False, "oom": is_oom_error(e),
                "error": f"{type(e).__name__}: {e}"[:500],
                "advice": oom_advice(B, N) if is_oom_error(e) else None,
            }
            print(f"DGCNN next to store FAILED: {type(e).__name__}",
                  flush=True)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
