"""Inference/training micro-benchmarks.

Rebuild of `benchmark_model` (reference models/dgcnn/utils.py:358-412):
warmup runs, N timed runs, mean/std/min/max latency and FPS — with
`block_until_ready` in place of `torch.cuda.synchronize`, plus a
points/sec/chip variant for train steps (the BASELINE.json metric).
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import numpy as np


def _sync(out) -> None:
    """Hard synchronization: fetch one scalar to the host. (On relayed
    TPU runtimes `block_until_ready` can return before execution
    completes; a device_get cannot.)"""
    leaf = jax.tree.leaves(out)[0]
    jax.device_get(leaf.ravel()[0])


def pick_chunk(sync_s: float, pilot_per_step: float, pilot_n: int = 10,
               lo: int = 10, hi: int = 300) -> int:
    """Chunk length putting the single end-of-chunk sync at <=5% of the
    chunk (20x the sync), from a pilot of `pilot_n` calls timed WITH
    one trailing sync. The sync is a ~29-60 ms serial round trip on
    relayed runtimes while dispatches pipeline (AB_SYNC_CHUNK_r05.json)
    — short fixed chunks silently inflate per-call time by sync/chunk.
    Bounds keep slow workloads affordable (`lo`) and cap pathological
    pilots (`hi`)."""
    est = max(pilot_per_step - sync_s / pilot_n, pilot_per_step / 4)
    return int(min(hi, max(lo, round(20 * sync_s / est))))


def benchmark_fn(
    fn: Callable,
    *args,
    num_runs: int = 50,
    warmup: int = 10,
    chunk: int | None = None,
) -> dict:
    """Times `fn(*args)`: dispatches `chunk` calls back-to-back and
    synchronizes once per chunk, amortizing host-device round trips.

    The sync is itself a serial host round trip (~29-60 ms on relayed
    TPU runtimes, AB_SYNC_CHUNK_r05.json) while dispatches pipeline at
    device rate, so with `chunk=None` (default) the chunk length is
    auto-sized from a pilot so the one end-of-chunk fetch is <=5% of
    each chunk — short fixed chunks silently inflate per-call time by
    sync/chunk. Pass an explicit `chunk` to pin the legacy behavior.
    """
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    lat = []
    for _ in range(3):
        t0 = time.perf_counter()
        _sync(out)
        lat.append(time.perf_counter() - t0)
    sync_s = float(np.median(lat))
    if chunk is None:
        n = min(10, num_runs)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        _sync(out)
        chunk = pick_chunk(sync_s, (time.perf_counter() - t0) / n,
                           pilot_n=n)
    times = []
    done = 0
    while done < num_runs:
        n = min(chunk, num_runs - done)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        _sync(out)
        times.append((time.perf_counter() - t0) / n)
        done += n
    times = np.array(times)
    return {
        "mean_s": float(times.mean()),
        "std_s": float(times.std()),
        "min_s": float(times.min()),
        "max_s": float(times.max()),
        "fps": float(1.0 / times.mean()),
        "num_runs": num_runs,
        "chunk": int(chunk),
        "sync_ms": round(sync_s * 1e3, 3),
    }


def benchmark_points_per_sec(
    fn: Callable,
    *args,
    points_per_call: int,
    num_runs: int = 50,
    warmup: int = 10,
) -> dict:
    """points/sec/chip for a step processing `points_per_call` points."""
    stats = benchmark_fn(fn, *args, num_runs=num_runs, warmup=warmup)
    stats["points_per_sec"] = points_per_call / stats["mean_s"]
    return stats
