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


def benchmark_fn(
    fn: Callable,
    *args,
    num_runs: int = 50,
    warmup: int = 10,
    chunk: int = 10,
) -> dict:
    """Times `fn(*args)`: dispatches `chunk` calls back-to-back and
    synchronizes once per chunk, amortizing host-device round trips."""
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
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
