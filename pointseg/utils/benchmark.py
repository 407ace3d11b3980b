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


def benchmark_fn(
    fn: Callable,
    *args,
    num_runs: int = 50,
    warmup: int = 10,
) -> dict:
    """Times `fn(*args)` with proper device synchronization."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(num_runs):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
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
