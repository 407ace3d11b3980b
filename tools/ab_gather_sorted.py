#!/usr/bin/env python
"""Does per-row index SORTING speed up the neighbor gather on TPU?

Motivation (PROFILE_r02_bf16.json): the four edge-feature gathers are
~21 ms of the 82 ms bf16 DGCNN step, running well under the HBM
roofline — per-row fetch cost dominates. kNN emits neighbor indices in
DISTANCE order (scattered addresses); EdgeConv's max-pool and its BN
batch statistics are neighbor-order-INVARIANT, so the k indices of each
row may be freely re-ordered. If XLA's dynamic-gather benefits from
ascending (address-local) row fetches, sorting each length-k neighbor
list is a semantics-preserving speedup.

Measures, at DGCNN scale on the real chip:
  - forward gather with distance-ordered vs row-sorted indices
    (bf16 and f32 tables, 64/128 channels)
  - the jnp.sort(idx, -1) cost itself
  - fwd+bwd through the custom-VJP gather (backward is a one-hot
    matmul -> expected order-insensitive)

Usage: python tools/ab_gather_sorted.py [--out AB_GATHER_SORTED.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def sync(x):
    jax.device_get(jnp.ravel(x)[0])


def timed(fn, *args, reps=30, chunks=4):
    out = fn(*args)
    sync(out)
    per = []
    for _ in range(chunks):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        sync(out)
        per.append((time.perf_counter() - t0) / reps * 1e3)
    return float(np.median(per))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="AB_GATHER_SORTED.json")
    ap.add_argument("--B", type=int, default=8)
    ap.add_argument("--N", type=int, default=4096)
    ap.add_argument("--k", type=int, default=20)
    args = ap.parse_args()

    from pointseg.ops.gather import gather_rows
    from pointseg.ops.knn import knn_indices

    B, N, k = args.B, args.N, args.k
    rng = np.random.default_rng(0)
    # clustered geometry so kNN neighborhoods are spatially real
    centers = rng.normal(size=(B, 32, 3)).astype(np.float32)
    pts = (
        centers[:, rng.integers(0, 32, size=N)]
        + 0.1 * rng.normal(size=(B, N, 3)).astype(np.float32)
    )
    idx_dist = jax.jit(lambda p: knn_indices(p, k))(jnp.asarray(pts))
    idx_sorted = jax.jit(lambda i: jnp.sort(i, axis=-1))(idx_dist)
    sync(idx_sorted)
    # sanity: same neighbor sets
    a = np.sort(np.asarray(idx_dist), axis=-1)
    b = np.asarray(idx_sorted)
    assert (a == b).all()

    idx_flat_d = idx_dist.reshape(B, N * k)
    idx_flat_s = idx_sorted.reshape(B, N * k)

    results = {
        "device": str(jax.devices()[0]),
        "shape": {"B": B, "N": N, "k": k},
        "cases": {},
    }

    fwd = jax.jit(gather_rows)

    def grad_fn():
        @jax.jit
        def f(t, i):
            return jax.grad(lambda tt: jnp.sum(gather_rows(tt, i) ** 2))(t)

        return f

    for C in (64, 128):
        for dt, dtname in ((jnp.bfloat16, "bf16"), (jnp.float32, "f32")):
            table = jnp.asarray(
                rng.normal(size=(B, N, C)).astype(np.float32)
            ).astype(dt)
            sync(table)
            ms_d = timed(fwd, table, idx_flat_d)
            ms_s = timed(fwd, table, idx_flat_s)
            key = f"fwd_C{C}_{dtname}"
            gb = B * N * k * C * table.dtype.itemsize / 1e9
            results["cases"][key] = {
                "dist_order_ms": ms_d,
                "sorted_ms": ms_s,
                "speedup": ms_d / ms_s,
                "gather_GBps_sorted": 2 * gb / (ms_s / 1e3),
            }
            print(f"{key}: dist {ms_d:.3f} ms vs sorted {ms_s:.3f} ms "
                  f"({ms_d / ms_s:.2f}x)")

    # backward (one-hot matmul) — expect order-insensitive
    table = jnp.asarray(rng.normal(size=(B, N, 64)).astype(np.float32))
    g = grad_fn()
    ms_d = timed(g, table, idx_flat_d)
    ms_s = timed(g, table, idx_flat_s)
    results["cases"]["fwdbwd_C64_f32"] = {
        "dist_order_ms": ms_d, "sorted_ms": ms_s, "speedup": ms_d / ms_s,
    }
    print(f"fwdbwd_C64_f32: dist {ms_d:.3f} vs sorted {ms_s:.3f} "
          f"({ms_d / ms_s:.2f}x)")

    # the sort itself
    srt = jax.jit(lambda i: jnp.sort(i, axis=-1))
    results["cases"]["sort_cost_ms"] = timed(srt, idx_dist)
    print(f"sort(idx) cost: {results['cases']['sort_cost_ms']:.3f} ms")

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
