#!/usr/bin/env python
"""Chip validation + A/B for the two-level selection kernels.

Checks the production `knn_indices_pallas_2l` / `ball_query_pallas_2l`
(pointseg/ops/pallas/select2l.py) against the flat kernels COMPILED on
the real chip — bit-exactness incl. emission order, tie handling, and
ball-query filler slots — and times both at DGCNN/SA scale. This is the
gate for enabling POINTSEG_SELECT2L (see BENCHMARKS.md "Two-level
selection": one earlier depth-3 variant was exact in interpret mode but
miscompiled on chip, so compiled attestation is mandatory).

Usage: python tools/ab_select2l.py [--out AB_SELECT2L.json]
Exit code 0 iff every exactness check passes.
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
    jax.device_get(jnp.ravel(jax.tree.leaves(x)[0])[0])


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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="AB_SELECT2L.json")
    args = ap.parse_args()

    from pointseg.ops.pallas.ballquery import (
        ball_query_pallas,
        ball_query_pallas_2l,
    )
    from pointseg.ops.pallas.knn import knn_indices_pallas, knn_indices_pallas_2l

    rng = np.random.default_rng(0)
    results = {"device": str(jax.devices()[0]), "checks": {}, "timings_ms": {}}
    ok = True

    def check(name, a, b):
        nonlocal ok
        same = all(
            bool((np.asarray(x) == np.asarray(y)).all()) for x, y in zip(a, b)
        )
        results["checks"][name] = same
        ok = ok and same
        print(f"{name}: exact={same}", flush=True)

    # small-shape depth matrix (exercises heavy lazy refills at depth 2)
    B, N, F, k = 2, 1024, 32, 20
    x = jnp.asarray(rng.normal(size=(B, N, F)).astype(np.float32))
    ref = jax.jit(lambda v: knn_indices_pallas(v, k, tile=128))(x)
    for depth in (2, 3, 4):
        got = jax.jit(
            lambda v, d=depth: knn_indices_pallas_2l(v, k, tile=128, seg=256, depth=d)
        )(x)
        check(f"knn_small_depth{depth}", (ref,), (got,))

    # DGCNN scale, random features + heavy-ties variant
    B, N, F, k = 8, 4096, 64, 20
    x = jnp.asarray(rng.normal(size=(B, N, F)).astype(np.float32))
    flat = jax.jit(lambda v: knn_indices_pallas(v, k))
    two = jax.jit(lambda v: knn_indices_pallas_2l(v, k))
    check("knn_scale", (flat(x),), (two(x),))
    xt = jnp.concatenate(
        [
            jnp.asarray(np.round(rng.normal(size=(B, N, 3)), 1).astype(np.float32)),
            jnp.zeros((B, N, F - 3), jnp.float32),
        ],
        axis=-1,
    )
    check("knn_scale_ties", (flat(xt),), (two(xt),))
    results["timings_ms"]["knn_flat"] = timed(flat, x)
    results["timings_ms"]["knn_2l"] = timed(two, x)

    # SA1-scale ball query (sparse balls -> sentinel fillers) + dense
    coords = jnp.asarray(rng.normal(size=(8, 4096, 3)).astype(np.float32) * 0.5)
    cents = coords[:, :1024]
    for rname, radius in (("sparse_r0.1", 0.1), ("dense_r0.5", 0.5)):
        bq_f = jax.jit(lambda c, p, r=radius: ball_query_pallas(c, p, r, 32))
        bq_2 = jax.jit(lambda c, p, r=radius: ball_query_pallas_2l(c, p, r, 32))
        check(f"ballquery_{rname}", bq_f(cents, coords), bq_2(cents, coords))
        if rname == "sparse_r0.1":
            results["timings_ms"]["ballquery_flat"] = timed(bq_f, cents, coords)
            results["timings_ms"]["ballquery_2l"] = timed(bq_2, cents, coords)

    for kname, v in results["timings_ms"].items():
        print(f"{kname}: {v:.3f} ms")
    results["ok"] = ok
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.out} ok={ok}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
