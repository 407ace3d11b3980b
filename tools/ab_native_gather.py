#!/usr/bin/env python
"""Can a hand-written Mosaic row gather beat XLA's dynamic-gather? NO —
this harness documents the structural barriers on real hardware.

Context: neighbor fetches (table (B,N,C), idx (B,M) -> (B,M,C)) are the
dominant device cost after the one-hot backward. AB_GATHER_SORTED_r02
established XLA's gather is per-row-overhead-bound (~10 ns/row, no
locality effect); width-packing is the only lever found so far. This
harness runs the two experimental Pallas kernels in
pointseg/ops/pallas/gather.py against the XLA baseline on the real
chip. Both are rejected by Mosaic (tile-granularity rules — see the
module docstring for the full analysis); the rejection messages are
captured verbatim here as the committed evidence. If a future
JAX/Mosaic release lifts the restriction, this harness immediately
becomes a timing A/B (it times any kernel that compiles and
exactness-checks it against jnp.take_along_axis).

Usage: python tools/ab_native_gather.py [--out AB_NATIVE_GATHER.json]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def sync(x):
    jax.device_get(jnp.ravel(x)[0])


def timed(fn, *args, reps=20, chunks=4):
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


def describe(e: Exception) -> str:
    """Extract the Mosaic rejection line from a relay compile error."""
    text = f"{type(e).__name__}: {e}"
    m = re.search(r"Mosaic failed to compile TPU kernel: ([^\n]+)", text)
    if m:
        return f"MosaicRejected: {m.group(1).strip()}"
    return text[:300]


def try_case(case, key, fn, table, idx, want):
    try:
        got = np.asarray(fn(table, idx))
        case[key + "_exact"] = bool((got == want).all())
        case[key + "_ms"] = timed(fn, table, idx)
    except Exception as e:  # record the failure, keep sweeping
        case[key + "_error"] = describe(e)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="AB_NATIVE_GATHER.json")
    ap.add_argument("--B", type=int, default=8)
    ap.add_argument("--N", type=int, default=4096)
    ap.add_argument("--k", type=int, default=20)
    args = ap.parse_args()

    from pointseg.ops.pallas.gather import gather_rows_dma, gather_rows_flat

    B, N, k = args.B, args.N, args.k
    M = N * k  # 81920 rows at defaults — DGCNN edge-gather scale
    rng = np.random.default_rng(0)
    idx_np = rng.integers(0, N, size=(B, M), dtype=np.int32)
    idx = jnp.asarray(idx_np)
    # absolute row ids for the flat variant
    flat_np = (idx_np + (np.arange(B, dtype=np.int32) * N)[:, None]).reshape(-1)
    flat_idx = jnp.asarray(flat_np)

    baseline = jax.jit(
        lambda t, i: jnp.take_along_axis(t, i[:, :, None], axis=1)
    )

    results = {
        "device": str(jax.devices()[0]),
        "shape": {"B": B, "N": N, "M": M},
        "cases": {},
    }

    for C in (64, 128):
        for dt, dtname in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
            table = jnp.asarray(
                rng.normal(size=(B, N, C)).astype(np.float32)
            ).astype(dt)
            sync(table)
            want = np.asarray(baseline(table, idx))
            gb = 2 * B * M * C * table.dtype.itemsize / 1e9  # rd+wr

            case = {}
            case["xla_ms"] = timed(baseline, table, idx)
            case["xla_GBps"] = gb / (case["xla_ms"] / 1e3)
            case["xla_ns_per_row"] = case["xla_ms"] * 1e6 / (B * M)

            for window in (8, 32):
                try_case(
                    case, f"dma_w{window}",
                    lambda t, i: gather_rows_dma(t, i, window=window),
                    table, idx, want,
                )
            flat_table = jnp.reshape(table, (B * N, C))
            want_flat = want.reshape(B * M, C)
            try_case(
                # chunk=1024 so the idx SMEM fetch itself satisfies the
                # 1-D int32 tile (1024 elements); the row copy is then
                # the quantity Mosaic rules on
                case, "flat_w8",
                lambda t, i: gather_rows_flat(t, i, chunk=1024, window=8),
                flat_table, flat_idx, want_flat,
            )

            name = f"C{C}_{dtname}"
            results["cases"][name] = case
            print(name, json.dumps(case, indent=1))

    # C=1024 f32 (4 KB rows = exactly one 1-D tile): the ONLY row width
    # Mosaic's DMA path accepts — a synthetic probe that measures the
    # per-descriptor cost of row-granular DMA directly. If even this
    # compiled case can't beat XLA's ns/row, descriptor issue cost (not
    # tiling) is the fundamental barrier for narrower production rows.
    Cp, kp = 1024, 2
    Mp = N * kp
    idxp_np = rng.integers(0, N, size=(B, Mp), dtype=np.int32)
    flatp = jnp.asarray(
        (idxp_np + (np.arange(B, dtype=np.int32) * N)[:, None]).reshape(-1)
    )
    tablep = jnp.asarray(
        rng.normal(size=(B * N, Cp)).astype(np.float32)
    )
    sync(tablep)
    rows = B * Mp
    case = {}
    base_flat = jax.jit(lambda t, i: jnp.take_along_axis(
        t, i[:, None], axis=0))
    want_p = np.asarray(base_flat(tablep, flatp))
    gbp = 2 * rows * Cp * 4 / 1e9
    case["xla_ms"] = timed(base_flat, tablep, flatp)
    case["xla_GBps"] = gbp / (case["xla_ms"] / 1e3)
    case["xla_ns_per_row"] = case["xla_ms"] * 1e6 / rows
    for window in (8, 32):
        key = f"flat_w{window}"
        try_case(
            case, key,
            lambda t, i: gather_rows_flat(t, i, chunk=1024, window=window),
            tablep, flatp, want_p,
        )
        if f"{key}_ms" in case:
            case[f"{key}_GBps"] = gbp / (case[f"{key}_ms"] / 1e3)
            case[f"{key}_ns_per_row"] = case[f"{key}_ms"] * 1e6 / rows
    results["cases"]["C1024_f32_probe"] = case
    print("C1024_f32_probe", json.dumps(case, indent=1))

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
