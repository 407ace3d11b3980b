#!/usr/bin/env python
"""Measure neighbor-gather throughput vs row width on the real chip.

Motivation (PROFILE_r02_pnpp_bf16.json): SA1's two gathers use the SAME
ball-query indices but run separately — bf16 features (64 B rows,
9.6 GB/s) and f32 raw coords (12 B rows, 2.1 GB/s). Per-row fetch
overhead, not bytes, dominates at small widths, so packing both into
one wider-row gather should approach the wide-row rate. This tool maps
the row-width -> rate curve (fwd and fwd+bwd with the one-hot custom
VJP) and times the packed-vs-separate SA1 configuration to size the win
before changing GroupedFirstLayer.

Usage: python tools/ab_gather_width.py [--out AB_GATHER_WIDTH.json]
"""

from __future__ import annotations

import argparse
import functools
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
    ap.add_argument("--out", default="AB_GATHER_WIDTH.json")
    ap.add_argument("--B", type=int, default=8)
    ap.add_argument("--N", type=int, default=4096)
    ap.add_argument("--C", type=int, default=1024)
    ap.add_argument("--K", type=int, default=32)
    args = ap.parse_args()

    from pointseg.ops.gather import gather_rows

    rng = np.random.default_rng(0)
    idx = jnp.asarray(
        rng.integers(0, args.N, size=(args.B, args.C, args.K)), jnp.int32
    )
    E = args.B * args.C * args.K

    results = {"shape": {"B": args.B, "N": args.N, "C": args.C,
                         "K": args.K, "E": E}, "widths": {}}

    @functools.partial(jax.jit, static_argnums=())
    def fwd(t, i):
        return gather_rows(t, i)

    def bwd_fn():
        @jax.jit
        def f(t, i):
            def loss(tt):
                return jnp.sum(gather_rows(tt, i) ** 2)

            return jax.grad(loss)(t)

        return f

    grad_f = bwd_fn()

    for ch, dt in [(3, jnp.float32), (16, jnp.bfloat16), (32, jnp.bfloat16),
                   (38, jnp.bfloat16), (32, jnp.float32), (64, jnp.bfloat16),
                   (64, jnp.float32), (128, jnp.bfloat16), (128, jnp.float32)]:
        table = jnp.asarray(
            rng.normal(size=(args.B, args.N, ch)), dtype=dt
        )
        bytes_row = ch * table.dtype.itemsize
        ms_f = timed(fwd, table, idx)
        ms_b = timed(grad_f, table, idx)
        gbs = E * bytes_row / ms_f * 1e3 / 1e9
        key = f"{ch}x{dt.__name__}"
        results["widths"][key] = {
            "row_bytes": bytes_row,
            "fwd_ms": round(ms_f, 3),
            "fwd_GBps": round(gbs, 2),
            "fwd_bwd_ms": round(ms_b, 3),
        }
        print(key, results["widths"][key], flush=True)

    # the actual SA1 decision: separate (32ch bf16 + 3ch f32) vs packed
    # 38ch bf16 (features + hi/lo-split coords)
    feat = jnp.asarray(rng.normal(size=(args.B, args.N, 32)), jnp.bfloat16)
    coords = jnp.asarray(rng.normal(size=(args.B, args.N, 3)), jnp.float32)

    @jax.jit
    def separate(f, c, i):
        return gather_rows(f, i), gather_rows(c, i)

    @jax.jit
    def packed(f, c, i):
        # EXACT f32 coords as 2 bf16 lanes each via bitcast (no hi/lo
        # arithmetic split — bit-identical roundtrip)
        cb = jax.lax.bitcast_convert_type(c, jnp.bfloat16)  # (B,N,3,2)
        cb = cb.reshape(c.shape[0], c.shape[1], 6)
        buf = jnp.concatenate([f, cb], axis=-1)  # (B, N, 38) bf16
        g = gather_rows(buf, i)
        gf = g[..., :32]
        gcb = g[..., 32:38].reshape(*g.shape[:-1], 3, 2)
        gc = jax.lax.bitcast_convert_type(gcb, jnp.float32)
        return gf, gc

    def two_sync(o):
        sync(o[0])

    for name, fn in [("separate", separate), ("packed", packed)]:
        out = fn(feat, coords, idx)
        two_sync(out)
        per = []
        for _ in range(4):
            t0 = time.perf_counter()
            for _ in range(30):
                out = fn(feat, coords, idx)
            two_sync(out)
            per.append((time.perf_counter() - t0) / 30 * 1e3)
        results[name + "_ms"] = round(float(np.median(per)), 3)
        print(name, results[name + "_ms"], flush=True)

    gf_s, gc_s = separate(feat, coords, idx)
    gf_p, gc_p = packed(feat, coords, idx)
    results["packed_feat_exact"] = bool(jnp.all(gf_s == gf_p))
    err = float(jnp.max(jnp.abs(gc_s - gc_p)))
    results["packed_coord_max_abs_err"] = err
    print("coord err", err, flush=True)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
