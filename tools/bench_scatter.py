#!/usr/bin/env python
"""Scatter-add strategy shootout on the real chip.

The gather-backward scatter-add is the #1 device cost (PROFILE_r02:
8.9 ms per EdgeConv layer at DGCNN scale, ~19 GB/s). This measures the
candidate replacements at exactly that shape — updates (B, E, C) into a
(B, N, C) table by indices (B, E):

  plain        jnp .at[].add (what autodiff emits today)
  sorted       explicit sort by index, then .at[].add with
               indices_are_sorted=True (XLA's sorted-scatter path)
  onehot_f32   table = onehotT @ updates on the MXU in f32
  onehot_bf16  same with bf16 inputs / f32 accumulation (numerics: the
               update values round to bf16 — gradient-tolerable, not
               parity-tolerable; measured for the option's sake)
  onehot_bf16x2  hi/lo bf16 split of the updates, two full-rate MXU
               matmuls, f32 accumulation — ~1e-5-relative accuracy at
               ~bf16 speed (the parity-tolerable fast option)
  segsum       sort + jax.ops.segment_sum (sorted scatter internally)

Each validates against the plain result (exact for reorderings of the
same f32 additions? NO — f32 addition reorders change low bits, so
comparisons use rtol=1e-3; bf16 looser). Prints one JSON line per
strategy and writes --out.
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
    ap.add_argument("--B", type=int, default=8)
    ap.add_argument("--N", type=int, default=4096)
    ap.add_argument("--E", type=int, default=81920)  # 4096 points * k=20
    ap.add_argument("--C", type=int, default=64)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--out", default="SCATTER_BENCH.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pointseg.runtime import setup_runtime

    setup_runtime()
    B, N, E, C = args.B, args.N, args.E, args.C
    rng = np.random.default_rng(0)
    upd = jnp.asarray(rng.normal(size=(B, E, C)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, N, size=(B, E)).astype(np.int32))

    def sync(x):
        jax.device_get(x.ravel()[0])

    @jax.jit
    def plain(u, i):
        z = jnp.zeros((B, N, C), jnp.float32)
        return z.at[jnp.arange(B)[:, None], i].add(u)

    @jax.jit
    def sorted_scatter(u, i):
        order = jnp.argsort(i, axis=1)
        i_s = jnp.take_along_axis(i, order, axis=1)
        u_s = jnp.take_along_axis(u, order[..., None], axis=1)
        z = jnp.zeros((B, N, C), jnp.float32)
        return z.at[jnp.arange(B)[:, None], i_s].add(
            u_s, indices_are_sorted=True)

    @jax.jit
    def onehot_f32(u, i):
        oh = jax.nn.one_hot(i, N, dtype=jnp.float32)  # (B, E, N)
        return jnp.einsum("ben,bec->bnc", oh, u,
                          preferred_element_type=jnp.float32)

    @jax.jit
    def onehot_f32_highest(u, i):
        # default matmul precision runs bf16 passes on TPU even with an
        # f32 preferred_element_type; HIGHEST forces true f32 products
        oh = jax.nn.one_hot(i, N, dtype=jnp.float32)
        return jnp.einsum("ben,bec->bnc", oh, u,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)

    @jax.jit
    def onehot_bf16(u, i):
        oh = jax.nn.one_hot(i, N, dtype=jnp.bfloat16)
        return jnp.einsum("ben,bec->bnc", oh, u.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)

    @jax.jit
    def onehot_bf16x2(u, i):
        # hi/lo split: u == hi + lo to ~16 mantissa bits, both exactly
        # representable in bf16; the one-hot matrix is 0/1 (exact in
        # bf16). Two full-rate MXU matmuls with f32 accumulation give a
        # ~1e-5-relative result — parity-tolerable, unlike plain bf16.
        oh = jax.nn.one_hot(i, N, dtype=jnp.bfloat16)
        hi = u.astype(jnp.bfloat16)
        lo = (u - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        acc = jnp.einsum("ben,bec->bnc", oh, hi,
                         preferred_element_type=jnp.float32)
        return acc + jnp.einsum("ben,bec->bnc", oh, lo,
                                preferred_element_type=jnp.float32)

    @jax.jit
    def segsum(u, i):
        flat_i = (i + (jnp.arange(B, dtype=jnp.int32) * N)[:, None]).reshape(-1)
        flat_u = u.reshape(B * E, C)
        order = jnp.argsort(flat_i)
        return jax.ops.segment_sum(
            flat_u[order], flat_i[order], num_segments=B * N,
            indices_are_sorted=True).reshape(B, N, C)

    fns = {"plain": plain, "sorted": sorted_scatter,
           "onehot_f32": onehot_f32, "onehot_f32_highest": onehot_f32_highest,
           "onehot_bf16": onehot_bf16,
           "onehot_bf16x2": onehot_bf16x2, "segsum": segsum}
    want = np.asarray(plain(upd, idx))
    results = {"shape": {"B": B, "N": N, "E": E, "C": C},
               "gb_updates": round(B * E * C * 4 / 1e9, 3)}
    for name, fn in fns.items():
        out = fn(upd, idx)
        sync(out)
        got = np.asarray(out)
        tol = 2e-2 if "bf16" in name else 1e-3
        ok = bool(np.allclose(got, want, rtol=tol, atol=tol))
        denom = np.abs(want) + 1e-3
        max_rel = float(np.max(np.abs(got - want) / denom))
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = fn(upd, idx)
        sync(out)
        ms = (time.perf_counter() - t0) / args.reps * 1e3
        gbps = B * E * C * 4 / (ms / 1e3) / 1e9
        results[name] = {"ms": round(ms, 3), "GB_s": round(gbps, 1),
                         "matches_plain": ok, "max_rel_err": max_rel}
        print(json.dumps({name: results[name]}), flush=True)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
