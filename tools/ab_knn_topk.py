#!/usr/bin/env python
"""A/B: Pallas kNN selection vs XLA top_k vs TPU approx_max_k.

The Pallas kNN kernel (ops/pallas/knn.py) does k full masking passes
over the VMEM distance tile — ~5 ms device time at DGCNN scale
(B=8, N=4096, F=64, k=20), the #2 cost in the bf16 DGCNN step. XLA's
`lax.top_k` was measured at ~70 ms at this shape (BENCHMARKS.md round-1
table), but `lax.approx_max_k` — which lowers to the TPU PartialReduce
op — was never measured. This tool closes that question:

  1. pallas            — knn_indices_pallas (current TPU path)
  2. gram+top_k        — the pure-XLA oracle
  3. gram+approx(1.0)  — approx_max_k, recall_target=1.0
  4. gram+approx(.95)  — approx_max_k, recall_target=0.95 (lossy ref pt)

plus an exactness/tie audit of each against the oracle on data with
duplicated rows (pad_mode="repeat" creates exact distance ties at real
scale, so tie ORDER matters for parity, not just the selected set).

Usage: python tools/ab_knn_topk.py [--out AB_KNN_TOPK.json]
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


def gram_neg_d2(x):
    x = x.astype(jnp.float32)
    x2 = jnp.sum(x * x, axis=-1)
    gram = jnp.einsum(
        "bnf,bmf->bnm",
        x,
        x,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return 2.0 * gram - x2[:, :, None] - x2[:, None, :]


@functools.partial(jax.jit, static_argnums=(1,))
def knn_topk(x, k):
    _, idx = jax.lax.top_k(gram_neg_d2(x), k)
    return idx.astype(jnp.int32)


@functools.partial(jax.jit, static_argnums=(1, 2))
def knn_approx(x, k, recall):
    _, idx = jax.lax.approx_max_k(
        gram_neg_d2(x), k, recall_target=recall, aggregate_to_topk=True
    )
    return idx.astype(jnp.int32)


def sync(x):
    jax.device_get(jnp.ravel(x)[0])


def time_fn(fn, x, reps=30, chunks=4):
    out = fn(x)
    sync(out)
    per = []
    for _ in range(chunks):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(x)
        sync(out)
        per.append((time.perf_counter() - t0) / reps * 1e3)
    return float(np.median(per))


def audit(idx, ref_idx, neg_d2_host):
    """set recall + exact (order-sensitive) match rate vs the oracle."""
    idx = np.asarray(idx)
    ref = np.asarray(ref_idx)
    exact = float(np.mean(np.all(idx == ref, axis=-1)))
    # set recall: fraction of oracle neighbors present per row
    B, N, K = ref.shape
    recall = np.mean(
        [
            len(set(idx[b, n]) & set(ref[b, n])) / K
            for b in range(B)
            for n in range(0, N, 37)
        ]
    )
    # value recall: do the selected entries have the same distances
    # (ties make different index sets equally valid)?
    d = neg_d2_host
    rows = [(b, n) for b in range(B) for n in range(0, N, 37)]
    vals_equal = np.mean(
        [
            np.allclose(
                np.sort(d[b, n, idx[b, n]]), np.sort(d[b, n, ref[b, n]])
            )
            for (b, n) in rows
        ]
    )
    return {
        "exact_row_match": round(exact, 4),
        "set_recall": round(float(recall), 4),
        "value_recall": round(float(vals_equal), 4),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="AB_KNN_TOPK.json")
    ap.add_argument("--B", type=int, default=8)
    ap.add_argument("--N", type=int, default=4096)
    ap.add_argument("--F", type=int, default=64)
    ap.add_argument("--k", type=int, default=20)
    args = ap.parse_args()

    
    from pointseg.ops.pallas.knn import knn_indices_pallas

    rng = np.random.default_rng(0)
    x_host = rng.normal(size=(args.B, args.N, args.F)).astype(np.float32)
    # duplicate a block of rows -> exact distance ties (pad_mode=repeat
    # produces exactly this at eval scale)
    x_host[:, -64:] = x_host[:, :64]
    x = jnp.asarray(x_host)

    pallas_fn = jax.jit(
        functools.partial(knn_indices_pallas, k=args.k)
    )

    results = {"shape": vars(args)}
    ref_idx = np.asarray(knn_topk(x, args.k))
    neg_d2_host = np.asarray(jax.jit(gram_neg_d2)(x))

    cands = {
        "pallas": lambda a: pallas_fn(a),
        "gram+top_k": lambda a: knn_topk(a, args.k),
        "gram+approx_1.0": lambda a: knn_approx(a, args.k, 1.0),
        "gram+approx_0.95": lambda a: knn_approx(a, args.k, 0.95),
    }
    for name, fn in cands.items():
        try:
            ms = time_fn(fn, x)
            aud = audit(fn(x), ref_idx, neg_d2_host)
            results[name] = {"ms": round(ms, 3), **aud}
        except Exception as e:  # noqa: BLE001
            results[name] = {"error": f"{type(e).__name__}: {e}"}
        print(name, "->", results[name], flush=True)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
