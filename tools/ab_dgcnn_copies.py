#!/usr/bin/env python
"""Matched A/B of DGCNN train-step variants targeting the copy stalls.

PROFILE_r02_onehot.json showed the DGCNN step is 63 ms compute +
~51 ms of compute-queue stalls on async copies: ~32 ms waiting on
bf16 operand-retile copies (default-precision dense matmuls) and
~13 ms on f32[8,81920,C] cotangent layout copies feeding the one-hot
gather backward. Variants, all in ONE process (relay wall noise is
±15-40% across sessions, matched A/B only):

  base          current defaults (onehot backward, default matmul prec)
  onehot_t      pre-transposed one-hot backward (natural ct layout)
  prec_f32      jax.default_matmul_precision('float32') for the step
  f32+onehot_t  both

Each variant is a separately-jitted step; reports wall ms over --reps
steps (median of 3 chunks) + writes JSON.
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
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--npoints", type=int, default=4096)
    ap.add_argument("--out", default="/tmp/ab_dgcnn_copies.json")
    ap.add_argument("--variants", nargs="*", default=None,
                    help="subset of variant tags to run (default: all)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pointseg.models import create_model
    from pointseg.ops.gather import set_scatter_strategy
    from pointseg.runtime import setup_runtime
    from pointseg.train.state import create_train_state
    from pointseg.train import state as state_mod

    setup_runtime()
    print(f"devices: {jax.devices()}", flush=True)
    B, N = args.batch_size, args.npoints
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(size=(B, N, 9)).astype(np.float32))
    lab = jnp.asarray(np.eye(14, dtype=np.uint8)[rng.integers(0, 14, (B, N))])
    ln = jnp.full((B,), N, jnp.int32)
    key = jax.random.key(0)
    model = create_model("DeepGraphCnn", num_classes=14)
    model_bf16 = create_model("DeepGraphCnn", num_classes=14,
                              dtype=jnp.bfloat16)

    def sync(x):
        jax.device_get(x.ravel()[0])

    results = {}

    from pointseg.nn.blocks import set_edge_gather_upcast

    def run(tag, strategy, precision, use_model=None, gather_upcast=False):
        if args.variants is not None and tag not in args.variants:
            return
        # fresh jit per variant: the scatter strategy is read at trace
        # time and is NOT part of jax's jit cache key
        train_step = jax.jit(
            state_mod.train_step.__wrapped__, donate_argnums=(0,))
        # fresh state per variant (donation consumes the old one anyway)
        set_scatter_strategy(strategy)
        set_edge_gather_upcast(gather_upcast)
        try:
            if precision:
                ctx = jax.default_matmul_precision(precision)
            else:
                import contextlib

                ctx = contextlib.nullcontext()
            with ctx:
                state = create_train_state(use_model or model, pts, 1e-3)

                chunks = []
                for chunk in range(4):
                    t0 = time.perf_counter()
                    for _ in range(args.reps):
                        state, m = train_step(state, pts, lab, ln, key)
                    sync(m["loss"])
                    dt = (time.perf_counter() - t0) / args.reps * 1e3
                    chunks.append(dt)
                ms = sorted(chunks[1:])[len(chunks[1:]) // 2]  # median, skip warm chunk
                results[tag] = {"ms_per_step": round(ms, 2),
                                "chunks": [round(c, 2) for c in chunks],
                                "loss": float(jax.device_get(m["loss"]))}
                print(f"{tag:14s} {ms:8.2f} ms/step  chunks={chunks}", flush=True)
        finally:
            set_scatter_strategy(None)
            set_edge_gather_upcast(False)

    run("base", "onehot", None)
    run("onehot_t", "onehot_t", None)
    run("prec_f32", "onehot", "float32")
    run("f32+onehot_t", "onehot_t", "float32")
    # bf16-resident activations (params stay f32, flax dtype arg):
    # pre-one-hot this measured neutral — the scatter dominated; with
    # the step now copy-stall-bound the converts/retiles may matter
    run("bf16_act", "onehot", None, use_model=model_bf16)
    run("bf16_act+bf16x2", "bf16x2", None, use_model=model_bf16)
    # gather edge rows in f32 (256 B rows gather ~4x faster per byte
    # than 128 B bf16 rows on the relay chip) — see blocks.py knob
    run("bf16_act+f32gather", "onehot", None, use_model=model_bf16,
        gather_upcast=True)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
