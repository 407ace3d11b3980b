#!/usr/bin/env python
"""Headline benchmark: S3DIS train-step throughput (points/sec/chip).

Runs the flagship model (PointNet++ SSG — the reference's main train.py
path) at the reference's training configuration (batch 8, 4096
points/block, 14 classes, Adam; reference train.py:17-37) as a full
jitted fwd+bwd+Adam step on one chip, and reports points/sec.

`vs_baseline` is the speedup over the reference PyTorch implementation
executed on CPU at the identical configuration (B=8, N=4096, fwd+bwd+
Adam), measured once on this machine via /tmp-style harness (see
tools/measure_reference_baseline.py): REFERENCE_CPU_POINTS_PER_SEC.
The driver's north star is >=10x this number (BASELINE.json:5).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

from __future__ import annotations

import json
import time

import numpy as np

# PointNet++ (reference implementation, torch CPU, B=8 N=4096 fwd+bwd+Adam),
# measured on this machine 2026-08-16 via tools/measure_reference_baseline.py:
# mean step 10.49s over 3 runs -> 3124 points/sec.
REFERENCE_CPU_POINTS_PER_SEC = 3124.0


def main() -> None:
    import jax
    import jax.numpy as jnp

    from pointseg.models import PointNetPP
    from pointseg.runtime import setup_runtime
    from pointseg.train.state import create_train_state, train_step

    setup_runtime()

    B, N, C = 8, 4096, 14
    rng = np.random.default_rng(0)
    points = jnp.asarray(rng.normal(size=(B, N, 9)).astype(np.float32))
    labels = jnp.asarray(
        np.eye(C, dtype=np.uint8)[rng.integers(0, C, size=(B, N))]
    )
    lengths = jnp.full((B,), N, jnp.int32)

    model = PointNetPP(num_classes=C)
    state = create_train_state(model, points, 1e-3)
    key = jax.random.key(0)

    # NB: under the axon relay, block_until_ready returns before the
    # computation finishes; a host device_get of a scalar is the only
    # reliable synchronization point. Chained steps + one final fetch.
    def sync(x):
        jax.device_get(x.ravel()[0])

    # warmup (compile + a few steps)
    for _ in range(5):
        state, m = train_step(state, points, labels, lengths, key)
    sync(m["loss"])

    # relay throughput varies run to run; report the median of several
    # chained-chunk measurements
    chunk, n_chunks = 10, 6
    per_chunk = []
    for _ in range(n_chunks):
        t0 = time.perf_counter()
        for _ in range(chunk):
            state, m = train_step(state, points, labels, lengths, key)
        sync(m["loss"])
        per_chunk.append((time.perf_counter() - t0) / chunk)
    dt = float(np.median(per_chunk))

    pps = B * N / dt
    print(
        json.dumps(
            {
                "metric": "s3dis_train_points_per_sec_per_chip",
                "value": round(pps, 1),
                "unit": "points/sec",
                "vs_baseline": round(pps / REFERENCE_CPU_POINTS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
