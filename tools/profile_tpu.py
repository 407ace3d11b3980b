#!/usr/bin/env python
"""Profile-driven analysis on the real TPU chip (VERDICT.md round-1 #6).

Captures xplane traces (jax.profiler) for the hot paths the round-1
report could only wall-clock:

  gather    take_along_axis neighbor fetch at SA1 scale
  ballq_k   Pallas ball query at k=1 vs k=20 (the "base cost" question)
  knn_k     Pallas kNN at k=1 vs k=20
  pnpp      full PointNet++ train step
  dgcnn     full DGCNN train step

Each section runs in its own trace directory; the traces are then
decoded with tools/xplane.py (no tensorflow needed) and the per-op
device totals written to a JSON + human-readable summary. Wall times
(relay-synced) are recorded alongside as ground truth in case the
relay strips device planes.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.xplane import line_busy, op_totals, parse_xspace  # noqa: E402

_ASYNC = ("copy-start", "slice-start", "copy-done", "slice-done",
          "all-gather-start", "collective-permute-start")


def _is_async(name: str) -> bool:
    return any(a in name for a in _ASYNC)


def _op_family(name: str) -> str:
    import re

    m = re.match(r"%([a-z0-9_-]+?)[.\s=]", name + " ")
    return m.group(1).rstrip("-0123456789.") if m else name[:24]


def sync(x):
    import jax

    jax.device_get(np.asarray(x).ravel()[0] if isinstance(x, np.ndarray)
                   else jax.tree.leaves(x)[0].ravel()[0])


def timed(fn, args, reps=20):
    import jax

    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / reps


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace-root", default="/tmp/pointseg_profile")
    ap.add_argument("--out", default="PROFILE_r02.json")
    ap.add_argument("--sections", nargs="+",
                    default=["gather", "sample", "h2d", "ballq_k", "knn_k",
                             "pnpp", "dgcnn"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pointseg import ops
    from pointseg.runtime import setup_runtime

    setup_runtime()
    print(f"devices: {jax.devices()}", flush=True)

    rng = np.random.default_rng(0)
    results: dict = {"device": str(jax.devices()[0]), "sections": {}}

    def capture(tag, fn, call_args, reps=10):
        """Wall-time + xplane capture for one jitted callable."""
        wall = timed(fn, call_args, reps=reps)
        tdir = os.path.join(args.trace_root, tag)
        os.makedirs(tdir, exist_ok=True)
        with jax.profiler.trace(tdir):
            for _ in range(reps):
                out = fn(*call_args)
            sync(out)
        sec = {"wall_ms_per_call": round(wall * 1e3, 3), "reps": reps}
        pbs = glob.glob(os.path.join(tdir, "**", "*.xplane.pb"), recursive=True)
        if pbs:
            planes = parse_xspace(max(pbs, key=os.path.getmtime))
            sec["planes"] = [p.name for p in planes]
            # Overlap-aware view: interval-union busy time per hardware
            # queue (async copy windows overlap compute; summing raw
            # durations across lines double-counts — round-2 lesson).
            sec["line_busy"] = {
                k: {kk: round(vv, 3) if isinstance(vv, float) else vv
                    for kk, vv in v.items()}
                for k, v in line_busy(planes).items()}
            tot = op_totals(planes, plane_filter="TPU",
                            exact_line="XLA Ops")
            if not tot:
                tot = op_totals(planes, plane_filter="")
            sync_tot = {k: v for k, v in tot.items() if not _is_async(k)}
            async_tot = {k: v for k, v in tot.items() if _is_async(k)}
            # FULL enumeration (VERDICT r03 weak #1: a top-N table is
            # not an account) — everything on the compute line, per
            # call, split sync/async; fusion_table.py --decompose
            # reconciles these against the line-busy union and the wall
            sec["ops_line_totals"] = {
                "sync_ms_per_call": round(
                    sum(v["ms"] for v in sync_tot.values()) / reps, 4),
                "async_ms_per_call": round(
                    sum(v["ms"] for v in async_tot.values()) / reps, 4),
                "distinct_sync_ops": len(sync_tot),
                "distinct_async_ops": len(async_tot),
                "async_by_family_per_call_ms": {},
            }
            afam: dict = {}
            for k, v in async_tot.items():
                afam[_op_family(k)] = afam.get(_op_family(k), 0.0) + v["ms"]
            sec["ops_line_totals"]["async_by_family_per_call_ms"] = {
                k: round(v / reps, 4)
                for k, v in sorted(afam.items(), key=lambda kv: -kv[1])}
            fam: dict = {}
            for k, v in sync_tot.items():
                r = fam.setdefault(_op_family(k), {"ms": 0.0, "count": 0})
                r["ms"] += v["ms"]
                r["count"] += v["count"]
            sec["op_families_per_call_ms"] = {
                k: round(v["ms"] / reps, 4)
                for k, v in sorted(fam.items(), key=lambda kv: -kv[1]["ms"])
                if v["ms"] / reps > 0.005}
            top = sorted(sync_tot.items(), key=lambda kv: -kv[1]["ms"])[:60]
            sec["top_ops"] = [
                {"op": k, "total_ms": round(v["ms"], 3), "count": v["count"],
                 "per_call_ms": round(v["ms"] / reps, 4), "line": v["line"]}
                for k, v in top
            ]
        else:
            sec["top_ops"] = []
            sec["note"] = "no xplane.pb produced"
        results["sections"][tag] = sec
        print(f"[{tag}] wall {sec['wall_ms_per_call']}ms/call, "
              f"{len(sec['top_ops'])} profiled ops", flush=True)

    B, N, C, K, H = 8, 4096, 1024, 32, 64

    if "gather" in args.sections:
        table = jnp.asarray(rng.normal(size=(B, N, H)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, N, size=(B, C, K)).astype(np.int32))

        @jax.jit
        def g(t, i):
            return jnp.take_along_axis(t[:, None, :, :], i[..., None], axis=2)

        capture("gather", g, (table, idx))

    if "sample" in args.sections:
        # device-resident sampler at PIPELINE_BENCH scale (10k blocks)
        from pointseg.data.device import DeviceBlockStore

        counts = rng.integers(2500, 5800, size=10000)
        T = int(counts.sum())
        store = DeviceBlockStore(
            rng.normal(size=(T, 9)).astype(np.float32),
            rng.integers(0, 14, size=T).astype(np.uint8), counts)
        order = store.epoch_order(jax.random.key(0), B)
        key = jax.random.key(1)

        def samp(step):
            return store.sample(order, step, key, B, N)

        capture("sample", samp, (jnp.zeros((), jnp.int32),))

    if "h2d" in args.sections:
        # host->device batch transfer (the host loader's per-step cost)
        pts = rng.normal(size=(B, N, 9)).astype(np.float32)
        lab = np.eye(14, dtype=np.uint8)[rng.integers(0, 14, size=(B, N))]

        def h2d():
            a = jax.device_put(pts)
            b = jax.device_put(lab)
            return a

        capture("h2d", h2d, ())

    coords = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32)) * 0.2

    if "ballq_k" in args.sections:
        cents = coords[:, :C]
        for k in (1, 20, 32):
            fn = jax.jit(lambda c, x, k=k: ops.ball_query(c, x, 0.2, k))
            capture(f"ballq_k{k}", fn, (cents, coords))

    if "knn_k" in args.sections:
        x = jnp.asarray(rng.normal(size=(B, N, 9)).astype(np.float32))
        for k in (1, 20):
            fn = jax.jit(lambda a, k=k: ops.knn_indices(a, k))
            capture(f"knn_k{k}", fn, (x,))

    def model_step(name, dtype=None, **extra):
        import jax.numpy as jnp

        from pointseg.models import create_model
        from pointseg.train.state import create_train_state, train_step

        kwargs = {"dtype": dtype} if dtype is not None else {}
        kwargs.update(extra)
        model = create_model(name, num_classes=14, **kwargs)
        pts = jnp.asarray(rng.normal(size=(B, N, 9)).astype(np.float32))
        lab = jnp.asarray(np.eye(14, dtype=np.uint8)[
            rng.integers(0, 14, size=(B, N))])
        ln = jnp.full((B,), N, jnp.int32)
        state = create_train_state(model, pts, 1e-3)
        key = jax.random.key(0)

        def step(s):
            s2, m = train_step(s, pts, lab, ln, key)
            return s2, m

        # keep functional shape for capture(): state is threaded manually
        holder = {"s": state}

        def fn():
            holder["s"], m = train_step(holder["s"], pts, lab, ln, key)
            return m["loss"]

        return fn

    if "pnpp" in args.sections:
        capture("pnpp_step", model_step("PointNet++"), ())
    if "dgcnn" in args.sections:
        capture("dgcnn_step", model_step("DeepGraphCnn"), ())
    if "dgcnn_bf16" in args.sections:
        import jax.numpy as jnp

        capture("dgcnn_bf16_step",
                model_step("DeepGraphCnn", dtype=jnp.bfloat16), ())
    if "pnpp_bf16" in args.sections:
        import jax.numpy as jnp

        capture("pnpp_bf16_step",
                model_step("PointNet++", dtype=jnp.bfloat16), ())
    if "pointnet_bf16" in args.sections:
        import jax.numpy as jnp

        capture("pointnet_bf16_step",
                model_step("PointNet", dtype=jnp.bfloat16), ())
    if "pointnet_bf16_scan" in args.sections:
        # The fused 10-step scan program: one dispatch per 10 steps.
        # Captured to arbitrate wall vs device-plane time — per-step
        # wall is identical to the per-dispatch path on this model, so
        # either the device genuinely takes ~5 ms/step inside the scan
        # too, or the relay charges per-step overhead even within one
        # module execution.
        import jax.numpy as jnp

        from pointseg.models import create_model
        from pointseg.train import state as state_mod
        from pointseg.train.state import create_train_state

        model = create_model("PointNet", num_classes=14,
                             dtype=jnp.bfloat16)
        pts = jnp.asarray(rng.normal(size=(B, N, 9)).astype(np.float32))
        lab = jnp.asarray(np.eye(14, dtype=np.uint8)[
            rng.integers(0, 14, size=(B, N))])
        ln = jnp.full((B,), N, jnp.int32)
        st = create_train_state(model, pts, 1e-3)
        key = jax.random.key(0)
        holder = {"s": st}

        def scan_fn():
            holder["s"], ms = state_mod.train_steps_repeated(
                holder["s"], pts, lab, ln, key, n_steps=10)
            return ms["loss"]

        capture("pointnet_bf16_scan10", scan_fn, ())
    if "pnext_bf16" in args.sections:
        import jax.numpy as jnp

        capture("pnext_bf16_step",
                model_step("PointNeXt", dtype=jnp.bfloat16), ())
    if "dgcnn_static_bf16" in args.sections:
        import jax.numpy as jnp

        capture("dgcnn_static_bf16_step",
                model_step("DeepGraphCnn", dtype=jnp.bfloat16,
                           static_graph=True), ())

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
