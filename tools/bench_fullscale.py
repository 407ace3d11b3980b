#!/usr/bin/env python
"""Full-S3DIS-scale data-path validation on the real chip.

VERDICT round-2 item 4: the device store was only ever validated at
1.5 GB / 10k blocks while `data/device.py` claimed full S3DIS (~10 GB
f32, ~273M points) fits "a 16 GB chip". The round-3 measurement that
reshaped the claim: the relay HBM GRANT is smaller than the chip
(allocation probe below), so the flat f32 layout does NOT fit — the
16 B/point `CompactDeviceStore` (4.4 GB for all of S3DIS) is the
full-scale resident path. This measures exactly that:

  - an HBM grant allocation probe (successive 512 MB buffers to OOM);
  - synthetic CANONICAL-format tables at S3DIS scale (default 273M
    points / 100k blocks: u8 rgb, rel = xyz - formula center — the
    compact store's packing domain);
  - the `device_store_or_host_loader` policy arithmetic at this grant
    (flat doomed, compact fits);
  - pack time, chunked upload time + effective GB/s over the relay;
  - sampled-epoch training throughput (PointNet++ bf16) through
    DeviceEpochLoader on the packed layout vs the same step on a fixed
    batch (the unpack math rides the sampler);
  - the DGCNN worst case: its ~4.8 GB of step temporaries coexisting
    with the resident store (records OOM + fallback advice if not).

Writes PIPELINE_BENCH_r03.json. Replaces the reference's full-area
training input path (data_processing/block_datasets.py:133-183) at the
scale it actually runs.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def hbm_used(dev) -> int | None:
    try:
        s = dev.memory_stats()
        return int(s.get("bytes_in_use")) if s else None
    except Exception:
        return None


def probe_grant(step_mb: int = 512, cap_gb: int = 20) -> dict:
    """Allocates successive `step_mb` device buffers until OOM; returns
    the usable grant.

    RUN THIS IN ITS OWN PROCESS (``--probe-grant-only``): on the relay,
    neither Python GC nor explicit jax.Array.delete() returns the
    probe's buffers to the grant — a 4.4 GB zeros OOM'd 60+ s after
    delete()-ing all 15.5 GB of probe buffers (measured twice). Only
    process exit releases them, and release can lag exit by minutes
    (the same lag shows up as 'relay wedged' right after an OOM'd
    process dies)."""
    import jax
    import jax.numpy as jnp

    from pointseg.runtime import is_oom_error

    held = []
    fill = jax.jit(lambda n: jnp.zeros((n,), jnp.uint8), static_argnums=0)
    n = step_mb << 20
    try:
        while len(held) * step_mb < cap_gb << 10:
            buf = fill(n)
            buf.block_until_ready()
            held.append(buf)
    except Exception as e:  # noqa: BLE001
        if not is_oom_error(e):
            raise
    usable = len(held) * step_mb << 20
    return {"step_mb": step_mb, "usable_bytes": usable,
            "usable_gb": round(usable / 2**30, 2)}


def retry_alloc(fn, tries: int = 10, wait_s: float = 30.0):
    """Retries a device allocation while deferred relay frees land."""
    from pointseg.runtime import is_oom_error

    for i in range(tries):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001
            if not is_oom_error(e) or i == tries - 1:
                raise
            print(f"alloc OOM (attempt {i + 1}/{tries}); waiting "
                  f"{wait_s}s for deferred frees", flush=True)
            time.sleep(wait_s)


def synthesize_canonical(T: int, M: int, seed: int = 0):
    """(T, 9) canonical block features at scale: u8-valued rgb and
    rel = xyz - (min + B/2 formula center), all in f32 — exactly the
    block preprocessor's output format so the table packs."""
    rng = np.random.default_rng(seed)
    base = T // M
    counts = np.full(M, base, np.int32)
    counts[: T - base * M] += 1
    offsets = np.zeros(M, np.int64)
    np.cumsum(counts[:-1], out=offsets[1:])

    pts = np.empty((T, 9), np.float32)
    pts[:, :3] = rng.random((T, 3), dtype=np.float32)
    pts[:, :3] *= np.float32([8.0, 8.0, 3.0])  # room extents
    pts[:, 3:6] = rng.integers(0, 256, size=(T, 3), dtype=np.uint8)
    mins = np.minimum.reduceat(pts[:, :3], offsets, axis=0)
    maxz = np.maximum.reduceat(pts[:, 2], offsets)
    centers = np.stack(
        [mins[:, 0] + np.float32(0.5), mins[:, 1] + np.float32(0.5),
         mins[:, 2] + (maxz - mins[:, 2]) / 2], axis=1)
    pts[:, 6:9] = pts[:, :3] - np.repeat(centers, counts, axis=0)
    labels = rng.integers(0, 14, size=T).astype(np.uint8)
    return pts, labels, counts


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=273_000_000)
    ap.add_argument("--blocks", type=int, default=100_000)
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--dgcnn", action=argparse.BooleanOptionalAction,
                    default=True)
    ap.add_argument("--probe-grant-only", action="store_true",
                    help="Run ONLY the grant allocation probe and print "
                         "its JSON (run in a dedicated process — the "
                         "probe's buffers release only at process exit).")
    ap.add_argument("--grant-file", default=None,
                    help="JSON from a prior --probe-grant-only run; "
                         "merged into the artifact and used for the "
                         "policy arithmetic.")
    ap.add_argument("--layout", choices=["compact", "flat"],
                    default="compact",
                    help="Resident-store layout to measure. 'flat' "
                         "needs a grant that holds the full f32 table "
                         "(10.1 GB at S3DIS scale) + step temporaries.")
    ap.add_argument("--out", default="PIPELINE_BENCH_r03.json")
    args = ap.parse_args()

    # Read every input file BEFORE attaching to the device: a process
    # that attaches to the relay and then dies (even on a clean Python
    # exception) wedges the grant for tens of minutes (CLAUDE.md round-3
    # relay-memory findings) — fail fast while still detached.
    grant_probe = None
    if args.grant_file and os.path.exists(args.grant_file):
        try:
            with open(args.grant_file) as f:
                grant_probe = json.load(f)
        except (json.JSONDecodeError, OSError) as e:
            print(f"grant file unreadable ({e}); proceeding", flush=True)

    import jax
    import jax.numpy as jnp

    from pointseg.data.device import (
        CompactDeviceStore, DeviceEpochLoader, hbm_bytes_limit,
        pack_block_table, upload_flat,
    )
    from pointseg.models import create_model
    from pointseg.runtime import setup_runtime, watchdog_devices
    from pointseg.train import state as state_mod
    from pointseg.train.state import create_train_state

    setup_runtime()
    devs, err = watchdog_devices(240, probe_compute=True)
    if devs is None:
        print(json.dumps({"error": err}))
        return 1
    dev = devs[0]
    print(f"devices: {devs}; hbm limit {hbm_bytes_limit()}", flush=True)

    if args.probe_grant_only:
        t0 = time.perf_counter()
        out = probe_grant()
        out["seconds"] = round(time.perf_counter() - t0, 1)
        print(json.dumps(out))
        return 0

    results: dict = {
        "device": str(dev),
        "hbm_bytes_limit": hbm_bytes_limit(),
        "scale": {"points": args.points, "blocks": args.blocks},
    }

    if grant_probe is not None:
        results["grant_probe"] = grant_probe
        print(f"grant probe (from {args.grant_file}): {grant_probe}",
              flush=True)

    def sync(x):
        # index BEFORE fetching: x.ravel()[0] on a multi-GB array asks
        # the remote compiler for a full-size reshape (observed HTTP 500
        # from the compile helper on the 4.4 GB packed table); x[0,...,0]
        # compiles a tiny slice instead
        jax.device_get(x[(0,) * x.ndim])

    # ---- synthesize canonical tables at scale ----
    T, M = args.points, args.blocks
    t0 = time.perf_counter()
    pts, labels, counts = synthesize_canonical(T, M)
    results["host_synthesis_s"] = round(time.perf_counter() - t0, 1)
    flat_bytes = pts.nbytes + labels.nbytes
    results["flat_bytes"] = flat_bytes
    print(f"synthesized {flat_bytes / 1e9:.1f} GB (flat) in "
          f"{results['host_synthesis_s']}s", flush=True)

    # ---- policy arithmetic at this grant ----
    workspace = 5 << 30  # DGCNN's measured worst case, device.py policy
    grant = (results.get("grant_probe") or {}).get("usable_bytes") \
        or results["hbm_bytes_limit"]
    compact_bytes = T * 16 + M * 12
    results["policy"] = {
        "workspace_bytes": workspace,
        "grant_bytes": grant,
        "flat_fits": bool(grant and flat_bytes + workspace <= grant),
        "compact_fits": bool(grant and compact_bytes + workspace <= grant),
    }
    print(f"policy at grant {grant}: {results['policy']}", flush=True)

    # ---- pack (compact) + chunked upload of the resident store ----
    before = hbm_used(dev)
    if args.layout == "compact":
        t0 = time.perf_counter()
        packed, centers = pack_block_table(pts, labels, counts)
        results["pack_s"] = round(time.perf_counter() - t0, 1)
        del pts, labels  # free ~10 GB host RAM
        gb = packed.nbytes / 1e9
        t0 = time.perf_counter()
        dpacked = retry_alloc(lambda: upload_flat(packed))
        sync(dpacked)
        up_s = time.perf_counter() - t0
        store = CompactDeviceStore.from_packed(dpacked, centers, counts)
        del packed
    else:
        from pointseg.data.device import DeviceBlockStore

        gb = (pts.nbytes + labels.nbytes) / 1e9
        t0 = time.perf_counter()
        dpts = retry_alloc(lambda: upload_flat(pts))
        dlab = retry_alloc(lambda: upload_flat(labels))
        sync(dpts)
        up_s = time.perf_counter() - t0
        store = DeviceBlockStore(dpts, dlab, counts)
        del pts, labels
    after = hbm_used(dev)
    results.update({
        "upload_s": round(up_s, 1),
        "upload_gbps": round(gb / up_s, 3),
        "hbm_in_use_after_upload": after,
        "store_nbytes": store.nbytes,
        "store_layout": args.layout,
    })
    print(f"upload {up_s:.1f}s ({gb / up_s:.2f} GB/s); "
          f"hbm {before} -> {after}", flush=True)

    # ---- PointNet++ bf16 training through the device loader ----
    B, N = 8, 4096
    key = jax.random.key(0)
    model = create_model("PointNet++", num_classes=14, dtype=jnp.bfloat16)
    step = jax.jit(state_mod.train_step.__wrapped__, donate_argnums=(0,))
    tstate = create_train_state(model, jnp.zeros((B, N, 9)), 1e-3)

    loader = DeviceEpochLoader(store, B, N, seed=0)
    it = iter(loader)
    batch = next(it)
    tstate, m = step(tstate, *batch, key)
    sync(m["loss"])  # compile both sampler and step

    # pure step on a fixed batch
    fixed = batch
    chunks = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(args.steps):
            tstate, m = step(tstate, *fixed, key)
        sync(m["loss"])
        chunks.append((time.perf_counter() - t0) / args.steps)
    pure = float(np.median(chunks))

    # sampled pipeline (device sampler feeding the step)
    chunks = []
    for _ in range(3):
        it = iter(loader)
        t0 = time.perf_counter()
        n_done = 0
        for batch in it:
            tstate, m = step(tstate, *batch, key)
            n_done += 1
            if n_done >= args.steps:
                break
        sync(m["loss"])
        chunks.append((time.perf_counter() - t0) / n_done)
    piped = float(np.median(chunks))
    results["pointnetpp_bf16"] = {
        "pure_step_ms": round(pure * 1e3, 2),
        "device_pipeline_ms": round(piped * 1e3, 2),
        "pipeline_efficiency": round(pure / piped, 3),
        "points_per_sec": round(B * N / piped, 1),
    }
    print(f"PointNet++ bf16: pure {pure * 1e3:.2f} ms, piped "
          f"{piped * 1e3:.2f} ms", flush=True)

    # ---- DGCNN worst case next to the resident store ----
    if args.dgcnn:
        try:
            model = create_model("DeepGraphCnn", num_classes=14,
                                 dtype=jnp.bfloat16)
            dstep = jax.jit(state_mod.train_step.__wrapped__,
                            donate_argnums=(0,))
            dstate = create_train_state(model, jnp.zeros((B, N, 9)), 1e-3)
            it = iter(DeviceEpochLoader(store, B, N, seed=1))
            batch = next(it)
            dstate, m = dstep(dstate, *batch, key)
            sync(m["loss"])
            t0 = time.perf_counter()
            n_done = 0
            for batch in it:
                dstate, m = dstep(dstate, *batch, key)
                n_done += 1
                if n_done >= 20:
                    break
            sync(m["loss"])
            ms = (time.perf_counter() - t0) / n_done * 1e3
            results["dgcnn_bf16_next_to_store"] = {
                "ok": True, "step_ms": round(ms, 2),
                "hbm_in_use": hbm_used(dev),
            }
            print(f"DGCNN bf16 with store resident: {ms:.1f} ms/step",
                  flush=True)
        except Exception as e:  # noqa: BLE001 — record the OOM outcome
            from pointseg.runtime import is_oom_error, oom_advice

            results["dgcnn_bf16_next_to_store"] = {
                "ok": False, "oom": is_oom_error(e),
                "error": f"{type(e).__name__}: {e}"[:500],
                "advice": oom_advice(B, N) if is_oom_error(e) else None,
            }
            print(f"DGCNN next to store FAILED: {type(e).__name__}",
                  flush=True)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
