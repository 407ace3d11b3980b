#!/usr/bin/env python
"""Analytic FLOP/byte roofline accounting for the training step.

VERDICT.md (round 1, weak #3) called out that BENCHMARKS.md carried
wall-clock numbers only — "no FLOP/bandwidth accounting exists
anywhere". This tool closes that: for every model family at the
reference training configuration (B=8, N=4096, C=14 — reference
train.py:17-27) it

  1. lowers the full jitted train step (fwd + bwd + Adam, bf16
     activations / f32 params — the recommended TPU configuration) and
     reads XLA's pre-optimization HLO cost analysis: analytic FLOPs and
     bytes touched per step;
  2. combines them with the chip-measured step times committed in
     AB_BF16_MODELS_r02.json / AB_DGCNN_COPIES_r02.json (medians over
     chunks, measured on the real TPU v5e via tools/ab_bf16_models.py)
     into model-level MFU / HBM-utilization numbers;
  3. decomposes the DGCNN step (the slowest family) against
     PROFILE_r02_bf16.json device-time op families, annotating each hot
     component with ITS limiting resource — the model-level MFU is low
     not because kernels are lazy but because these models are
     selection/gather-bound, and the component table shows each of
     those is at its own measured hardware floor.

Caveats (stated in the output):
  - "flops"/"bytes accessed" come from *unoptimized* HLO: fusion
    eliminates most intermediate bytes, so `bytes accessed` is an
    upper bound on real HBM traffic, and MXU FLOPs include the one-hot
    gather-backward contractions (which are real work the chip
    executes, see BENCHMARKS.md "scatter strategy").
  - Peaks are v5e datasheet numbers: 197 TFLOP/s bf16 MXU (f32 via
    HIGHEST-precision passes runs at roughly 1/4-1/6 of that),
    819 GB/s HBM.

Writes ROOFLINE_r{N}.json and prints a markdown table.

Run on any backend — lowering is host-side; nothing executes.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pointseg.runtime import setup_runtime  # noqa: E402

setup_runtime()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

V5E_BF16_FLOPS = 197e12
V5E_HBM_BYTES = 819e9

# chip-measured medians (ms/step), B=8 N=4096 bf16 activations:
# AB_BF16_MODELS_r02.json + AB_DGCNN_COPIES_r02.json["bf16_act"]
MEASURED_KEYS = {
    "PointNet": ("AB_BF16_MODELS_r02.json", "PointNet/bfloat16"),
    "PointNet++": ("AB_BF16_MODELS_r02.json", "PointNet++/bfloat16"),
    "PointNet++MSG": ("AB_BF16_MODELS_r02.json", "PointNet++MSG/bfloat16"),
    "PointNeXt": ("AB_BF16_MODELS_r02.json", "PointNeXt/bfloat16"),
    "DeepGraphCnn": ("AB_DGCNN_COPIES_r02.json", "bf16_act"),
}


def measured_ms(repo_root: str, model: str) -> float | None:
    fname, key = MEASURED_KEYS[model]
    path = os.path.join(repo_root, fname)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        data = json.load(f)
    entry = data.get(key)
    return None if entry is None else float(entry["ms_per_step"])


def bench_ms(repo_root: str, bench_json: str, model: str,
             batch: int, n: int) -> float | None:
    """Wall ms/step derived from a driver BENCH_r{N}.json per_model
    points/sec entry (VERDICT r04 weak #4: MFU must divide CURRENT step
    times, and the bench artifact is the canonical source of those)."""
    path = os.path.join(repo_root, bench_json)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        data = json.load(f)
    per_model = data.get("parsed", data).get("per_model", {})
    # static-graph rows reuse the base DGCNN analytic cost; their
    # measured time comes from the dedicated chip A/B artifact
    pps = per_model.get(f"{model}/bfloat16")
    if not isinstance(pps, (int, float)) or pps <= 0:
        return None
    return batch * n / float(pps) * 1e3


def static_graph_ms(repo_root: str) -> float | None:
    """DGCNN --static-graph chip step time (AB_STATIC_GRAPH_r03.json)."""
    path = os.path.join(repo_root, "AB_STATIC_GRAPH_r03.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        data = json.load(f)
    try:
        return float(data["static"]["ms_per_step"])
    except (KeyError, TypeError):
        for k in ("static_ms", "static_ms_per_step"):
            if k in data:
                return float(data[k])
    return None


def step_cost(model_name: str, batch: int, n: int, num_classes: int,
              **model_kwargs) -> dict:
    """Analytic cost of one jitted train step from unoptimized HLO."""
    from pointseg.models import create_model
    from pointseg.train.state import create_train_state, train_step

    model = create_model(model_name, num_classes=num_classes,
                         dtype=jnp.bfloat16, **model_kwargs)
    points = jnp.zeros((batch, n, 9), jnp.float32)
    labels = jnp.zeros((batch, n, num_classes), jnp.float32)
    lengths = jnp.full((batch,), n, jnp.int32)
    state = create_train_state(model, points)
    lowered = train_step.lower(state, points, labels, lengths,
                               jax.random.key(0))
    ca = lowered.cost_analysis()
    return {
        "flops_per_step": float(ca.get("flops", 0.0)),
        "hlo_bytes_per_step": float(ca.get("bytes accessed", 0.0)),
    }


def dgcnn_components(repo_root: str) -> list[dict] | None:
    """DGCNN device-time decomposition with per-component rooflines.

    Sources: PROFILE_r02_bf16.json (xplane capture on the real chip,
    tools/profile_tpu.py). The per-component limits were measured
    separately: gather ~8-10 ns/row regardless of width or index order
    (AB_GATHER_SORTED_r02.json, BENCHMARKS.md "gathers"), the flat
    selection kernel ~0.21 ms per extraction pass over the resident
    distance block (VPU-bound; BENCHMARKS.md "two-level selection"
    closure shows algorithmic alternatives don't beat it).
    """
    path = os.path.join(repo_root, "PROFILE_r02_bf16.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        prof = json.load(f)
    sec = prof["sections"]["dgcnn_bf16_step"]
    fam = sec["op_families_per_call_ms"]
    rows = 8 * 4096 * 20  # one (B, N, k) edge gather
    # Edge gathers are the fusions that take the flat s32[B*N*k] index
    # vector and produce a [B*N*k, C] row table. Derive their time from
    # the loaded profile so a re-captured PROFILE file can't silently
    # desynchronize this decomposition (ADVICE.md round 2).
    gather_ops = [
        o for o in sec["top_ops"]
        if f"s32[{rows}]" in o["op"] and f"bf16[{rows}," in o["op"].split("=")[1]
    ]
    gather_ms = sum(o["per_call_ms"] for o in gather_ops)
    if not gather_ops:  # profile predates this format — keep the r02 value
        gather_ms = 4 * 5.36
    knn_ms = fam["knn_indices_pallas"]
    total = sec["wall_ms_per_call"]
    comps = [
        {
            "component": "edge gathers (4x take_along_axis)",
            "measured_ms": round(gather_ms, 2),
            "limit": "per-row descriptor overhead",
            "ideal_ms": round(4 * rows * 8e-9 * 1e3, 2),
            "note": f"{rows} rows/gather at the measured 8-10 ns/row floor; "
                    "HBM-bytes roofline would be ~0.4 ms — the gap IS the "
                    "floor (AB_NATIVE_GATHER_r02.json: per-row DMA is "
                    "descriptor-bound, one-hot matmuls are 2x slower)",
        },
        {
            "component": "kNN selection kernels (4x)",
            "measured_ms": round(knn_ms, 2),
            "limit": "VPU ops on VMEM-resident distance block",
            "ideal_ms": None,
            "note": "4.98 ms/call in-step = k=20 extraction passes over the "
                    "134M-element resident distance block at ~1.6T "
                    "element-ops/s (each pass is a max + tie-min + mask "
                    "update) — order of the VPU peak. Measured alternatives "
                    "are all slower: lax.top_k 71.9 ms, approx_max_k 60.7, "
                    "exact two-level 6.6+ ms standalone vs flat 6.59 "
                    "(AB_KNN_TOPK_r02.json, BENCHMARKS.md closure)",
        },
        {
            "component": "everything else (matmuls/BN/max/backward)",
            "measured_ms": round(total - gather_ms - knn_ms, 2),
            "limit": "mixed; largest single op 2.4 ms",
            "ideal_ms": None,
            "note": "long tail of bf16 fusions; no single op > 2.5 ms "
                    "(PROFILE_r02_bf16.json top_ops)",
        },
    ]
    return comps


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--points", type=int, default=4096)
    ap.add_argument("--classes", type=int, default=14)
    ap.add_argument("--models", nargs="*",
                    default=["PointNet", "PointNet++", "PointNet++MSG",
                             "PointNeXt", "PointNeXt-L", "DeepGraphCnn",
                             "DeepGraphCnn(static)"])
    ap.add_argument("--bench-json", default="BENCH_r04.json",
                    help="driver bench artifact supplying current "
                         "per-model points/sec (bf16 rows); legacy r02 "
                         "A/B artifacts are the fallback source")
    ap.add_argument("--out", default="ROOFLINE_r05.json")
    args = ap.parse_args()

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = {
        "config": {"batch": args.batch, "points": args.points,
                   "classes": args.classes,
                   "dtype": "bf16 activations / f32 params",
                   "step_time_source": f"{args.bench_json} per_model "
                                       "(wall incl. dispatch); "
                                       "DeepGraphCnn(static): "
                                       "AB_STATIC_GRAPH_r03.json"},
        "peaks": {"mxu_bf16_flops": V5E_BF16_FLOPS,
                  "hbm_bytes_per_s": V5E_HBM_BYTES},
        "models": {},
    }
    print(f"| model | GFLOP/step | measured ms | ideal MXU ms | MFU % | "
          f"HLO GB/step | HBM-bound ms (upper) |")
    print("|---|---|---|---|---|---|---|")
    for name in args.models:
        if name == "DeepGraphCnn(static)":
            # same analytic graph cost minus the 3 repeated kNN
            # selections is NOT what XLA sees — lower the actual
            # static_graph=True program instead
            cost = step_cost("DeepGraphCnn", args.batch, args.points,
                             args.classes, static_graph=True)
            ms = static_graph_ms(repo_root)
        else:
            cost = step_cost(name, args.batch, args.points, args.classes)
            ms = bench_ms(repo_root, args.bench_json, name,
                          args.batch, args.points)
            if ms is None and name in MEASURED_KEYS:
                ms = measured_ms(repo_root, name)
        flops = cost["flops_per_step"]
        bts = cost["hlo_bytes_per_step"]
        ideal_ms = flops / V5E_BF16_FLOPS * 1e3
        hbm_ms = bts / V5E_HBM_BYTES * 1e3
        mfu = (flops / (ms * 1e-3) / V5E_BF16_FLOPS * 100) if ms else None
        row = {
            **cost,
            "measured_ms_per_step": ms,
            "ideal_mxu_ms": ideal_ms,
            "mfu_pct": mfu,
            "hlo_bytes_hbm_upperbound_ms": hbm_ms,
        }
        out["models"][name] = row
        print(f"| {name} | {flops/1e9:.1f} | "
              f"{ms if ms is not None else 'n/a'} | {ideal_ms:.2f} | "
              f"{f'{mfu:.1f}' if mfu else 'n/a'} | {bts/1e9:.2f} | "
              f"{hbm_ms:.2f} |")

    comps = dgcnn_components(repo_root)
    if comps:
        out["dgcnn_components"] = comps
        print("\nDGCNN step decomposition (measured device time vs "
              "per-component limit):")
        for c in comps:
            ideal = f"{c['ideal_ms']} ms" if c["ideal_ms"] else "—"
            print(f"- {c['component']}: {c['measured_ms']} ms "
                  f"(component floor {ideal}; {c['limit']})")

    with open(os.path.join(repo_root, args.out), "w") as f:
        json.dump(out, f, indent=1)
    print(f"\nwrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
