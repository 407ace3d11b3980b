#!/usr/bin/env python
"""Per-fusion bytes/bandwidth accounting from a captured profile.

VERDICT round-2 item 2: DGCNN's 40.5 ms "everything else" needs a
fusion-level account, not a shrug. This tool takes a PROFILE_*.json
produced by tools/profile_tpu.py and, for each profiled op, parses the
HLO type tokens out of the op string (result + operands, e.g.
``bf16[8,4096,64]``), sums their bytes as a lower bound on HBM traffic,
and reports achieved GB/s against the chip's HBM roofline. Ops far
below the roofline at large sizes are compute/overhead-bound (or their
operands were VMEM-resident — the S(1) suffix marks scalar/SMEM, and
fusions re-reading an operand pay it once per element, so the byte sum
is approximate); ops near it are memory-bound and already at their
floor.

Usage:
  python tools/fusion_table.py PROFILE_r03.json dgcnn_bf16_step [--top 30]
"""

from __future__ import annotations

import argparse
import json
import re
import sys

# v5e HBM bandwidth ~819 GB/s
HBM_GBPS = 819.0

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
}
_TYPE_RE = re.compile(r"\b(pred|[sufb]f?\d+|bf16)\[([0-9,]*)\]")


def op_bytes(op_text: str) -> int:
    """Sum of bytes of every HLO type token in the op string (result +
    operands) — a lower bound on the op's HBM traffic assuming each
    array is touched once."""
    total = 0
    for dtype, dims in _TYPE_RE.findall(op_text):
        size = _DTYPE_BYTES.get(dtype)
        if size is None:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * size
    return total


def short_name(op_text: str) -> str:
    m = re.match(r"%(\S+) =", op_text)
    name = m.group(1) if m else op_text[:20]
    # result type gives the shape at a glance
    t = _TYPE_RE.search(op_text)
    return f"{name} -> {t.group(1)}[{t.group(2)}]" if t else name


def classify(op_text: str) -> str:
    if "custom_call_target=\"tpu_custom_call\"" in op_text:
        return "pallas"
    if "kind=kCustom" in op_text and "s32[" in op_text.split("fusion(")[-1]:
        return "gather"
    for kw in ("convolution", "dot"):
        if f" {kw}(" in op_text or op_text.startswith(f"%{kw}"):
            return "matmul"
    if "fusion" in op_text:
        m = re.search(r"kind=k(\w+)", op_text)
        return f"fusion:{m.group(1).lower()}" if m else "fusion"
    if "copy" in op_text:
        return "copy"
    return "other"


def fusion_table(profile: dict, section: str, top: int = 30) -> list[dict]:
    sec = profile["sections"][section]
    rows = []
    for o in sec["top_ops"][:top]:
        b = op_bytes(o["op"])
        ms = o["per_call_ms"]
        gbps = (b / 1e9) / (ms / 1e3) if ms > 0 else 0.0
        rows.append({
            "name": short_name(o["op"]),
            "class": classify(o["op"]),
            "ms": ms,
            "mbytes": round(b / 1e6, 2),
            "gbps": round(gbps, 1),
            "hbm_roofline_pct": round(100 * gbps / HBM_GBPS, 1),
        })
    return rows


# --- step-wall decomposition (VERDICT r03 weak #1) -----------------

# v5e VPU: 8 sublanes x 128 lanes x 4 ALUs per core at ~0.94 GHz
VPU_OPS_PER_S = 8 * 128 * 4 * 0.94e9  # ~3.85e12 f32 elementwise ops/s
# f32 HIGHEST-precision matmul runs ~6 bf16 MXU passes
MXU_F32_HIGHEST_FLOPS = 197e12 / 6


def knn_compute_floor(B: int, N: int, k: int, C: int) -> dict:
    """Analytic compute-roofline floor for one knn_indices_pallas call
    (ops/pallas/knn.py). The kernel is VPU-bound, not HBM-bound: the
    (TILE, N) distance block lives in VMEM, and each of the k selection
    passes does ~6 full-width VPU ops over it (read+max-reduce,
    compare, where-index, min-reduce, compare, masked re-store). HBM
    traffic is only the (N, F) operands + (N, k) indices — microscopic.
    The right floor is therefore ops/VPU-rate + distance-matmul
    FLOPs/MXU-rate, NOT bytes/HBM-rate (the r03 table's 0.9%-of-HBM
    number scored a compute kernel on a memory roofline)."""
    vpu_ops = B * N * N * k * 6
    mxu_flops = 2 * B * N * N * C
    return {
        "B": B, "N": N, "k": k, "C": C,
        "selection_vpu_ops": vpu_ops,
        "selection_floor_ms": round(vpu_ops / VPU_OPS_PER_S * 1e3, 3),
        "distance_mxu_flops": mxu_flops,
        "distance_floor_ms": round(
            mxu_flops / MXU_F32_HIGHEST_FLOPS * 1e3, 3),
        "floor_ms": round((vpu_ops / VPU_OPS_PER_S
                           + mxu_flops / MXU_F32_HIGHEST_FLOPS) * 1e3, 3),
        "model": "6 VPU ops/element/pass (kernel source), "
                 "VPU 8x128x4 ALUs @0.94GHz, f32-HIGHEST MXU = bf16/6",
    }


def decompose(prof: dict, section: str) -> dict:
    """wall = device-busy (interval union of the XLA Ops line) +
    dispatch/queue gap, with the busy part enumerated by the FULL
    sync+async op totals (not a top-N) — the >=95% account VERDICT r03
    weak #1 asks for."""
    sec = prof["sections"][section]
    reps = sec.get("reps", 10)
    wall = sec["wall_ms_per_call"]
    busy_key = next((k for k in sec.get("line_busy", {})
                     if k.endswith("::XLA Ops")), None)
    out = {"section": section, "wall_ms": wall, "reps": reps}
    if busy_key is None:
        out["error"] = "no XLA Ops line in profile"
        return out
    busy = sec["line_busy"][busy_key]["busy_ms"] / reps
    tot = sec.get("ops_line_totals", {})
    sync_ms = tot.get("sync_ms_per_call")
    async_ms = tot.get("async_ms_per_call")
    out.update({
        "device_busy_ms": round(busy, 3),
        "dispatch_and_gap_ms": round(wall - busy, 3),
        "sync_ops_ms": sync_ms,
        "async_ops_ms": async_ms,
        "sync_by_family_ms": sec.get("op_families_per_call_ms"),
        "async_by_family_ms": tot.get("async_by_family_per_call_ms"),
        "distinct_ops": (tot.get("distinct_sync_ops", 0)
                         + tot.get("distinct_async_ops", 0)),
    })
    if sync_ms is not None and async_ms is not None:
        enumerated = sync_ms + async_ms + max(wall - busy, 0.0)
        out["enumerated_ms"] = round(enumerated, 3)
        out["enumerated_pct_of_wall"] = round(100 * enumerated / wall, 1)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("profile")
    ap.add_argument("section")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--out", default=None, help="also write JSON here")
    ap.add_argument("--decompose", action="store_true",
                    help="add the wall = busy + gap account from the "
                         "full op totals (needs a profile captured "
                         "with the r04 profile_tpu.py)")
    ap.add_argument("--knn-floor", nargs=4, type=int, default=None,
                    metavar=("B", "N", "K", "C"),
                    help="add the analytic VPU/MXU compute floor for "
                         "one kNN kernel call at this shape")
    args = ap.parse_args()

    with open(args.profile) as f:
        prof = json.load(f)
    rows = fusion_table(prof, args.section, args.top)
    wall = prof["sections"][args.section]["wall_ms_per_call"]
    accounted = sum(r["ms"] for r in rows)

    print(f"{args.section}: wall {wall} ms/call; top {len(rows)} ops "
          f"account for {accounted:.2f} ms")
    print(f"{'op':58s} {'class':14s} {'ms':>7s} {'MB':>9s} {'GB/s':>8s} "
          f"{'%HBM':>6s}")
    for r in rows:
        print(f"{r['name'][:58]:58s} {r['class']:14s} {r['ms']:7.3f} "
              f"{r['mbytes']:9.2f} {r['gbps']:8.1f} "
              f"{r['hbm_roofline_pct']:6.1f}")
    by_class: dict = {}
    for r in rows:
        by_class[r["class"]] = by_class.get(r["class"], 0.0) + r["ms"]
    print("\nby class (ms):")
    for k, v in sorted(by_class.items(), key=lambda kv: -kv[1]):
        print(f"  {k:16s} {v:7.3f}")
    payload = {"section": args.section, "wall_ms": wall,
               "accounted_ms": round(accounted, 3), "rows": rows,
               "by_class_ms": {k: round(v, 3) for k, v in by_class.items()}}
    if args.decompose:
        payload["decomposition"] = decompose(prof, args.section)
        d = payload["decomposition"]
        print("\ndecomposition (ms/call):")
        for k in ("wall_ms", "device_busy_ms", "dispatch_and_gap_ms",
                  "sync_ops_ms", "async_ops_ms", "enumerated_ms",
                  "enumerated_pct_of_wall"):
            if k in d:
                print(f"  {k:26s} {d[k]}")
    if args.knn_floor:
        payload["knn_compute_floor"] = knn_compute_floor(*args.knn_floor)
        f_ = payload["knn_compute_floor"]
        print(f"\nknn compute floor @B={f_['B']} N={f_['N']} k={f_['k']} "
              f"C={f_['C']}: {f_['floor_ms']} ms "
              f"(selection {f_['selection_floor_ms']} + distance "
              f"{f_['distance_floor_ms']})")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(payload, f, indent=2)
        print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
