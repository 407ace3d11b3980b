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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("profile")
    ap.add_argument("section")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--out", default=None, help="also write JSON here")
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
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"section": args.section, "wall_ms": wall,
                       "accounted_ms": round(accounted, 3), "rows": rows,
                       "by_class_ms": {k: round(v, 3)
                                       for k, v in by_class.items()}},
                      f, indent=2)
        print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
