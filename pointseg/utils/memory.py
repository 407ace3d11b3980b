"""Device/host memory telemetry.

Rebuild of `get_memory_usage` (reference models/dgcnn/utils.py:332-355)
for TPU: per-device HBM stats from `jax.Device.memory_stats()` plus
host RSS via /proc (psutil-free).
"""

from __future__ import annotations

import os

import jax


def get_memory_usage() -> dict:
    out = {"devices": [], "host_rss_mb": None}
    for d in jax.devices():
        stats = d.memory_stats() or {}
        out["devices"].append(
            {
                "device": str(d),
                "bytes_in_use": stats.get("bytes_in_use"),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
                "bytes_limit": stats.get("bytes_limit"),
            }
        )
    try:
        with open(f"/proc/{os.getpid()}/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    out["host_rss_mb"] = int(line.split()[1]) / 1024.0
                    break
    except OSError:
        pass
    return out


def format_memory_usage() -> str:
    m = get_memory_usage()
    parts = []
    for d in m["devices"]:
        if d["bytes_in_use"] is not None:
            parts.append(
                f"{d['device']}: {d['bytes_in_use'] / 2**20:.0f}MB in use"
                + (
                    f" (peak {d['peak_bytes_in_use'] / 2**20:.0f}MB)"
                    if d.get("peak_bytes_in_use")
                    else ""
                )
            )
    if m["host_rss_mb"]:
        parts.append(f"host RSS: {m['host_rss_mb']:.0f}MB")
    return "; ".join(parts) if parts else "memory stats unavailable"
