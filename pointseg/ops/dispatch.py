"""Kernel dispatch: Pallas on TPU, pure-JAX elsewhere.

The geometric primitives in `pointseg.ops` route through these helpers:
on TPU-class devices the fused Pallas kernels run (the N²/CN distance
matrices never touch HBM); on CPU/GPU — and whenever an option the
kernels don't support is used (validity masks, non-default tie modes) —
the pure-JAX implementations run. Override with
`POINTSEG_PALLAS={0,1}` or `set_use_pallas(...)` (tests force both
paths explicitly).
"""

from __future__ import annotations

import os

_FORCED: bool | None = None


def set_use_pallas(value: bool | None) -> None:
    """Force Pallas on/off; None restores platform auto-detection."""
    global _FORCED
    _FORCED = value


def use_pallas() -> bool:
    if _FORCED is not None:
        return _FORCED
    env = os.environ.get("POINTSEG_PALLAS")
    if env is not None:
        return env not in ("0", "false", "False")
    try:
        import jax

        dev = jax.devices()[0]
        return dev.platform == "tpu" or "TPU" in getattr(dev, "device_kind", "")
    except Exception:
        return False
