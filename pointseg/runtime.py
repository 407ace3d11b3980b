"""Process-level runtime configuration.

The reference tunes its runtime via env (PYTORCH_CUDA_ALLOC_CONF
expandable segments, train.py:15) and mitigates OOM with empty_cache +
printed remediation advice (models/dgcnn/evaluate.py:108-113,
train_model.py:462-471). The JAX/TPU equivalents:

- a persistent compilation cache (recompiles are the dominant startup
  cost; the cache makes warm restarts ~free);
- donated train-state buffers (pointseg.train.state) instead of
  allocator tweaks;
- `oom_advice` formatting for OutOfMemoryError-class failures.
"""

from __future__ import annotations

import os


def setup_runtime(cache_dir: str | None = None) -> None:
    """Enables the persistent compile cache and honors POINTSEG_PLATFORM.

    POINTSEG_PLATFORM exists because the hosting environment pre-imports
    jax with JAX_PLATFORMS pinned (the env var is latched before user
    code runs, so setting it on the command line has no effect) — the
    config update below is the only reliable platform override.
    """
    import jax

    platform = os.environ.get("POINTSEG_PLATFORM")
    if platform:
        try:
            jax.config.update("jax_platforms", platform)
        except Exception:
            pass  # backend already initialized

    cache_dir = cache_dir or os.environ.get(
        "POINTSEG_COMPILE_CACHE", "/tmp/pointseg_compile_cache"
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without these options


def oom_advice(batch_size: int | None = None, num_points: int | None = None) -> str:
    """Remediation hints for device OOM (reference evaluate.py:108-113)."""
    lines = ["Out of device memory. Try:"]
    if batch_size:
        lines.append(f"  - a smaller batch size (current: {batch_size})")
    if num_points:
        lines.append(f"  - fewer points per block (current: {num_points})")
    lines += [
        "  - --bf16 for half-width activations",
        "  - smaller model variants (e.g. --model DGCNN emb_dims=256, k=16)",
        "  - sliding-window inference for whole rooms (evaluate --whole-rooms)",
    ]
    return "\n".join(lines)


def is_oom_error(e: BaseException) -> bool:
    s = f"{type(e).__name__}: {e}"
    return "RESOURCE_EXHAUSTED" in s or "Out of memory" in s or "out of memory" in s
