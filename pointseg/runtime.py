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

import hashlib
import os


def host_fingerprint() -> str:
    """Short hash of the host CPU's identity and feature flags.

    The persistent compile cache stores XLA:CPU ahead-of-time compiled
    executables. Those are machine-code artifacts: loading one compiled
    on a host with different CPU features is undefined behavior (the
    AOT loader warns "could lead to execution errors such as SIGILL").
    This environment's host machine can change between sessions while
    /tmp caches persist, so cache directories are keyed by this
    fingerprint — a different host simply starts a fresh cache instead
    of loading foreign machine code.
    """
    # 'model name' alone is NOT discriminating on cloud hosts (observed:
    # the generic "Intel(R) Xeon(R) Processor @ 2.10GHz" across
    # different microarchs whose flags also match) — LLVM picks its
    # target CPU (and synthetic features like +prefer-no-gather) from
    # CPUID family/model/stepping, so those must key the cache too
    # (r05: an AOT mismatch warning fired ACROSS hosts sharing the old
    # two-line fingerprint).
    keys = ("model name", "flags", "cpu family", "model\t", "stepping")
    ident = []
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(keys):
                    ident.append(line.strip())
                    if len(ident) >= len(keys):
                        break
    except OSError:
        pass
    if not ident:
        # cpuinfo formats without 'model name'/'flags' lines (e.g.
        # aarch64 uses 'CPU implementer'/'Features') would otherwise
        # hash identically across hosts — fall back to the platform
        # identity rather than an empty string (ADVICE.md round 2).
        import platform

        ident = [platform.machine(), platform.processor()]
    return hashlib.sha256("|".join(ident).encode()).hexdigest()[:10]


def host_cache_dir(base: str) -> str:
    """Compile-cache path keyed by host identity (see host_fingerprint)."""
    return f"{base}-{host_fingerprint()}"


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

    cache_dir = cache_dir or os.environ.get("POINTSEG_COMPILE_CACHE")
    if cache_dir is None:
        cache_dir = host_cache_dir("/tmp/pointseg_compile_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without these options


def watchdog_devices(timeout_s: float | None = None, probe_compute: bool = False):
    """`jax.devices()` behind a daemon-thread watchdog.

    On the relayed TPU runtime, backend init can HANG FOREVER when the
    remote grant is wedged (CLAUDE.md "Relay failure mode") — a plain
    jax.devices() call then wedges the whole process. Every entry point
    that must stay responsive (bench.py, tools/verify_tpu.py,
    `pointseg doctor`) shares this probe.

    Args:
        timeout_s: seconds before declaring the backend hung (default:
            POINTSEG_BENCH_INIT_TIMEOUT env or 180).
        probe_compute: additionally run a tiny jitted computation and
            fetch a scalar — catches relays that enumerate devices but
            hang on execution.

    Returns:
        (devices, None) on success, (None, reason) on hang or error.
    """
    import threading

    if timeout_s is None:
        timeout_s = float(os.environ.get("POINTSEG_BENCH_INIT_TIMEOUT", "180"))

    import jax

    result: dict = {}

    def probe():
        try:
            devices = jax.devices()
            if probe_compute:
                import jax.numpy as jnp

                x = jax.jit(lambda a: a * 2)(jnp.ones((8, 128)))
                jax.device_get(x.ravel()[0])
            result["devices"] = devices
        except Exception as e:  # noqa: BLE001 — report, don't crash
            result["error"] = f"{type(e).__name__}: {e}"

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        return None, (
            f"backend init hung >{timeout_s:.0f}s inside jax.devices() — "
            "the relay grant is likely wedged (see CLAUDE.md 'Relay "
            "failure mode'). Check for orphaned TPU-holding processes "
            "(ps aux | grep python) and retry."
        )
    if "error" in result:
        return None, f"backend init failed: {result['error']}"
    return result["devices"], None


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
