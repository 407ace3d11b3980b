"""bench.py driver-contract tests (subprocess, CPU platform).

bench.py is the artifact the driver runs unattended on the real chip
(BASELINE.json metric). Its contract: exactly one JSON line on stdout,
rc=0 on success, rc!=0 WITH a diagnostic "error" field on any failure —
and it must never hang the driver, even when the relay wedges after
device discovery (the round-1 postmortem failure mode, VERDICT.md
weak#1). These tests drive the real script end-to-end on CPU.
"""

import json
import os
import subprocess
import sys

from pointseg.runtime import host_cache_dir

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(
    os.environ,
    JAX_PLATFORMS="cpu",
    POINTSEG_PLATFORM="cpu",
    POINTSEG_COMPILE_CACHE=host_cache_dir("/tmp/jax_cache"),
)


def _run_bench(extra_env, timeout=560):
    out = subprocess.run(
        [sys.executable, "bench.py"], capture_output=True, text=True,
        timeout=timeout, cwd=REPO, env=dict(ENV, **extra_env),
    )
    # Contract: the LAST stdout line is the one JSON record.
    lines = [ln for ln in out.stdout.strip().splitlines() if ln.strip()]
    assert lines, f"no stdout; stderr tail: {out.stderr[-800:]}"
    return out.returncode, json.loads(lines[-1])


def test_analytic_step_flops_host_side():
    """The MFU denominator (bench.py::analytic_step_flops) must be pure
    host-side accounting: positive FLOPs from the lowered-but-unexecuted
    step, and ZERO new live device buffers (on the relay a stray
    device_put/execute would cost ~60ms+ and burn grant memory inside
    the benchmark)."""
    import jax

    sys.path.insert(0, REPO)
    try:
        import bench
    finally:
        sys.path.remove(REPO)

    before = len(jax.live_arrays())
    fl = bench.analytic_step_flops("PointNet", "bfloat16", B=2, N=64, C=5)
    assert fl > 0
    assert len(jax.live_arrays()) == before, "created device buffers"
    # FLOPs must scale with the workload (sanity that it reads the
    # lowered module, not a constant).
    fl2 = bench.analytic_step_flops("PointNet", "bfloat16", B=4, N=64, C=5)
    assert fl2 > 1.5 * fl


def test_bench_total_watchdog_emits_error_json():
    """A post-discovery wedge (simulated by a tiny total timeout) must
    still produce the one-line JSON with an error field and rc!=0 —
    never an indefinite hang."""
    rc, rec = _run_bench({"POINTSEG_BENCH_TOTAL_TIMEOUT": "3"}, timeout=560)
    assert rc != 0
    assert rec["metric"] == "s3dis_train_points_per_sec_per_chip"
    assert rec["value"] == 0.0
    assert "TOTAL_TIMEOUT" in rec["error"]
