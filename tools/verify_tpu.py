#!/usr/bin/env python
"""Compiled-kernel attestation on the real TPU chip.

Runs every Pallas kernel (compiled Mosaic, NOT interpret mode) against
its pure-JAX oracle on the same chip and writes a machine-checkable
results JSON. This is the third-party-verifiable artifact that the CPU
test suite cannot produce (tests/test_pallas.py runs interpret mode;
VERDICT.md round-1 weak#7).

Usage:
    python tools/verify_tpu.py [--out VERIFY_TPU.json]

Exit code 0 iff every check passes. Uses the same hung-relay watchdog as
bench.py. Each check compares:
  - fps:        index sequences, exact equality
  - ball_query: index sets + in_ball flags (in-ball selections exact;
                filler slots compared as counts, semantics unspecified)
  - knn:        neighbor index sets, exact equality
  - three_nn:   indices exact + distances to 1e-5
plus forward logits of PointNet++ (the composed model) Pallas-vs-oracle,
the two-level selection kernels vs the flat ones (bit-exact), the
custom-VJP gather backward strategies vs XLA's scatter-add autodiff,
and the packed feature+coord gather vs separate gathers.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

import numpy as np

# runnable as `python tools/verify_tpu.py` — sys.path[0] is tools/
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

INIT_TIMEOUT_S = float(os.environ.get("POINTSEG_BENCH_INIT_TIMEOUT", "180"))


def _watchdog_devices():
    from pointseg.runtime import watchdog_devices

    return watchdog_devices(INIT_TIMEOUT_S)


def _run_checks():
    import jax
    import jax.numpy as jnp

    from pointseg import ops
    from pointseg.ops.dispatch import set_use_pallas

    rng = np.random.default_rng(42)
    checks = []

    def both(fn):
        """Run fn twice — compiled Pallas then pure-JAX oracle."""
        set_use_pallas(True)
        try:
            got = jax.tree.map(np.asarray, fn())
        finally:
            set_use_pallas(None)
        set_use_pallas(False)
        try:
            want = jax.tree.map(np.asarray, fn())
        finally:
            set_use_pallas(None)
        return got, want

    def record(name, fn):
        t0 = time.perf_counter()
        try:
            fn()
            checks.append({"check": name, "ok": True,
                           "seconds": round(time.perf_counter() - t0, 2)})
        except Exception as e:  # noqa: BLE001
            checks.append({
                "check": name, "ok": False,
                "seconds": round(time.perf_counter() - t0, 2),
                "error": f"{type(e).__name__}: {e}",
            })

    B, N, C, K = 8, 4096, 1024, 32
    coords = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))

    def check_fps():
        got, want = both(lambda: ops.farthest_point_sampling(coords, C))
        np.testing.assert_array_equal(got, want)

    def check_ballquery():
        cents = coords[:, :C] * 0.2
        got, want = both(lambda: ops.ball_query(cents, coords * 0.2, 0.2, K))
        gi, gb = got
        wi, wb = want
        np.testing.assert_array_equal(gb, wb)  # identical in-ball flags
        # in-ball selections must be identical sets per ball
        for b in range(0, B, 4):
            for c in range(0, C, 97):
                assert (set(gi[b, c][gb[b, c]]) == set(wi[b, c][wb[b, c]])), (
                    f"in-ball set mismatch at {b},{c}"
                )

    def check_knn():
        x = jnp.asarray(rng.normal(size=(4, 1024, 9)).astype(np.float32))
        got, want = both(lambda: ops.knn_indices(x, 20))
        got_s, want_s = np.sort(got, -1), np.sort(want, -1)
        np.testing.assert_array_equal(got_s, want_s)

    def check_three_nn():
        tgt = coords[:4, :1024]
        src = jnp.asarray(rng.normal(size=(4, 256, 3)).astype(np.float32))
        got, want = both(lambda: ops.three_nn(tgt, src))
        gd, gi = got
        wd, wi = want
        np.testing.assert_array_equal(gi, wi)
        np.testing.assert_allclose(gd, wd, atol=1e-5)

    def check_model_forward():
        from pointseg.models import PointNetPP

        x = jnp.asarray(rng.normal(size=(2, 1024, 9)).astype(np.float32))
        model = PointNetPP(num_classes=14)

        def fwd():
            variables = model.init({"params": jax.random.key(0)}, x, train=False)
            return model.apply(variables, x, train=False)

        got, want = both(fwd)
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)

    def check_select2l():
        """Two-level selection kernels, compiled, vs the flat kernels —
        BIT-exact requirement incl. emission order and filler slots
        (gates POINTSEG_SELECT2L; see ops/pallas/select2l.py)."""
        from pointseg.ops.pallas.ballquery import (
            ball_query_pallas,
            ball_query_pallas_2l,
        )
        from pointseg.ops.pallas.knn import (
            knn_indices_pallas,
            knn_indices_pallas_2l,
        )

        x = jnp.asarray(rng.normal(size=(B, N, 64)).astype(np.float32))
        flat = np.asarray(jax.jit(lambda v: knn_indices_pallas(v, 20))(x))
        for depth in (2, 3, 4):
            two = np.asarray(
                jax.jit(
                    lambda v, d=depth: knn_indices_pallas_2l(v, 20, depth=d)
                )(x)
            )
            np.testing.assert_array_equal(flat, two)
        # ties + lane exhaustion
        xt = jnp.asarray(
            np.round(rng.normal(size=(B, N, 3)), 1).astype(np.float32)
        )
        np.testing.assert_array_equal(
            np.asarray(jax.jit(lambda v: knn_indices_pallas(v, 20))(xt)),
            np.asarray(jax.jit(lambda v: knn_indices_pallas_2l(v, 20))(xt)),
        )
        cents = coords[:, :C] * 0.2
        fi, fb = jax.jit(
            lambda c, p: ball_query_pallas(c, p, 0.2, K)
        )(cents, coords * 0.2)
        ti, tb = jax.jit(
            lambda c, p: ball_query_pallas_2l(c, p, 0.2, K)
        )(cents, coords * 0.2)
        np.testing.assert_array_equal(np.asarray(fi), np.asarray(ti))
        np.testing.assert_array_equal(np.asarray(fb), np.asarray(tb))

    def check_gather_backward():
        """Round-2 custom-VJP gather (ops/gather.py): the one-hot MXU
        backward must agree with the XLA scatter-add autodiff on chip
        (exact products at Precision.HIGHEST; sums reassociate), and
        the bf16x2 split must land within its documented ~1e-4-relative
        envelope."""
        from pointseg.ops import gather as G

        table = jnp.asarray(rng.normal(size=(4, 2048, 64)).astype(np.float32))
        idx = jnp.asarray(
            rng.integers(0, 2048, size=(4, 40960)).astype(np.int32))
        ct = jnp.asarray(rng.normal(size=(4, 40960, 64)).astype(np.float32))

        def grad_with(strategy):
            G.set_scatter_strategy(strategy)
            try:
                g = jax.jit(
                    jax.grad(lambda t: jnp.sum(G.gather_rows(t, idx) * ct))
                )(table)
                return np.asarray(g)
            finally:
                G.set_scatter_strategy(None)

        want = grad_with("xla")
        np.testing.assert_allclose(
            grad_with("onehot"), want, rtol=1e-5, atol=1e-4)
        scale = np.abs(want).max()
        err = np.abs(grad_with("bf16x2") - want)
        assert err.max() <= 5e-4 * (scale + 1.0), (
            f"bf16x2 split error {err.max()} vs scale {scale}")

    def check_packed_gather():
        """Round-2 packed feature+coord gather
        (ops/gather.py::gather_rows_with_coords): features bit-equal to
        a plain gather in both dtypes; f32 coords riding a bf16 table
        reconstruct through the arithmetic hi/lo split to ~1e-4 rel."""
        from pointseg.ops import gather as G

        idx = jnp.asarray(
            rng.integers(0, 4096, size=(4, 1024, 32)), jnp.int32)
        coords_t = jnp.asarray(
            (rng.normal(size=(4, 4096, 3)) * 3).astype(np.float32))
        for dt in (jnp.float32, jnp.bfloat16):
            feat = jnp.asarray(
                rng.normal(size=(4, 4096, 32)).astype(np.float32)
            ).astype(dt)
            gf, gc = jax.jit(G.gather_rows_with_coords)(feat, coords_t, idx)
            np.testing.assert_array_equal(
                np.asarray(gf), np.asarray(G.gather_rows(feat, idx)))
            ref = np.asarray(G.gather_rows(coords_t, idx))
            if dt == jnp.float32:
                np.testing.assert_array_equal(np.asarray(gc), ref)
            else:
                err = np.abs(np.asarray(gc) - ref)
                assert err.max() <= 1e-4 * (np.abs(ref).max() + 1.0)

    def check_gather_forward():
        """Round-3 one-hot MXU FORWARD gather (ops/gather.py::_take_rows,
        AB_FWD_GATHER_r03): must be BITWISE equal to take_along_axis on
        chip in both dtypes (products are 1.0*x or 0.0; adding zeros
        changes no value)."""
        from pointseg.ops import gather as G

        idx = jnp.asarray(rng.integers(0, 4096, size=(4, 8192)), jnp.int32)
        for dt in (jnp.float32, jnp.bfloat16):
            table = jnp.asarray(
                rng.normal(size=(4, 4096, 64)).astype(np.float32)
            ).astype(dt)
            try:
                G.set_gather_forward("xla")
                want = np.asarray(jax.jit(G.gather_rows)(table, idx))
                G.set_gather_forward("onehot")
                got = np.asarray(jax.jit(G.gather_rows)(table, idx))
            finally:
                G.set_gather_forward(None)
            np.testing.assert_array_equal(got, want)

    def check_compact_store():
        """Round-3 16 B/point compact device store (data/device.py::
        CompactDeviceStore): sampled batches must be BIT-identical to
        the flat f32 store on chip — xyz via u32 bitcast (integer
        gathers are exempt from the bf16 FTZ trap), exact u8 rgb, and
        the on-device IEEE f32 xyz - center subtraction matching the
        host preprocessor's."""
        from pointseg.data.blocks import augment_points
        from pointseg.data.device import CompactDeviceStore, DeviceBlockStore

        counts = rng.integers(200, 600, size=16)
        pts, labs = [], []
        for n in counts:
            raw = np.empty((n, 6), np.float32)
            raw[:, :3] = rng.uniform(0, 30, size=(n, 3))
            raw[:, 3:] = rng.integers(0, 256, size=(n, 3))
            pts.append(augment_points(raw))
            labs.append(rng.integers(0, 14, size=n).astype(np.uint8))
        pts, labs = np.concatenate(pts), np.concatenate(labs)
        flat = DeviceBlockStore(pts, labs, counts, num_classes=14)
        compact = CompactDeviceStore(pts, labs, counts, num_classes=14)
        order = flat.epoch_order(jax.random.key(2), batch_size=8)
        step, key = jnp.zeros((), jnp.int32), jax.random.key(4)
        cstep, ckey = step, key
        for _ in range(2):
            fp, fo, fl, step, key = flat.sample(order, step, key, 8, 256)
            cp, co, cl, cstep, ckey = compact.sample(order, cstep, ckey, 8, 256)
            np.testing.assert_array_equal(
                np.asarray(fp).view(np.uint32),
                np.asarray(cp).view(np.uint32))
            np.testing.assert_array_equal(np.asarray(fo), np.asarray(co))
            np.testing.assert_array_equal(np.asarray(fl), np.asarray(cl))

    def check_export_roundtrip():
        """VERDICT r03 item 9: `io/export_aot.py` freezes the
        Pallas-vs-oracle dispatch at export time; the CPU tests only
        cover the oracle path. Export PointNet++ ON THE CHIP (Pallas
        kernels baked into the StableHLO), reload, and require the
        artifact's logits to match the live jitted forward exactly."""
        from pointseg.io.export_aot import export_forward, load_forward
        from pointseg.models import PointNetPP

        model = PointNetPP(num_classes=14)
        pts = jnp.asarray(rng.normal(size=(2, 512, 9)).astype(np.float32))
        variables = jax.jit(model.init)({"params": jax.random.key(0)}, pts)
        blob = export_forward(model, variables, pts)
        served = load_forward(blob)
        got = np.asarray(served(variables, pts))
        want = np.asarray(jax.jit(
            lambda v, p: model.apply(v, p, train=False))(variables, pts))
        np.testing.assert_array_equal(got, want)

    record("fps_compiled_vs_oracle", check_fps)
    record("export_roundtrip_on_chip", check_export_roundtrip)
    record("compact_store_bitwise_vs_flat", check_compact_store)
    record("gather_forward_onehot_bitwise", check_gather_forward)
    record("ballquery_compiled_vs_oracle", check_ballquery)
    record("knn_compiled_vs_oracle", check_knn)
    record("three_nn_compiled_vs_oracle", check_three_nn)
    record("pointnetpp_forward_compiled_vs_oracle", check_model_forward)
    record("select2l_compiled_vs_flat", check_select2l)
    record("gather_backward_strategies_agree", check_gather_backward)
    record("packed_gather_vs_separate", check_packed_gather)
    return checks


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="VERIFY_TPU.json")
    args = ap.parse_args()

    result = {
        "tool": "tools/verify_tpu.py",
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }

    devices, err = _watchdog_devices()
    if devices is None:
        result.update({"ok": False, "error": err, "checks": []})
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)
        print(json.dumps(result))
        sys.stdout.flush()
        os._exit(1)

    result["device"] = str(devices[0])
    result["platform"] = devices[0].platform
    try:
        checks = _run_checks()
        result["checks"] = checks
        result["ok"] = all(c["ok"] for c in checks)
    except Exception:  # noqa: BLE001
        result["ok"] = False
        result["error"] = traceback.format_exc()
        result.setdefault("checks", [])

    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({k: result[k] for k in ("ok", "device") if k in result}))
    for c in result["checks"]:
        print(f"  {'PASS' if c['ok'] else 'FAIL'} {c['check']} ({c['seconds']}s)"
              + ("" if c["ok"] else f" — {c['error']}"))
    return 0 if result["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
