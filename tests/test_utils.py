import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointseg.models import PointNetSeg
from pointseg.utils.benchmark import benchmark_fn, benchmark_points_per_sec
from pointseg.utils.memory import format_memory_usage, get_memory_usage
from pointseg.utils.sliding_window import (
    predict_single_scene,
    predict_single_scene_device,
)

C = 14


def _forward():
    model = PointNetSeg(num_classes=C)
    variables = model.init({"params": jax.random.key(0)}, jnp.zeros((1, 64, 9)))

    @jax.jit
    def fwd(points, lengths):
        from pointseg.train.loss import length_mask

        mask = length_mask(lengths, points.shape[1])
        return model.apply(variables, points, train=False, mask=mask)

    return fwd


def test_sliding_window_small_scene(rng):
    fwd = _forward()
    pts = rng.normal(size=(40, 9)).astype(np.float32)
    preds, conf = predict_single_scene(fwd, pts, window_size=64, overlap=16)
    assert preds.shape == (40,) and conf.shape == (40,)
    assert (conf > 0).all() and (conf <= 1).all()


def test_sliding_window_overlap_covers_everything(rng):
    fwd = _forward()
    pts = rng.normal(size=(200, 9)).astype(np.float32)
    preds, conf = predict_single_scene(fwd, pts, window_size=64, overlap=16)
    assert preds.shape == (200,)
    assert (preds >= 0).all() and (preds < C).all()


def test_sliding_window_matches_single_pass_when_fits(rng):
    """A scene that fits in one window must equal the direct forward."""
    fwd = _forward()
    pts = rng.normal(size=(64, 9)).astype(np.float32)
    preds, _ = predict_single_scene(fwd, pts, window_size=64, overlap=16)
    direct = np.asarray(
        fwd(jnp.asarray(pts[None]), jnp.asarray([64]))
    )[0].argmax(-1)
    np.testing.assert_array_equal(preds, direct)


def test_benchmark_fn(rng):
    f = jax.jit(lambda x: x * 2)
    x = jnp.ones((8, 8))
    stats = benchmark_fn(f, x, num_runs=3, warmup=1)
    assert stats["mean_s"] > 0 and stats["fps"] > 0
    stats = benchmark_points_per_sec(f, x, points_per_call=64, num_runs=3, warmup=1)
    assert stats["points_per_sec"] > 0


def test_pick_chunk_sync_amortization():
    """Chunk sizing must keep the serial end-of-chunk sync <=5% of the
    chunk (AB_SYNC_CHUNK_r05.json): at the measured relay numbers
    (sync 29 ms, PointNet ~2.4 ms/step seen as ~5.3 ms in a 10-step
    pilot) it must NOT stay at the historically-inflating 10."""
    from pointseg.utils.benchmark import pick_chunk

    # relay regime: sync 29 ms, pilot 5.3 ms/step (2.4 true + 2.9 sync/10)
    c = pick_chunk(0.029, 0.0053)
    assert c >= 200  # 20*0.029/0.0024 ≈ 242
    # slow model (DGCNN 72 ms steps): sync negligible, stays at the floor
    assert pick_chunk(0.029, 0.0749) == 10
    assert pick_chunk(0.029, 0.0749, lo=5) == 8
    # CPU regime: sub-ms sync, floor
    assert pick_chunk(0.0003, 0.005) == 10
    # pathological pilot (sync >> pilot): est falls back to pilot/4, capped
    assert pick_chunk(0.1, 0.002) == 300


def test_memory_usage_shape():
    m = get_memory_usage()
    assert "devices" in m and len(m["devices"]) >= 1
    assert isinstance(format_memory_usage(), str)


def test_visualize_predictions(tmp_path, rng):
    try:
        import matplotlib  # noqa: F401
    except ImportError:
        import pytest

        pytest.skip("matplotlib not installed")
    from pointseg.utils.visualize import plot_confusion_matrix, visualize_predictions

    pts = rng.normal(size=(100, 3)).astype(np.float32)
    preds = rng.integers(0, C, 100)
    labels = rng.integers(0, C, 100)
    p = visualize_predictions(pts, preds, labels, save_path=str(tmp_path / "v.png"))
    assert (tmp_path / "v.png").exists()
    m = rng.integers(0, 50, (C, C))
    p = plot_confusion_matrix(m, save_path=str(tmp_path / "c.png"))
    assert (tmp_path / "c.png").exists()


@pytest.mark.parametrize("n", [40, 64, 100, 200, 313])
def test_device_stream_matches_host_loop(rng, n):
    """The device-resident scan-over-windows path must reproduce the
    host per-window loop — same schedule, same masked forwards, same
    overlap averaging — for every size regime: sub-window, exactly one
    window, multi-window divisible and not.

    This is the documented f32 EXACTNESS guarantee (docs/MIGRATION.md,
    `evaluate --stream` help): argmax bit-identical in f32
    (assert_array_equal below, and ROOMS_BENCH_r03.json mismatch=0 on
    chip at real room sizes). bf16 carries no such guarantee — its
    reduction-order tie-breaks flip ~0.16% of near-uniform-confidence
    points; do not weaken this test to a tolerance to accommodate a
    bf16 path."""
    fwd = _forward()
    pts = rng.normal(size=(n, 9)).astype(np.float32)
    want_p, want_c = predict_single_scene(fwd, pts, window_size=64, overlap=16)
    got_p, got_c = predict_single_scene_device(
        fwd, pts, window_size=64, overlap=16, num_classes=C
    )
    np.testing.assert_array_equal(got_p, want_p)
    np.testing.assert_allclose(got_c, want_c, atol=1e-5)


def test_device_stream_bucket_reuse(rng):
    """Rooms within the same size bucket reuse one compiled program."""
    from pointseg.utils.sliding_window import _bucket, _device_scene_fn

    assert _bucket(1) == 4096
    assert _bucket(4096) == 4096
    assert _bucket(4097) == 5120  # next geometric step, 512-aligned
    # geometric growth keeps the compile count logarithmic
    assert _bucket(3_000_000) / 3_000_000 < 1.25
    fwd = _forward()
    before = _device_scene_fn.cache_info().misses
    for n in (70, 90, 110):  # all land in the same bucket
        predict_single_scene_device(fwd, rng.normal(size=(n, 9)).astype(np.float32),
                                    window_size=64, overlap=16, num_classes=C)
    assert _device_scene_fn.cache_info().misses == before + 1


def test_host_cache_dir_is_host_keyed():
    """Compile-cache dirs embed a host fingerprint: XLA:CPU persists AOT
    machine code, and loading artifacts compiled on a different-microarch
    host risks SIGILL (the AOT loader's own warning). Same host -> stable
    path; the suffix must derive from CPU identity, not randomness."""
    from pointseg.runtime import host_cache_dir, host_fingerprint

    a = host_cache_dir("/tmp/x")
    assert a == host_cache_dir("/tmp/x")  # deterministic
    assert a.startswith("/tmp/x-") and len(a) == len("/tmp/x-") + 10
    assert host_fingerprint() in a
