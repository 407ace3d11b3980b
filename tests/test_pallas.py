"""Pallas kernels vs their pure-JAX oracles, in interpret mode on CPU.

On real TPU the same comparisons run compiled (see tools/ and the
verify skill); here Mosaic interpret mode checks kernel logic in CI.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from pointseg import ops
from pointseg.ops.dispatch import set_use_pallas
from pointseg.ops.pallas import (
    ball_query_pallas,
    farthest_point_sampling_pallas,
    knn_indices_pallas,
)


@pytest.fixture(autouse=True)
def _force_jax_oracle():
    # oracle calls must not dispatch back into pallas
    set_use_pallas(False)
    yield
    set_use_pallas(None)


@pytest.fixture(autouse=True)
def _interpret_mode():
    with pltpu.force_tpu_interpret_mode():
        yield


def test_knn_kernel_matches_oracle(rng):
    x = jnp.asarray(rng.normal(size=(2, 128, 8)).astype(np.float32))
    ref = np.asarray(ops.knn_indices(x, 6))
    got = np.asarray(knn_indices_pallas(x, 6, tile=64))
    np.testing.assert_array_equal(ref, got)


def test_knn_two_level_matches_oracle(rng):
    from pointseg.ops.pallas.knn import knn_indices_pallas_2l

    x = jnp.asarray(rng.normal(size=(2, 256, 8)).astype(np.float32))
    ref = np.asarray(ops.knn_indices(x, 6))
    got = np.asarray(knn_indices_pallas_2l(x, 6, tile=128, seg=128))
    np.testing.assert_array_equal(ref, got)


@pytest.mark.parametrize("seed,depth,k", [(0, 2, 20), (1, 3, 12), (2, 4, 7),
                                          (3, 2, 31)])
def test_knn_two_level_random_depths(seed, depth, k):
    """Randomized guard across stack depths: shallow depths force the
    lazy refill path constantly (uniform lane draws birthday-collide),
    deep ones exercise the long shift chains. W=2 slices maximizes
    same-lane traffic."""
    from pointseg.ops.pallas.knn import knn_indices_pallas_2l

    r = np.random.default_rng(seed)
    x = jnp.asarray(r.normal(size=(2, 256, 16)).astype(np.float32))
    flat = np.asarray(knn_indices_pallas(x, k, tile=64))
    two = np.asarray(knn_indices_pallas_2l(x, k, tile=64, seg=128, depth=depth))
    np.testing.assert_array_equal(flat, two)


def test_knn_two_level_matches_flat_on_ties(rng):
    """Heavy ties + lane exhaustion: duplicated coordinates force the
    lazy refill path and same-lane tie chains. The two kernels compute
    the identical in-kernel distance block, so their selections must be
    bit-identical (the oracle can differ by 1-ulp distance
    reassociation in interpret mode, so flat-vs-2l is the exact
    comparison here; oracle equality at scale is chip-verified by
    tools/verify_tpu.py)."""
    from pointseg.ops.pallas.knn import knn_indices_pallas_2l

    xc = np.round(rng.normal(size=(2, 512, 3)), 1).astype(np.float32)
    # a whole strided lane coincides: forces >2 extractions from lane 7
    for b in range(2):
        for w in range(4):
            xc[b, 7 + w * 128] = (b, 0.0, 0.0)
    x = jnp.asarray(xc)
    flat = np.asarray(knn_indices_pallas(x, 20, tile=128))
    two = np.asarray(knn_indices_pallas_2l(x, 20, tile=128, seg=128))
    np.testing.assert_array_equal(flat, two)


def test_ballquery_kernel_matches_oracle(rng):
    coords = jnp.asarray(rng.normal(size=(2, 128, 3)).astype(np.float32) * 0.5)
    cents = coords[:, :32]
    ridx, rin = ops.ball_query(cents, coords, 0.5, 8)
    gidx, gin = ball_query_pallas(cents, coords, 0.5, 8, tile=32)
    np.testing.assert_array_equal(np.asarray(rin), np.asarray(gin))
    # same selected member sets (within-K order may differ on fp ties).
    # ops.ball_query post-processes fillers to repeat the nearest member
    # while the raw kernel emits its sentinel picks, so compare the
    # in-ball slots only.
    ridx, gidx = np.asarray(ridx), np.asarray(gidx)
    rin = np.asarray(rin)
    for b in range(2):
        for c in range(32):
            m = rin[b, c]
            assert set(ridx[b, c][m].tolist()) == set(gidx[b, c][m].tolist())


def test_fps_kernel_matches_oracle(rng):
    coords = jnp.asarray(rng.normal(size=(2, 128, 3)).astype(np.float32))
    start = jnp.array([5, 77], jnp.int32)
    ref = np.asarray(
        ops.farthest_point_sampling(coords, 32, start_indices=start)
    )
    got = np.asarray(
        farthest_point_sampling_pallas(coords, 32, start_indices=start)
    )
    np.testing.assert_array_equal(ref, got)


def test_kernels_are_gradient_opaque(rng):
    """Kernels sit inside differentiated graphs; AD must pass through."""
    x = jnp.asarray(rng.normal(size=(1, 64, 4)).astype(np.float32))

    def loss(x):
        idx = knn_indices_pallas(x, 4, tile=32)
        neighbors = ops.gather_neighbors(x, idx)
        return jnp.sum(neighbors**2)

    g = jax.grad(loss)(x)
    assert g.shape == x.shape
    assert bool(jnp.isfinite(g).all())


def test_pick_tile():
    from pointseg.ops.pallas import pick_tile

    assert pick_tile(4096) == 512
    assert pick_tile(1024, 256) == 256
    assert pick_tile(48) == 48 and 48 % 8 == 0
    assert pick_tile(1500) is None  # no multiple-of-8 divisor
    assert pick_tile(7) is None
    # scoped-VMEM cap: a (tile, N) f32 scratch must fit the budget, so
    # big eval buckets get small tiles instead of failing to compile
    assert pick_tile(4096, 512, row_bytes=4 * 4096) == 512  # fits as-is
    assert pick_tile(16384, 512, row_bytes=4 * 16384) == 128
    assert pick_tile(65536, 512, row_bytes=4 * 65536) == 32


def test_pick_seg():
    from pointseg.ops.pallas.select2l import pick_seg

    assert pick_seg(4096) == 256
    assert pick_seg(256) == 128
    assert pick_seg(8192) == 256
    assert pick_seg(16384) is None  # W cap: fall back to flat
    assert pick_seg(1500) is None


def test_ops_fall_back_to_oracle_for_untileable_shapes(rng):
    """N with no multiple-of-8 divisor must route to the JAX oracle
    instead of crashing, even with Pallas dispatch forced on."""
    set_use_pallas(True)
    try:
        x = jnp.asarray(rng.normal(size=(1, 30, 4)).astype(np.float32))
        idx = ops.knn_indices(x, 3)  # N=30 -> oracle
        assert idx.shape == (1, 30, 3)
        coords = jnp.asarray(rng.normal(size=(1, 30, 3)).astype(np.float32))
        i, _ = ops.ball_query(coords[:, :6], coords, 0.5, 4)  # C=6 -> oracle
        assert i.shape == (1, 6, 4)
        d2, i3 = ops.three_nn(coords, coords[:, :10])
        assert i3.shape == (1, 30, 3)
    finally:
        set_use_pallas(None)


def test_select2l_dispatch_matches_flat(rng):
    """POINTSEG_SELECT2L routes ops.knn_indices / ops.ball_query to the
    two-level kernels; results must be identical to the flat kernels."""
    from pointseg.ops.dispatch import set_use_select2l

    x = jnp.asarray(rng.normal(size=(2, 256, 8)).astype(np.float32))
    coords = jnp.asarray(rng.normal(size=(2, 256, 3)).astype(np.float32) * 0.5)
    cents = coords[:, :64]
    set_use_pallas(True)
    try:
        set_use_select2l(False)
        knn_flat = np.asarray(ops.knn_indices(x, 6))
        bq_flat, ib_flat = ops.ball_query(cents, coords, 0.4, 8)
        set_use_select2l(True)
        knn_two = np.asarray(ops.knn_indices(x, 6))
        bq_two, ib_two = ops.ball_query(cents, coords, 0.4, 8)
    finally:
        set_use_select2l(None)
        set_use_pallas(None)
    np.testing.assert_array_equal(knn_flat, knn_two)
    np.testing.assert_array_equal(np.asarray(bq_flat), np.asarray(bq_two))
    np.testing.assert_array_equal(np.asarray(ib_flat), np.asarray(ib_two))


def test_knn_kernel_bf16_input_upcasts(rng):
    """bf16-activation models feed bf16 features to kNN; the kernel
    upcasts to f32 before the distance matmul (tie-exact selection),
    so bf16 input must select identically to its f32 upcast."""
    x16 = jnp.asarray(
        rng.normal(size=(2, 128, 8)).astype(np.float32)).astype(jnp.bfloat16)
    ref = np.asarray(knn_indices_pallas(x16.astype(jnp.float32), 6, tile=64))
    got = np.asarray(knn_indices_pallas(x16, 6, tile=64))
    np.testing.assert_array_equal(ref, got)


@pytest.mark.parametrize("variant", ["dma", "flat"])
def test_native_gather_matches_take_along_axis(rng, variant):
    """Experimental row-gather kernels (ops/pallas/gather.py) vs the
    XLA oracle. These are the reproducible record of a negative result
    (Mosaic rejects them on hardware — see the module docstring);
    interpret mode proves the kernel logic itself is exact, so the
    rejection evidence in AB_NATIVE_GATHER_r02.json is about hardware
    constraints, not kernel bugs."""
    from pointseg.ops.pallas.gather import gather_rows_dma, gather_rows_flat

    B, N, C, M = 2, 128, 16, 256
    table = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, N, size=(B, M)).astype(np.int32))
    want = np.asarray(jnp.take_along_axis(table, idx[:, :, None], axis=1))
    if variant == "flat":
        flat_idx = (idx + (jnp.arange(B) * N)[:, None]).reshape(-1)
        got = np.asarray(
            gather_rows_flat(table.reshape(B * N, C), flat_idx,
                             chunk=128, window=4)
        ).reshape(B, M, C)
    else:
        got = np.asarray(gather_rows_dma(table, idx, chunk=128, window=4))
    np.testing.assert_array_equal(want, got)
