"""Fused ball-query kernel.

The pure-JAX path materializes (B, C, N) distances in HBM and sorts via
`lax.top_k`. This kernel tiles the centroids, keeps the (TILE, N)
distance block in VMEM (MXU matmul), masks out-of-radius entries to
finite index-ordered sentinels, and selects the K nearest with K
iterative argmin passes. Raw outputs match the JAX oracle's
topk-over-inf selection (in-radius slots: K nearest; filler slots:
ascending-index out-of-radius picks); the `ops.ball_query` wrapper then
replaces filler slots with the nearest member on either path (see
pointseg/ops/ballquery.py for the semantics rationale).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ballquery_kernel(cent_ref, pts_ref, out_ref, inball_ref, dist_ref, *, K: int, r2: float):
    q = cent_ref[0]  # (TILE, 3)
    c = pts_ref[0]  # (N, 3)
    q2 = jnp.sum(q * q, axis=-1, keepdims=True)
    c2 = jnp.sum(c * c, axis=-1, keepdims=True)
    cross = jax.lax.dot_general(
        q, c,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # radius test is tie-sensitive
    )
    d2 = jnp.maximum(q2 - 2.0 * cross + c2.T, 0.0)  # (TILE, N)
    col = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    # Out-of-radius entries get FINITE, index-ordered sentinels so that a
    # sparse ball selects DISTINCT fillers in ascending index order —
    # the same arbitrary-filler semantics as topk-over-inf in the oracle
    # and the reference (common.py:58-61). Sentinel spacing (16) exceeds
    # the f32 ulp at 1e8, so each column stays distinct; real d2 values
    # (room-scale coordinates) are orders of magnitude below 1e8.
    sentinel = 1e8 + col.astype(jnp.float32) * 16.0
    dist_ref[:, :] = jnp.where(d2 <= r2, d2, sentinel)

    big = jnp.int32(2**30)
    for j in range(K):
        d = dist_ref[:, :]
        # first-occurrence argmin as min + masked index-min (Mosaic's
        # argmin lowering rejects some shapes)
        picked = jnp.min(d, axis=1, keepdims=True)
        idx = jnp.min(jnp.where(d == picked, col, big), axis=1).astype(jnp.int32)
        out_ref[0, :, j] = idx
        inball_ref[0, :, j] = (picked[:, 0] < 1e7).astype(jnp.int32)
        dist_ref[:, :] = jnp.where(col == idx[:, None], jnp.inf, d)


def _ballquery_kernel_2l(
    cent_ref, pts_ref, out_ref, inball_ref, dist_ref, *, K: int, r2: float,
    seg: int,
):
    """Two-level variant: same outputs as `_ballquery_kernel`, selection
    via the shared strided-lane extractor (pointseg/ops/pallas/select2l.py)
    instead of K full argmin passes. Scores are NEGATED distances so the
    extractor's (value desc, col asc) order equals (distance asc, col
    asc) — bit-identical picks incl. the index-ordered sentinel fillers.
    """
    from pointseg.ops.pallas.select2l import two_level_extract

    q = cent_ref[0]
    c = pts_ref[0]
    q2 = jnp.sum(q * q, axis=-1, keepdims=True)
    c2 = jnp.sum(c * c, axis=-1, keepdims=True)
    cross = jax.lax.dot_general(
        q, c,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # radius test is tie-sensitive
    )
    d2 = jnp.maximum(q2 - 2.0 * cross + c2.T, 0.0)
    col = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    sentinel = 1e8 + col.astype(jnp.float32) * 16.0
    dist_ref[:, :] = -jnp.where(d2 <= r2, d2, sentinel)

    def emit(j, packed, value):
        out_ref[0, :, j] = packed[:, 0]
        inball_ref[0, :, j] = (value[:, 0] > -1e7).astype(jnp.int32)

    two_level_extract(dist_ref, K, seg, emit)


@functools.partial(jax.jit, static_argnames=("radius", "K", "tile"))
def ball_query_pallas(
    centroids: jax.Array,
    coords: jax.Array,
    radius: float,
    K: int,
    tile: int = 256,
) -> tuple[jax.Array, jax.Array]:
    """K nearest points within `radius` of each centroid.

    Args:
        centroids: (B, C, 3) query centers.
        coords: (B, N, 3) all points.
    Returns:
        idx (B, C, K) int32; in_ball (B, C, K) bool.
    """
    B, C, _ = centroids.shape
    N = coords.shape[1]
    from pointseg.ops.pallas import pick_tile

    # re-pick even when C % tile == 0: the (tile, N) distance scratch
    # must fit the scoped-VMEM budget at large eval buckets
    tile = pick_tile(C, tile, row_bytes=4 * N)
    if tile is None:
        raise ValueError(
            f"no valid tile for C={C}; pad the point count to a "
            "multiple of 8 or disable Pallas (POINTSEG_PALLAS=0)"
        )
    # selection is non-differentiable; keep AD out of the kernel
    centroids = jax.lax.stop_gradient(centroids.astype(jnp.float32))
    coords = jax.lax.stop_gradient(coords.astype(jnp.float32))

    grid = (B, C // tile)
    idx, in_ball = pl.pallas_call(
        functools.partial(_ballquery_kernel, K=K, r2=float(radius) ** 2),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, 3), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, 3), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tile, K), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, K), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, C, K), jnp.int32),
            jax.ShapeDtypeStruct((B, C, K), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((tile, N), jnp.float32)],
    )(centroids, coords)
    return idx, in_ball.astype(bool)


@functools.partial(jax.jit, static_argnames=("radius", "K", "tile", "seg"))
def ball_query_pallas_2l(
    centroids: jax.Array,
    coords: jax.Array,
    radius: float,
    K: int,
    tile: int = 256,
    seg: int = 256,
) -> tuple[jax.Array, jax.Array]:
    """Two-level variant of :func:`ball_query_pallas` (same contract).

    Requires N % seg == 0 with at least 2 slices; callers should fall
    back to the flat kernel otherwise.
    """
    B, C, _ = centroids.shape
    N = coords.shape[1]
    from pointseg.ops.pallas import pick_tile

    # per-row scratch: the (tile, N) distance block plus the ~18
    # (tile, seg) level-2 state arrays (depth <= 5)
    tile = pick_tile(C, tile, row_bytes=4 * N + 18 * 4 * seg)
    if tile is None:
        raise ValueError(
            f"no valid tile for C={C}; pad the point count to a "
            "multiple of 8 or disable Pallas (POINTSEG_PALLAS=0)"
        )
    if N % seg != 0 or N // seg < 2:
        raise ValueError(f"two-level ball query needs N % {seg} == 0 and >=2 slices")
    centroids = jax.lax.stop_gradient(centroids.astype(jnp.float32))
    coords = jax.lax.stop_gradient(coords.astype(jnp.float32))

    grid = (B, C // tile)
    idx, in_ball = pl.pallas_call(
        functools.partial(
            _ballquery_kernel_2l, K=K, r2=float(radius) ** 2, seg=seg
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, 3), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, 3), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tile, K), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, K), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, C, K), jnp.int32),
            jax.ShapeDtypeStruct((B, C, K), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((tile, N), jnp.float32)],
    )(centroids, coords)
    return idx, in_ball.astype(bool)
