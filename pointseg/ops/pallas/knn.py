"""Fused kNN-graph kernel.

The pure-JAX path (pointseg/ops/knn.py) materializes the full (B, N, N)
negative-distance matrix in HBM and runs `lax.top_k` (a full sort) over
it — at DGCNN scale (B=8, N=4096, four EdgeConv layers per forward)
that is 4 x 512MB of HBM traffic plus sort cost per training step.

This kernel tiles the query rows, computes the (TILE, N) distance block
on the MXU directly into VMEM, and extracts the k nearest neighbors with
k iterative argmax passes over the VMEM-resident block — the N² matrix
never touches HBM, and selection is O(k·N) per row instead of a sort.

Semantics match `knn_indices(include_self=True)` exactly for distinct
distances; ties resolve to the lowest index (same as lax.top_k/torch).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _knn_kernel(q_ref, c_ref, out_ref, dist_ref, *, k: int, n: int):
    q = q_ref[0]  # (TILE, F)
    c = c_ref[0]  # (N, F)
    q2 = jnp.sum(q * q, axis=-1, keepdims=True)  # (TILE, 1)
    c2 = jnp.sum(c * c, axis=-1, keepdims=True)  # (N, 1)
    cross = jax.lax.dot_general(
        q, c,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # selection is tie-sensitive
    )  # (TILE, N)
    # negative squared distance (larger = closer), reference dgcnn.py:16-18
    dist_ref[:, :] = 2.0 * cross - q2 - c2.T

    col = jax.lax.broadcasted_iota(jnp.int32, dist_ref.shape, 1)
    big = jnp.int32(2**30)
    for j in range(k):
        d = dist_ref[:, :]
        # first-occurrence argmax as max + masked index-min (Mosaic's
        # argmax lowering rejects some shapes)
        m = jnp.max(d, axis=1, keepdims=True)
        idx = jnp.min(jnp.where(d == m, col, big), axis=1).astype(jnp.int32)
        out_ref[0, :, j] = idx
        dist_ref[:, :] = jnp.where(col == idx[:, None], -jnp.inf, d)


def _knn_kernel_2l(q_ref, c_ref, out_ref, dist_ref, *, k: int, n: int, seg: int,
                   depth: int | None = None):
    """Two-level exact top-k extraction.

    The flat kernel above pays k full passes over the (TILE, N) distance
    block (max + tie-min + mask-update each) — VPU-bound at ~50%
    utilization and the dominant cost of the DGCNN step's four kNN
    calls (PROFILE_r02_bf16.json: ~5 ms/call).

    This variant partitions the N columns into S = `seg` STRIDED
    segments (segment s = columns {w*S + s}, i.e. lane s of the W =
    N/S width-S slices — index-contiguous columns land in distinct
    lanes, so spatially-local neighbor lists rarely collide) and keeps a
    per-segment top-2 stack in VMEM:

      level 1 (one fold over the W slices): per-lane (value, w) top-2.
      level 2 (k iterations on (TILE, S)): pick the global max among the
        lane heads, emit its packed column w*S + s, pop that lane's
        stack. A lane consumed twice re-fills lazily: one masked fold
        over the W slices (under `pl.when`, typically never taken)
        recomputes the lane's next element lex-after the last consumed
        (value desc, col asc) — exactness does not depend on the stack
        depth.

    Extraction order and tie handling (first occurrence = lowest column)
    are bit-identical to the flat kernel and `lax.top_k`.
    """
    from pointseg.ops.pallas.select2l import two_level_extract

    q = q_ref[0]
    c = c_ref[0]
    q2 = jnp.sum(q * q, axis=-1, keepdims=True)
    c2 = jnp.sum(c * c, axis=-1, keepdims=True)
    cross = jax.lax.dot_general(
        q, c,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    dist_ref[:, :] = 2.0 * cross - q2 - c2.T

    def emit(j, packed, _value):
        out_ref[0, :, j] = packed[:, 0]

    two_level_extract(dist_ref, k, seg, emit, depth=depth)


@functools.partial(jax.jit, static_argnames=("k", "tile", "seg", "depth"))
def knn_indices_pallas_2l(
    x: jax.Array, k: int, tile: int = 256, seg: int = 256,
    depth: int | None = None,
) -> jax.Array:
    """Two-level variant of :func:`knn_indices_pallas` (same contract).

    Requires N % seg == 0 with at least 2 slices; callers should fall
    back to the flat kernel otherwise.
    """
    B, N, F = x.shape
    from pointseg.ops.pallas import pick_tile

    # per-row scratch: the (tile, N) distance block plus the ~18
    # (tile, seg) level-2 state arrays (depth <= 5)
    tile = pick_tile(N, tile, row_bytes=4 * N + 18 * 4 * seg)
    if tile is None:
        raise ValueError(
            f"no valid tile for N={N}; pad the point count to a "
            "multiple of 8 or disable Pallas (POINTSEG_PALLAS=0)"
        )
    if N % seg != 0 or N // seg < 2:
        raise ValueError(f"two-level kNN needs N % {seg} == 0 and >=2 slices")
    x = jax.lax.stop_gradient(x.astype(jnp.float32))

    grid = (B, N // tile)
    return pl.pallas_call(
        functools.partial(_knn_kernel_2l, k=k, n=N, seg=seg, depth=depth),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, F), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, F), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile, k), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, N, k), jnp.int32),
        scratch_shapes=[pltpu.VMEM((tile, N), jnp.float32)],
    )(x, x)


@functools.partial(jax.jit, static_argnames=("k", "tile"))
def knn_indices_pallas(x: jax.Array, k: int, tile: int = 512) -> jax.Array:
    """k nearest neighbors (self included) under squared-L2.

    Args:
        x: (B, N, F) f32 point features; N must be a multiple of `tile`.
        k: neighbors per point (static).
        tile: query rows per kernel instance.
    Returns:
        (B, N, k) int32 neighbor indices.
    """
    B, N, F = x.shape
    from pointseg.ops.pallas import pick_tile

    # re-pick even when N % tile == 0: the (tile, N) distance scratch
    # must fit the scoped-VMEM budget at large eval buckets
    tile = pick_tile(N, tile, row_bytes=4 * N)
    if tile is None:
        raise ValueError(
            f"no valid tile for N={N}; pad the point count to a "
            "multiple of 8 or disable Pallas (POINTSEG_PALLAS=0)"
        )
    # selection is non-differentiable; keep AD out of the kernel
    x = jax.lax.stop_gradient(x.astype(jnp.float32))

    grid = (B, N // tile)
    return pl.pallas_call(
        functools.partial(_knn_kernel, k=k, n=N),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, F), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, F), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile, k), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, N, k), jnp.int32),
        scratch_shapes=[pltpu.VMEM((tile, N), jnp.float32)],
    )(x, x)
