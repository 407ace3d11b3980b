"""Fused k-nearest-source selection for IDW interpolation.

The pure-JAX `three_nn` materializes the (B, N, M) squared-distance
tensor in HBM and runs `lax.top_k` (a sort over M) per target row. This
kernel tiles target rows, keeps the (TILE, M) distance block in VMEM,
and extracts the k=3 nearest sources with k argmin passes; it returns
both the selected squared distances (for the 1/(d²+eps) weights) and
indices. The downstream gather + weighted sum stays in XLA — it is the
differentiable part (reference common.py:114-122).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _threenn_kernel(tgt_ref, src_ref, d_out_ref, idx_out_ref, dist_ref, *, k: int):
    q = tgt_ref[0]  # (TILE, 3)
    c = src_ref[0]  # (M, 3)
    q2 = jnp.sum(q * q, axis=-1, keepdims=True)
    c2 = jnp.sum(c * c, axis=-1, keepdims=True)
    cross = jax.lax.dot_general(
        q, c,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # weights are 1/d², tie-sensitive
    )
    dist_ref[:, :] = jnp.maximum(q2 - 2.0 * cross + c2.T, 0.0)  # (TILE, M)

    col = jax.lax.broadcasted_iota(jnp.int32, dist_ref.shape, 1)
    big = jnp.int32(2**30)
    for j in range(k):
        d = dist_ref[:, :]
        picked = jnp.min(d, axis=1, keepdims=True)
        idx = jnp.min(jnp.where(d == picked, col, big), axis=1).astype(jnp.int32)
        d_out_ref[0, :, j] = picked[:, 0]
        idx_out_ref[0, :, j] = idx
        dist_ref[:, :] = jnp.where(col == idx[:, None], jnp.inf, d)


@functools.partial(jax.jit, static_argnames=("k", "tile"))
def three_nn_pallas(
    coords_tgt: jax.Array,
    coords_src: jax.Array,
    k: int = 3,
    tile: int = 512,
) -> tuple[jax.Array, jax.Array]:
    """k nearest sources for every target point.

    Args:
        coords_tgt: (B, N, 3).
        coords_src: (B, M, 3).
    Returns:
        d2 (B, N, k) f32 ascending; idx (B, N, k) int32.
    """
    B, N, _ = coords_tgt.shape
    M = coords_src.shape[1]
    from pointseg.ops.pallas import pick_tile

    # re-pick even when N % tile == 0: the (tile, M) distance scratch
    # must fit the scoped-VMEM budget when the source set is large
    tile = pick_tile(N, tile, row_bytes=4 * M)
    if tile is None:
        raise ValueError(
            f"no valid tile for N={N}; pad the point count to a "
            "multiple of 8 or disable Pallas (POINTSEG_PALLAS=0)"
        )
    # selection is non-differentiable; keep AD out of the kernel
    coords_tgt = jax.lax.stop_gradient(coords_tgt.astype(jnp.float32))
    coords_src = jax.lax.stop_gradient(coords_src.astype(jnp.float32))

    grid = (B, N // tile)
    d2, idx = pl.pallas_call(
        functools.partial(_threenn_kernel, k=k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, 3), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, 3), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tile, k), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, k), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, k), jnp.float32),
            jax.ShapeDtypeStruct((B, N, k), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((tile, M), jnp.float32)],
    )(coords_tgt, coords_src)
    return d2, idx
