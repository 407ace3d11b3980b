"""3-NN inverse-distance-weighted feature interpolation (upsampling).

TPU-native rebuild of `interpolate` in the reference
(models/utils/common.py:94-122). The reference materializes (B, N, M)
distances by broadcast expansion; here they come from the MXU matmul
form, and the top-k + gather + weighted-sum all fuse into one XLA
program. Weights use the same 1/(d²+1e-9) inverse-distance scheme,
normalized over the k neighbors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pointseg.ops.ballquery import pairwise_sqdist


def three_nn(
    coords_tgt: jax.Array,
    coords_src: jax.Array,
    k: int = 3,
    *,
    src_mask: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Finds the k nearest source points for every target point.

    Args:
        coords_tgt: (B, N, 3) points to interpolate *to*.
        coords_src: (B, M, 3) points that carry features.
        k: number of neighbors.
        src_mask: optional (B, M) bool; False sources are excluded.

    Returns:
        d2: (B, N, k) squared distances (ascending).
        idx: (B, N, k) int32 indices into M.
    """
    from pointseg.ops.dispatch import use_pallas

    if src_mask is None and use_pallas():
        from pointseg.ops.pallas import pick_tile
        from pointseg.ops.pallas.threenn import three_nn_pallas

        # same VMEM-budget cap as the wrapper (scratch rows span M)
        if pick_tile(coords_tgt.shape[1],
                     row_bytes=4 * coords_src.shape[1]) is not None:
            return three_nn_pallas(coords_tgt, coords_src, k)

    d2 = pairwise_sqdist(coords_tgt, coords_src)  # (B, N, M)
    if src_mask is not None:
        d2 = jnp.where(src_mask[:, None, :], d2, jnp.inf)
    neg, idx = jax.lax.top_k(-d2, k)
    return -neg, idx.astype(jnp.int32)


def interpolate(
    features: jax.Array,
    coords_tgt: jax.Array,
    coords_src: jax.Array,
    k: int = 3,
    eps: float = 1e-9,
    *,
    src_mask: jax.Array | None = None,
) -> jax.Array:
    """Inverse-distance-weighted k-NN interpolation.

    Mirrors the reference signature `interpolate(points, coords_1,
    coords_2)` (common.py:94-122): features live on `coords_src`
    (reference `coords_2`, M points) and are interpolated onto
    `coords_tgt` (reference `coords_1`, N points).

    Returns:
        (B, N, D) interpolated features.
    """
    from pointseg.ops.gather import gather_rows

    d2, idx = three_nn(coords_tgt, coords_src, k, src_mask=src_mask)
    neighbors = gather_rows(features, idx)  # (B, N, k, D)
    weights = 1.0 / (d2 + eps)  # (B, N, k)
    weights = weights / jnp.sum(weights, axis=-1, keepdims=True)
    return jnp.einsum(
        "bnk,bnkd->bnd", weights, neighbors, preferred_element_type=jnp.float32
    ).astype(features.dtype)
