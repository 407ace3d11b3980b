"""kNN graph construction + edge-feature gather for DGCNN.

TPU-native rebuild of `knn` / `get_graph_feature` in the reference
(models/dgcnn/dgcnn.py:7-57). The reference computes the full Gram-trick
pairwise distance (−‖x‖² − 2xᵀx − ‖x‖ᵀ²) and `topk(k)` of the negated
distance — note this *includes the point itself* as its own nearest
neighbor; we preserve that semantic (`include_self=True`) and expose a
flag to drop it.

Everything is channels-last (B, N, F): the Gram matrix is a single MXU
matmul, and the neighbor gather is a batched `take_along_axis` (no
flat-index `idx_base` arithmetic needed, unlike dgcnn.py:41-48).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def knn_indices(
    x: jax.Array,
    k: int,
    *,
    mask: jax.Array | None = None,
    include_self: bool = True,
) -> jax.Array:
    """k nearest neighbors of every point under squared-L2 distance.

    Args:
        x: (B, N, F) point features, channels-last.
        k: neighbors per point (static).
        mask: optional (B, N) bool validity mask; invalid points are
            never neighbors (and, being at distance +inf from
            everything, their own neighbor lists are arbitrary —
            consumers must mask downstream).
        include_self: keep the reference semantics of the self-point
            appearing in its own neighborhood (dgcnn.py:20).

    Returns:
        (B, N, k) int32 neighbor indices.
    """
    from pointseg.ops.dispatch import use_pallas

    if mask is None and include_self and use_pallas():
        from pointseg.ops.dispatch import use_select2l
        from pointseg.ops.pallas import pick_tile
        from pointseg.ops.pallas.knn import (
            knn_indices_pallas,
            knn_indices_pallas_2l,
        )
        from pointseg.ops.pallas.select2l import pick_seg

        # same VMEM-budget cap as the wrapper, so the guard and the
        # kernel agree about when Pallas applies (oracle otherwise)
        if pick_tile(x.shape[1], row_bytes=4 * x.shape[1]) is not None:
            seg = pick_seg(x.shape[1]) if use_select2l() else None
            if seg is not None:
                return knn_indices_pallas_2l(x, k, seg=seg)
            return knn_indices_pallas(x, k)

    x = x.astype(jnp.float32)
    x2 = jnp.sum(x * x, axis=-1)  # (B, N)
    gram = jnp.einsum(
        "bnf,bmf->bnm",
        x,
        x,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    # negative squared distance, as in the reference (dgcnn.py:16-18)
    neg_d2 = 2.0 * gram - x2[:, :, None] - x2[:, None, :]
    if not include_self:
        n = x.shape[1]
        eye = jnp.eye(n, dtype=bool)
        neg_d2 = jnp.where(eye[None], -jnp.inf, neg_d2)
    if mask is not None:
        neg_d2 = jnp.where(mask[:, None, :], neg_d2, -jnp.inf)
    _, idx = jax.lax.top_k(neg_d2, k)
    return idx.astype(jnp.int32)


def gather_neighbors(x: jax.Array, idx: jax.Array) -> jax.Array:
    """Gathers per-point neighbor features.

    Args:
        x: (B, N, F)
        idx: (B, N, k) indices into N.
    Returns:
        (B, N, k, F)
    """
    from pointseg.ops.gather import gather_rows

    return gather_rows(x, idx)


def graph_feature(
    x: jax.Array,
    k: int,
    *,
    idx: jax.Array | None = None,
    knn_on: jax.Array | None = None,
    mask: jax.Array | None = None,
) -> jax.Array:
    """Edge features cat(x_j − x_i, x_i) for dynamic-graph convolution.

    Mirrors `get_graph_feature` (dgcnn.py:24-57) in channels-last form:
    returns (B, N, k, 2F). The reference's `dim9` variant (kNN computed
    on a coordinate sub-slice) is expressed via `knn_on`: pass the
    array to build the graph from when it differs from `x`.
    """
    if idx is None:
        idx = knn_indices(x if knn_on is None else knn_on, k, mask=mask)
    neighbors = gather_neighbors(x, idx)  # (B, N, k, F)
    center = x[:, :, None, :]  # broadcast over k
    edge = neighbors - center
    center_k = jnp.broadcast_to(center, neighbors.shape)
    return jnp.concatenate([edge, center_k], axis=-1)
