"""Ball query + neighborhood grouping.

TPU-native rebuild of the reference's dense ball-query grouping
(reference: models/utils/common.py:37-71). The reference materializes a
(B, C, N) pairwise-distance tensor by broadcast expansion and runs
`topk(largest=False)`; here the distances are computed in matmul form
(‖c‖² − 2·c·xᵀ + ‖x‖²) so the O(C·N) work rides the MXU, and selection
uses `lax.top_k` on negated masked distances.

In-radius selection matches the reference exactly: distances beyond the
radius are set to +inf before the top-k, so each ball takes its K
nearest in-radius points (common.py:58-61). FILLER slots (balls with
fewer than K members) deliberately deviate: this implementation repeats
the ball's nearest member (slot 0 — the centroid itself whenever
centroids are drawn from the point set), the standard PointNet++
grouping semantics.

Why deviate: the reference's fillers are topk-over-+inf picks, and
torch's topk tie order among equal +inf values is IMPLEMENTATION-
DEFINED — measured on torch-CPU it returns quickselect partition
leftovers (index-clustered points near the pivot, varying with N and
K), and the CUDA kernel orders differently again. The reference
therefore injects *arbitrary out-of-radius points* into sparse balls,
differently on every backend — behavior that cannot be reproduced and
is not worth reproducing. Measured consequence of naive alternatives:
filling with lowest-index out-of-radius points feeds the SAME few
points into ~every sparse ball, which shifts eval-time activation
statistics enough to collapse whole-room evaluation (0.13 OA vs 0.67
for the torch reference on the same trained weights); repeating the
nearest member keeps every region purely in-radius and matches what
every mainstream PointNet++ implementation does.

An optional `mask` additionally excludes padded points from every ball
(an improvement the reference lacks); omit it for strict parity.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

_FILLER_FORCED: str | None = None


def set_filler_mode(value: str | None) -> None:
    """Force sparse-ball filler semantics; None restores the default.

    'repeat' (default): repeat the nearest member (standard PointNet++).
    'index': lowest-index out-of-radius points — a deterministic stand-in
    for the reference's backend-defined topk-over-inf picks, for
    experiments that need out-of-radius filler features (measured: on
    synthetic geometry-derived labels those arbitrary-far-point features
    are informative and lift ball-query-heavy models; see CLAUDE.md).
    """
    global _FILLER_FORCED
    if value is not None and value not in ("repeat", "index"):
        raise ValueError("filler mode must be 'repeat' or 'index'")
    _FILLER_FORCED = value


def filler_mode() -> str:
    if _FILLER_FORCED is not None:
        return _FILLER_FORCED
    return os.environ.get("POINTSEG_BQ_FILLER", "repeat")


def pairwise_sqdist(a: jax.Array, b: jax.Array) -> jax.Array:
    """Squared euclidean distances between two point sets.

    Args:
        a: (..., C, 3)
        b: (..., N, 3)
    Returns:
        (..., C, N) squared distances, computed in matmul form so the
        contraction maps onto the MXU. Clamped at 0 to absorb the small
        negative values the factored form can produce.
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    a2 = jnp.sum(a * a, axis=-1, keepdims=True)  # (..., C, 1)
    b2 = jnp.sum(b * b, axis=-1, keepdims=True)  # (..., N, 1)
    # HIGHEST precision: distances feed top-k selection and 1/d weights,
    # where the default bf16 matmul passes would visibly perturb results.
    cross = jnp.einsum(
        "...cd,...nd->...cn",
        a,
        b,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    d2 = a2 - 2.0 * cross + jnp.swapaxes(b2, -1, -2)
    return jnp.maximum(d2, 0.0)


def ball_query(
    centroids: jax.Array,
    coords: jax.Array,
    radius: float,
    K: int,
    *,
    mask: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """For each centroid, selects the K nearest points within `radius`.

    Args:
        centroids: (B, C, 3) query centers.
        coords: (B, N, 3) all points.
        radius: ball radius r; points with d² > r² are masked to +inf.
        K: neighbors per ball (static).
        mask: optional (B, N) bool; False points are excluded entirely.

    Returns:
        idx: (B, C, K) int32 indices into N. Slots beyond a sparse
            ball's member count repeat the nearest member (see module
            docstring for why this deviates from the reference).
        in_ball: (B, C, K) bool — True where the slot is a distinct
            in-radius selection (False marks repeated-filler slots).
    """
    from pointseg.ops.dispatch import use_pallas

    idx = None
    if mask is None and use_pallas():
        from pointseg.ops.dispatch import use_select2l
        from pointseg.ops.pallas import pick_tile
        from pointseg.ops.pallas.ballquery import (
            ball_query_pallas,
            ball_query_pallas_2l,
        )
        from pointseg.ops.pallas.select2l import pick_seg

        # same VMEM-budget cap as the wrapper (scratch rows span N)
        if pick_tile(centroids.shape[1], 256,
                     row_bytes=4 * coords.shape[1]) is not None:
            seg = pick_seg(coords.shape[1]) if use_select2l() else None
            if seg is not None:
                idx, in_ball = ball_query_pallas_2l(
                    centroids, coords, float(radius), K, seg=seg
                )
            else:
                idx, in_ball = ball_query_pallas(
                    centroids, coords, float(radius), K
                )

    if idx is None:
        d2 = pairwise_sqdist(centroids, coords)  # (B, C, N)
        r2 = jnp.float32(radius) ** 2
        inside = d2 <= r2
        if mask is not None:
            inside = inside & mask[:, None, :]
        # +inf outside, then K smallest (reference common.py:58-61)
        masked = jnp.where(inside, d2, jnp.inf)
        neg_top, idx = jax.lax.top_k(-masked, K)  # ties -> lowest index
        in_ball = neg_top > -jnp.inf
        idx = idx.astype(jnp.int32)

    # sparse balls: repeat the nearest member instead of admitting the
    # backend-defined out-of-radius picks (module docstring). Slot 0 is
    # always in-radius when centroids come from the point set (d²=0);
    # for a fully-empty ball (only possible with an exclusion mask) the
    # whole row is fillers and slot 0 passes through unchanged.
    # 'index' mode keeps the raw lowest-index out-of-radius picks (both
    # paths already emit them in ascending index order).
    if filler_mode() == "repeat":
        idx = jnp.where(in_ball, idx, idx[..., :1])
    return idx, in_ball


def group(
    centroids: jax.Array,
    coords: jax.Array,
    features: jax.Array,
    radius: float,
    K: int,
    normalize: bool = False,
    *,
    mask: jax.Array | None = None,
) -> jax.Array:
    """Ball-query grouping: gathers local regions around each centroid.

    Mirrors `group` in the reference (common.py:37-71): gathers coords
    and features of the K selected points, re-centers coordinates to the
    centroid, optionally divides by the radius (PointNeXt's
    `grouping_norm`), and concatenates along the channel axis.

    Returns:
        (B, C, K, 3 + D) grouped regions, channels-last.
    """
    from pointseg.ops.gather import gather_rows

    idx, _ = ball_query(centroids, coords, radius, K, mask=mask)
    grouped_coords = gather_rows(coords, idx)  # (B, C, K, 3)
    grouped_features = gather_rows(features, idx)  # (B, C, K, D)
    grouped_coords = grouped_coords - centroids[:, :, None, :]
    if normalize:
        grouped_coords = grouped_coords / jnp.float32(radius)
    return jnp.concatenate([grouped_coords, grouped_features], axis=-1)
