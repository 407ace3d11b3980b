"""Farthest point sampling (FPS).

TPU-native rebuild of the reference's iterative FPS
(reference: models/utils/common.py:6-34). The reference runs a Python
loop of length C with a running min-distance buffer and an argmax per
iteration; here the loop is a `lax.fori_loop` so the whole sampler is a
single XLA program (one compilation, no per-iteration dispatch), and the
random start point comes from an explicit PRNG key instead of global
torch RNG state, making sampling reproducible.

Design notes (TPU):
- Squared distances are used throughout — `argmin`/`argmax` are
  invariant under sqrt, so we skip the transcendental the reference pays
  for via `linalg.vector_norm` (common.py:28).
- An optional validity `mask` keeps padded points out of the sample; the
  reference has no such notion (padded zeros can be selected,
  SURVEY.md "hard parts" (b)) — pass `mask=None` for reference parity.
- The distance buffer stays (B, N) resident; each iteration is one
  fused gather + FMA + select + argmax, which XLA keeps on the VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def farthest_point_sampling(
    coords: jax.Array,
    num_samples: int,
    *,
    key: jax.Array | None = None,
    start_indices: jax.Array | None = None,
    mask: jax.Array | None = None,
) -> jax.Array:
    """Iteratively selects `num_samples` mutually-far points per cloud.

    Args:
        coords: (B, N, 3) point coordinates.
        num_samples: number of points C to select (static).
        key: optional PRNG key for the random initial point (the
            reference draws `randint(0, N)`, common.py:22). If neither
            `key` nor `start_indices` is given, index 0 is used
            (deterministic eval mode).
        start_indices: optional (B,) explicit initial indices;
            overrides `key`.
        mask: optional (B, N) boolean validity mask. Invalid points are
            never selected (their distance contribution is forced to
            -inf) provided at least `num_samples` valid points exist.

    Returns:
        (B, C) int32 indices of the sampled points.
    """
    B, N, _ = coords.shape
    C = int(num_samples)

    if start_indices is not None:
        farthest0 = start_indices.astype(jnp.int32)
    elif key is not None:
        farthest0 = jax.random.randint(key, (B,), 0, N, dtype=jnp.int32)
        if mask is not None:
            # Redraw-free fix-up: map an invalid draw to the first valid point.
            first_valid = jnp.argmax(mask, axis=-1).astype(jnp.int32)
            drawn_valid = jnp.take_along_axis(mask, farthest0[:, None], axis=1)[:, 0]
            farthest0 = jnp.where(drawn_valid, farthest0, first_valid)
    else:
        if mask is not None:
            farthest0 = jnp.argmax(mask, axis=-1).astype(jnp.int32)
        else:
            farthest0 = jnp.zeros((B,), dtype=jnp.int32)

    from pointseg.ops.dispatch import use_pallas

    if mask is None and use_pallas():
        from pointseg.ops.pallas.fps import farthest_point_sampling_pallas

        return farthest_point_sampling_pallas(
            coords, C, start_indices=farthest0
        )

    coords = coords.astype(jnp.float32)
    distance0 = jnp.full((B, N), jnp.inf, dtype=jnp.float32)
    if mask is not None:
        # Invalid points can never become the running farthest point.
        distance0 = jnp.where(mask, distance0, -jnp.inf)

    indices0 = jnp.zeros((B, C), dtype=jnp.int32)

    def body(i, carry):
        distance, farthest, indices = carry
        indices = indices.at[:, i].set(farthest)
        centroid = jnp.take_along_axis(
            coords, farthest[:, None, None].astype(jnp.int32), axis=1
        )  # (B, 1, 3)
        dist = jnp.sum((coords - centroid) ** 2, axis=-1)  # (B, N)
        distance = jnp.minimum(distance, dist)
        farthest = jnp.argmax(distance, axis=-1).astype(jnp.int32)
        return distance, farthest, indices

    _, _, indices = jax.lax.fori_loop(0, C, body, (distance0, farthest0, indices0))
    return indices


def sample(
    coords: jax.Array,
    num_samples: int,
    *,
    key: jax.Array | None = None,
    mask: jax.Array | None = None,
) -> jax.Array:
    """Reference-shaped wrapper: returns sampled *coordinates* (B, C, 3)
    like `sample` in the reference (common.py:6-34), not indices."""
    idx = farthest_point_sampling(coords, num_samples, key=key, mask=mask)
    return jnp.take_along_axis(coords, idx[..., None], axis=1)
