"""Farthest-point-sampling kernel.

The pure-JAX path (pointseg/ops/fps.py) is a `lax.fori_loop` whose
(B, N) running-distance carry round-trips HBM every one of the C
iterations (~13us/iteration of launch+memory overhead at B=8, N=4096).
This kernel runs the whole batch in ONE program with coordinates and
the distance buffer resident in VMEM: the C-step recurrence stays
sequential (it is inherently so), but each step is a few fused
(B, N)-wide VPU ops with no HBM traffic.

Layout notes:
- coordinates are taken as (B, 3, N): the last (lane) dimension must be
  wide — a (B, N, 3) VMEM block pads 3 lanes to 128 and blows the 16MB
  VMEM budget at B=8, N=4096.
- the per-step centroid gather (a different row per batch element) is a
  masked one-hot reduction; dynamic per-row gathers don't vectorize on
  the VPU, a (B, N) select + sum does.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fps_kernel(start_ref, coords_ref, out_ref, dist_ref, idx_ref, *, C: int):
    B = coords_ref.shape[0]
    N = coords_ref.shape[2]
    x = coords_ref[:, 0, :]  # (B, N)
    y = coords_ref[:, 1, :]
    z = coords_ref[:, 2, :]
    dist_ref[:, :] = jnp.full((B, N), jnp.inf, jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (B, N), 1)
    slot = jax.lax.broadcasted_iota(jnp.int32, (B, C), 1)
    start = start_ref[:, 0]  # (B,)

    def body(i, farthest):
        # scalar VMEM stores are unsupported; record via a masked
        # full-width write into the index buffer
        idx_ref[:, :] = jnp.where(slot == i, farthest[:, None], idx_ref[:, :])
        onehot = (col == farthest[:, None]).astype(jnp.float32)  # (B, N)
        cx = jnp.sum(onehot * x, axis=1)  # (B,)
        cy = jnp.sum(onehot * y, axis=1)
        cz = jnp.sum(onehot * z, axis=1)
        d = (
            (x - cx[:, None]) ** 2
            + (y - cy[:, None]) ** 2
            + (z - cz[:, None]) ** 2
        )  # (B, N)
        new = jnp.minimum(dist_ref[:, :], d)
        dist_ref[:, :] = new
        # first-occurrence argmax, written as max + masked index-min
        # (Mosaic's argmax lowering rejects some shapes)
        m = jnp.max(new, axis=1, keepdims=True)  # (B, 1)
        cand = jnp.where(new == m, col, jnp.int32(2**30))
        return jnp.min(cand, axis=1).astype(jnp.int32)  # (B,)

    jax.lax.fori_loop(0, C, body, start)
    out_ref[:, :] = idx_ref[:, :]


@functools.partial(jax.jit, static_argnames=("num_samples",))
def farthest_point_sampling_pallas(
    coords: jax.Array,
    num_samples: int,
    start_indices: jax.Array | None = None,
) -> jax.Array:
    """Iterative FPS; returns (B, C) int32 indices.

    Args:
        coords: (B, N, 3) f32.
        num_samples: C (static).
        start_indices: (B,) int32 initial picks (default all-zero; pass
            PRNG-drawn values for randomized starts).
    """
    B, N, _ = coords.shape
    if start_indices is None:
        start_indices = jnp.zeros((B,), jnp.int32)

    # Mosaic requires >= 8 sublanes on the (B, N) working buffers; pad
    # the batch (extra rows ride otherwise-idle VPU lanes) and slice.
    B_pad = max(8, -(-B // 8) * 8)
    if B_pad != B:
        pad = B_pad - B
        coords = jnp.concatenate(
            [coords, jnp.broadcast_to(coords[:1], (pad, N, 3))], axis=0
        )
        start_indices = jnp.concatenate(
            [start_indices, jnp.zeros((pad,), start_indices.dtype)], axis=0
        )
        return farthest_point_sampling_pallas(coords, num_samples, start_indices)[:B]

    # selection is non-differentiable; keep AD out of the kernel
    coords_t = jax.lax.stop_gradient(
        jnp.swapaxes(coords.astype(jnp.float32), 1, 2)
    )  # (B, 3, N)
    start_indices = start_indices.astype(jnp.int32).reshape(B, 1)

    return pl.pallas_call(
        functools.partial(_fps_kernel, C=num_samples),
        in_specs=[
            pl.BlockSpec((B, 1), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 3, N), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, num_samples), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, num_samples), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((B, N), jnp.float32),
            pltpu.VMEM((B, num_samples), jnp.int32),
        ],
    )(start_indices, coords_t)
