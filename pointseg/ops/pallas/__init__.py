"""Pallas TPU kernels for the hot geometric primitives.

Each kernel has a pure-JAX counterpart in `pointseg.ops` that serves as
the correctness oracle (tests compare them) and the fallback on
platforms without Mosaic support. Dispatch helpers pick the kernel on
TPU and the fallback elsewhere (`pointseg.ops.pallas.dispatch`).
"""

from pointseg.ops.pallas.knn import knn_indices_pallas  # noqa: F401
from pointseg.ops.pallas.ballquery import ball_query_pallas  # noqa: F401
from pointseg.ops.pallas.fps import farthest_point_sampling_pallas  # noqa: F401
from pointseg.ops.pallas.threenn import three_nn_pallas  # noqa: F401


# Mosaic's scoped-VMEM limit is 16 MiB (measured: the v5e compiler
# rejects kernels whose stack allocation exceeds it). Tile pickers cap
# per-row scratch to this budget, leaving headroom for in/out blocks
# and SSA live ranges.
SCOPED_VMEM_BUDGET = 10 * 2**20


def pick_tile(n: int, max_tile: int = 512, row_bytes: int | None = None) -> int | None:
    """Largest multiple-of-8 divisor of n that is <= max_tile, or None
    if the shape can't be tiled (callers fall back to the JAX oracle).

    `row_bytes` is the kernel's per-tile-row scratch footprint (e.g.
    4*N for a (tile, N) f32 distance block); when given, the tile is
    additionally capped so the scratch fits the scoped-VMEM budget —
    without this, large-N eval buckets (N >= 16384 at tile 512) exceed
    the 16 MiB limit and fail to compile."""
    if row_bytes:
        max_tile = min(max_tile, SCOPED_VMEM_BUDGET // max(1, row_bytes))
    for t in range(min(max_tile, n), 7, -1):
        if n % t == 0 and t % 8 == 0:
            return t
    return None
