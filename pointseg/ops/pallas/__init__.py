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


def pick_tile(n: int, max_tile: int = 512) -> int | None:
    """Largest multiple-of-8 divisor of n that is <= max_tile, or None
    if the shape can't be tiled (callers fall back to the JAX oracle)."""
    for t in range(min(max_tile, n), 7, -1):
        if n % t == 0 and t % 8 == 0:
            return t
    return None
