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
