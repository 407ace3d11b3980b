"""Geometric primitives for point-cloud networks.

Each op has a pure-JAX implementation (the correctness oracle and
fallback) in this package; Pallas TPU kernels for the hot paths live in
`pointseg.ops.pallas` and are dispatched via `pointseg.ops.dispatch`.
"""

from pointseg.ops.fps import farthest_point_sampling, sample  # noqa: F401
from pointseg.ops.ballquery import ball_query, group, pairwise_sqdist  # noqa: F401
from pointseg.ops.interpolate import three_nn, interpolate  # noqa: F401
from pointseg.ops.knn import knn_indices, gather_neighbors, graph_feature  # noqa: F401
from pointseg.ops.pooling import reduce, masked_reduce  # noqa: F401
