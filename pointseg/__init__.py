"""pointseg — a TPU-native (JAX/XLA/Pallas) framework for 3D semantic
segmentation of point clouds.

A ground-up rebuild of the capabilities of the reference benchmark
(piotr-bledowski/3D-Semantic-Segmentation-Benchmark): the S3DIS data
pipelines, the shared geometric primitives (farthest point sampling,
ball-query grouping, kNN graphs, 3-NN inverse-distance interpolation),
the four model families (PointNet, PointNet++ SSG/MSG, PointNeXt, DGCNN),
and the training/eval harness with masked losses and streaming metrics —
re-designed TPU-first:

- static shapes + length masks everywhere (XLA compiles once),
- channels-last layouts so 1x1 convs are MXU matmuls,
- jitted end-to-end train/eval steps,
- Pallas kernels for the gather/scatter-heavy hot ops,
- SPMD data parallelism over a `jax.sharding.Mesh` (single chip is the
  degenerate 1-device mesh).
"""

__version__ = "0.1.0"

from pointseg.data.s3dis import S3DIS_CLASSES, NUM_S3DIS_CLASSES  # noqa: F401
