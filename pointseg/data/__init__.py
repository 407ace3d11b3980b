from pointseg.data.s3dis import (  # noqa: F401
    S3DIS_CLASSES,
    S3DIS_CLASSES_13,
    NUM_S3DIS_CLASSES,
    BLOCK_SIZE,
    MIN_POINTS_PER_BLOCK,
    POINT_FEATURE_DIM,
    AREAS,
)
