"""Model zoo: the four reference families plus the MSG extension.

All models share one contract (resolving the reference's cross-stack
incompatibilities, SURVEY.md §2 L4): input is a channels-last
(B, N, 9) block batch, output is raw logits (B, N, num_classes).
"""

from pointseg.models.pointnet import (  # noqa: F401
    PointNetSeg,
    PointNetCls,
    PointNetEncoder,
)
from pointseg.models.pointnetpp import PointNetPP, PointNetPPMSG  # noqa: F401
from pointseg.models.pointnext import PointNeXt  # noqa: F401
from pointseg.models.dgcnn import DGCNN, DGCNNWithColor, get_model  # noqa: F401

from functools import partial

# CLI names match the reference's train.py choices (train.py:42).
# PointNetCls is exported above but NOT registered: the registry is the
# segmentation CLI surface ((B, N, C) logits) and PointNetCls emits
# per-cloud (B, C) logits — same reason the reference's train.py never
# offers it.
# PointNeXt-B/-L follow the official PointNeXt S3DIS depth schedule
# (blocks per stage); plain "PointNeXt" is the reference's exact model.
MODEL_REGISTRY = {
    "PointNet": PointNetSeg,
    "PointNet++": PointNetPP,
    "PointNet++MSG": PointNetPPMSG,
    "PointNeXt": PointNeXt,
    "PointNeXt-B": partial(PointNeXt, blocks=(2, 3, 2, 2)),
    "PointNeXt-L": partial(PointNeXt, blocks=(3, 5, 3, 3)),
    "DeepGraphCnn": DGCNNWithColor,
    "DGCNN": DGCNN,
}


def create_model(name: str, num_classes: int = 14, **kwargs):
    if name not in MODEL_REGISTRY:
        raise ValueError(
            f"Unknown model '{name}'. Choices: {sorted(MODEL_REGISTRY)}"
        )
    return MODEL_REGISTRY[name](num_classes=num_classes, **kwargs)
