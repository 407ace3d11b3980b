from pointseg.train.loss import (  # noqa: F401
    masked_onehot_cross_entropy,
    masked_cross_entropy_int,
    length_mask,
)
from pointseg.train.metrics import (  # noqa: F401
    overall_accuracy,
    update_accuracy,
    confusion_matrix,
    intersection_over_union,
    update_intersection_over_union,
    iou_from_totals,
    accuracy_from_one_hot,
)
