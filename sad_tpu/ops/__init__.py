from .losses import (
    sigmoid_focal_loss,
    sigmoid_adaptive_distill_loss,
    select_smooth_l1_loss,
    smooth_l1_loss,
    pow_sum,
)
from .box_transforms import (
    bbox_transform,
    bbox_transform_inv,
    clip_boxes,
    bbox_overlaps,
)
from .nms import batched_nms, nms_fixed

__all__ = [
    "sigmoid_focal_loss",
    "sigmoid_adaptive_distill_loss",
    "select_smooth_l1_loss",
    "smooth_l1_loss",
    "pow_sum",
    "bbox_transform",
    "bbox_transform_inv",
    "clip_boxes",
    "bbox_overlaps",
    "batched_nms",
    "nms_fixed",
]
