from .coco_eval import COCOEvaluator, evaluate_boxes
from .inference import decode_detections, make_inference_fn

__all__ = [
    "make_inference_fn",
    "decode_detections",
    "COCOEvaluator",
    "evaluate_boxes",
]

# Optional evaluators / engines (imported lazily by most callers):
#   .test_engine        dataset inference + TTA + pseudo-labels
#   .rcnn_inference     R-CNN decode + cascaded mask/keypoint heads
#   .rpn_generator      proposal dumps + recall metrics (RPN-only)
#   .test_augmentation  TTA transforms, soft-NMS, box voting
#   .vid_eval           VID protocol evaluation
#   .cityscapes_eval    cityscapes result export
#   .voc_eval           VOC protocol evaluation
