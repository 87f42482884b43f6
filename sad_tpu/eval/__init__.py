from .inference import make_inference_fn, decode_detections
from .coco_eval import COCOEvaluator, evaluate_boxes

__all__ = [
    "make_inference_fn",
    "decode_detections",
    "COCOEvaluator",
    "evaluate_boxes",
]
