"""TPU drive: re-validate Faster R-CNN learning with the matmul RoIAlign.

Round-1 recorded Faster R-CNN (FPN) overfitting the synthetic set to
AP~0.94. The RoIAlign rewrite (separable tent-weight matmuls) changes
the accumulation order of every RoI feature; this re-runs the learning
proof at HEAD: 400 iters from scratch on the mini set, expect AP > 0.5
and descending loss through proposals -> sampling -> RoIAlign -> heads.

Run: PYTHONPATH="/root/repo:$PYTHONPATH" python tools_drives/rcnn_revalidation_drive.py
"""

import json
import os
import sys
import tempfile
import time

import numpy as np
from PIL import Image


def make_dataset(root, n=8):
    img_dir = os.path.join(root, "im")
    os.makedirs(img_dir)
    rng = np.random.RandomState(0)
    images, anns = [], []
    for i in range(1, n + 1):
        w, h = 96, 64
        arr = rng.randint(0, 50, (h, w, 3), dtype=np.uint8)
        x0, y0 = rng.randint(0, 40), rng.randint(0, 20)
        arr[y0:y0 + 24, x0:x0 + 36] = (210, 40, 40)
        Image.fromarray(arr).save(os.path.join(img_dir, f"{i:06d}.png"))
        images.append({"id": i, "file_name": f"{i:06d}.png",
                       "height": h, "width": w})
        anns.append({"id": i, "image_id": i, "category_id": 1,
                     "bbox": [int(x0), int(y0), 36, 24], "area": 864,
                     "iscrowd": 0})
    ann = os.path.join(root, "ann.json")
    with open(ann, "w") as f:
        json.dump({"images": images, "annotations": anns,
                   "categories": [{"id": 1, "name": "red"}]}, f)
    return img_dir, ann


def main():
    from sad_tpu.config import Config, register_dataset
    from sad_tpu.config.config import merge_cfg_from_dict
    from sad_tpu.eval.test_engine import test_net_on_dataset
    from sad_tpu.models import create_model
    from sad_tpu.train.train_loop import train_model

    root = tempfile.mkdtemp(prefix="rcnn_revalid_")
    img_dir, ann = make_dataset(root)
    register_dataset("rcnn_revalid", img_dir, ann, allow_override=True)

    cfg = merge_cfg_from_dict(Config(), {
        "MODEL": {"TYPE": "generalized_rcnn", "NUM_CLASSES": 2,
                  "CONV_BODY": "FPN.add_fpn_ResNet50_conv5_body",
                  "FASTER_RCNN": True},
        "NUM_GPUS": 1,
        "FPN": {"FPN_ON": True, "ROI_MIN_LEVEL": 2, "ROI_MAX_LEVEL": 5,
                "RPN_MIN_LEVEL": 2, "RPN_MAX_LEVEL": 6,
                "MULTILEVEL_RPN": True, "MULTILEVEL_ROIS": True,
                "COARSEST_STRIDE": 64},
        "RESNETS": {"CHANNEL_RATIO": 0.25},
        "FAST_RCNN": {"ROI_BOX_HEAD": "fast_rcnn_heads.add_roi_2mlp_head",
                      "ROI_XFORM_METHOD": "RoIAlign", "MLP_HEAD_DIM": 256},
        "TRAIN": {"SCALES": (64,), "MAX_SIZE": 128, "IMS_PER_BATCH": 2,
                  "DATASETS": ("rcnn_revalid",), "SNAPSHOT_ITERS": 100000,
                  "WEIGHTS": "", "BATCH_SIZE_PER_IM": 64,
                  "RPN_PRE_NMS_TOP_N": 256, "RPN_POST_NMS_TOP_N": 64},
        "TEST": {"SCALES": (64,), "MAX_SIZE": 128,
                 "DATASETS": ("rcnn_revalid",), "SCORE_THRESH": 0.05,
                 "RPN_PRE_NMS_TOP_N": 256, "RPN_POST_NMS_TOP_N": 64},
        "SOLVER": {"BASE_LR": 1e-3, "MAX_ITER": 400, "WARM_UP_ITERS": 100,
                   "WARM_UP_FACTOR": 0.1, "GAMMA": 0.1, "STEPS": (0,)},
        "PIXEL_STD": (57.375, 57.12, 58.395),
        "COMPUTE_DTYPE": "float32",
        "OUTPUT_DIR": os.path.join(root, "out"),
    })

    t0 = time.perf_counter()
    state = train_model(cfg)
    print(f"train: {time.perf_counter() - t0:.0f}s", flush=True)
    r = test_net_on_dataset(
        cfg, create_model(cfg), state.params,
        output_dir=os.path.join(root, "test"),
    )
    print(json.dumps({"AP": round(float(r["AP"]), 4),
                      "AP50": round(float(r["AP50"]), 4)}))
    assert r["AP"] > 0.5, "Faster R-CNN failed to overfit with matmul RoIAlign"
    print("DRIVE OK")


if __name__ == "__main__":
    sys.exit(main())
