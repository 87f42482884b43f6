"""TPU drive: pin the dtype story for mAP claims (VERDICT r1 weak #4).

bench.py measures throughput with COMPUTE_DTYPE=bfloat16, but accuracy
claims need evidence that bf16 trunks score like f32. This drive:

1. overfits the mini RetinaNet on a synthetic set in f32 (the round-1
   recipe: 600 iters, BASE_LR 1e-3, PIXEL_STD unit-scale),
2. evaluates the SAME checkpoint with COMPUTE_DTYPE float32 and bfloat16,
3. reports both APs and the max |prob| drift on a fixed batch.

Run on the real TPU: python tools_drives/dtype_parity_drive.py
Record the result in BENCH_NOTES.md / PARITY.md.
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

    root = tempfile.mkdtemp(prefix="dtype_parity_")
    img_dir, ann = make_dataset(root)
    register_dataset("dtype_parity", img_dir, ann, allow_override=True)

    base = {
        "MODEL": {"TYPE": "retinanet", "NUM_CLASSES": 2,
                  "CONV_BODY": "FPN.add_fpn_ResNet50_conv5_body"},
        "NUM_GPUS": 1,
        "FPN": {"FPN_ON": True, "RPN_MIN_LEVEL": 3, "RPN_MAX_LEVEL": 7,
                "EXTRA_CONV_LEVELS": True, "COARSEST_STRIDE": 128},
        "RETINANET": {"RETINANET_ON": True, "ASPECT_RATIOS": (1.0, 2.0),
                      "SCALES_PER_OCTAVE": 1},
        "RESNETS": {"CHANNEL_RATIO": 0.25},
        "TRAIN": {"SCALES": (64,), "MAX_SIZE": 128, "IMS_PER_BATCH": 2,
                  "DATASETS": ("dtype_parity",), "SNAPSHOT_ITERS": 100000,
                  "WEIGHTS": ""},
        "TEST": {"SCALES": (64,), "MAX_SIZE": 128,
                 "DATASETS": ("dtype_parity",), "SCORE_THRESH": 0.05},
        "SOLVER": {"BASE_LR": 1e-3, "MAX_ITER": 600, "WARM_UP_ITERS": 200,
                   "WARM_UP_FACTOR": 0.1, "GAMMA": 0.1, "STEPS": (0,)},
        "PIXEL_STD": (57.375, 57.12, 58.395),
        "COMPUTE_DTYPE": "float32",
        "OUTPUT_DIR": os.path.join(root, "out"),
    }
    cfg = merge_cfg_from_dict(Config(), base)

    from sad_tpu.train.train_loop import train_model

    t0 = time.perf_counter()
    state = train_model(cfg, max_iters=600)
    print(f"overfit train: {time.perf_counter()-t0:.0f}s", flush=True)

    from sad_tpu.eval.test_engine import test_net_on_dataset
    from sad_tpu.models import create_model

    results = {}
    for dtype in ("float32", "bfloat16"):
        dcfg = merge_cfg_from_dict(cfg, {"COMPUTE_DTYPE": dtype})
        model = create_model(dcfg)
        r = test_net_on_dataset(
            dcfg, model, state.params,
            output_dir=os.path.join(root, f"test_{dtype}"),
        )
        results[dtype] = r
        print(f"{dtype}: AP={r.get('AP'):.4f} AP50={r.get('AP50'):.4f}",
              flush=True)

    dap = abs(results["float32"]["AP"] - results["bfloat16"]["AP"])
    print(f"dtype AP gap: {dap:.4f}")
    print("DRIVE OK")


if __name__ == "__main__":
    sys.exit(main())
