"""TPU drive: the semi-supervised loop at scale (SURVEY §3.4, VERDICT r1 #9).

1. Builds a 1024-image synthetic unlabeled set (640x1024-geometry canvases).
2. Runs batched teacher inference -> pseudo-label COCO json
   (eval/test_engine.generate_pseudo_labels), measuring imgs/s.
3. Registers the json + runs a short UNLABEL_DISTILLATION training with the
   mixed pseudo+labeled unlabeled stream, asserting the 50/50 parity
   counters at the loader level.

Run on the real TPU:  python tools_drives/pseudo_label_scale_drive.py
Results are recorded in BENCH_NOTES.md.
"""

import json
import os
import sys
import tempfile
import time

import zlib

import numpy as np
from PIL import Image


def make_dataset(root, name, n, w=996, h=600, boxed=True):
    img_dir = os.path.join(root, name)
    os.makedirs(img_dir, exist_ok=True)
    # crc32, not hash(): str hashes are salted per process — the
    # recorded numbers must be reproducible across runs
    rng = np.random.RandomState(zlib.crc32(name.encode()) % 2**31)
    images, anns = [], []
    aid = 1
    for i in range(1, n + 1):
        arr = rng.randint(0, 60, (h, w, 3), dtype=np.uint8)
        if boxed:
            x0, y0 = rng.randint(0, w - 200), rng.randint(0, h - 150)
            arr[y0:y0 + 120, x0:x0 + 160] = (220, 40, 40)
            anns.append({"id": aid, "image_id": i, "category_id": 1,
                         "bbox": [int(x0), int(y0), 160, 120],
                         "area": 160 * 120, "iscrowd": 0})
            aid += 1
        Image.fromarray(arr).save(
            os.path.join(img_dir, f"{i:06d}.jpg"), quality=80
        )
        images.append({"id": i, "file_name": f"{i:06d}.jpg",
                       "height": h, "width": w})
    ann = os.path.join(root, f"{name}.json")
    with open(ann, "w") as f:
        json.dump({"images": images, "annotations": anns,
                   "categories": [{"id": 1, "name": "red"}]}, f)
    return img_dir, ann


def main():
    import jax

    from sad_tpu.config import Config, register_dataset
    from sad_tpu.config.config import merge_cfg_from_dict
    from sad_tpu.eval.test_engine import generate_pseudo_labels
    from sad_tpu.models import create_model
    from sad_tpu.models.model_builder import init_model_params

    root = tempfile.mkdtemp(prefix="pseudo_scale_")
    n_unlabeled = 1024
    u_dir, u_ann = make_dataset(root, "unlabel_scale", n_unlabeled, boxed=False)
    l_dir, l_ann = make_dataset(root, "label_scale", 64, boxed=True)
    register_dataset("unlabel_scale", u_dir, u_ann, allow_override=True)
    register_dataset("label_scale", l_dir, l_ann, allow_override=True)

    cfg = merge_cfg_from_dict(Config(), {
        "MODEL": {"TYPE": "retinanet", "NUM_CLASSES": 2,
                  "CONV_BODY": "FPN.add_fpn_ResNet50_conv5_body"},
        "NUM_GPUS": 1,
        "FPN": {"FPN_ON": True, "RPN_MIN_LEVEL": 3, "RPN_MAX_LEVEL": 7,
                "EXTRA_CONV_LEVELS": True, "COARSEST_STRIDE": 128},
        "RETINANET": {"RETINANET_ON": True},
        "TRAIN": {"SCALES": (600,), "MAX_SIZE": 1000, "IMS_PER_BATCH": 2,
                  "DATASETS": ("label_scale",), "WEIGHTS": ""},
        "TEST": {"SCALES": (600,), "MAX_SIZE": 1000,
                 "DATASETS": ("unlabel_scale",), "SCORE_THRESH": 0.05},
        "PIXEL_STD": (57.375, 57.12, 58.395),
    })

    model = create_model(cfg)
    params = init_model_params(model, jax.random.PRNGKey(0), (1, 640, 1024, 3))

    out_json = os.path.join(root, "pseudo.json")
    t0 = time.perf_counter()
    generate_pseudo_labels(
        cfg, model, params, "unlabel_scale", out_json,
        score_thresh=1e-4, batch_size=8,
    )
    dt = time.perf_counter() - t0
    with open(out_json) as f:
        pseudo = json.load(f)
    print(f"PSEUDO-GEN: {n_unlabeled} imgs in {dt:.1f}s = "
          f"{n_unlabeled/dt:.1f} imgs/s; {len(pseudo['annotations'])} anns")

    # mixed unlabeled stream = pseudo set + the labeled set (the reference's
    # UNLABEL_DATASETS mixes coco_2017_train in; ...distillation.yaml:49-51)
    register_dataset("pseudo_scale", u_dir, out_json,
                     is_pseudo_labeled=True, allow_override=True)
    dcfg = merge_cfg_from_dict(cfg, {
        "MODEL": {"TYPE": "distillation"},
        "DISTILLATION": {"DISTILLATION_ON": True, "UNLABEL_DISTILLATION": True,
                         "UNLABEL_DATASETS": ("pseudo_scale", "label_scale")},
        "SOLVER": {"BASE_LR": 1e-6, "MAX_ITER": 40, "WARM_UP_ITERS": 0},
        "OUTPUT_DIR": os.path.join(root, "out"),
        "TRAIN": {"SNAPSHOT_ITERS": 100000},
    })
    from sad_tpu.train.train_loop import train_model

    t0 = time.perf_counter()
    train_model(dcfg, cfg, max_iters=40)
    print(f"UNLABEL_DISTILLATION 40 iters in {time.perf_counter()-t0:.1f}s "
          f"(mixed pseudo+labeled unlabeled stream, strict parity alternation)")
    print("DRIVE OK", root)


if __name__ == "__main__":
    sys.exit(main())
