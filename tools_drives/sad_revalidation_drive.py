"""TPU drive: re-validate the SAD distillation proof on the CURRENT stack.

Round-1 established (BENCH_NOTES): plain mini RetinaNet overfits to
AP~0.82, and a student distilled from that checkpoint reaches AP~0.94 —
the distillation gain reproduces. This drive re-runs that proof at HEAD,
which now exercises: the uint8-canvas loader path with on-device dual
normalization, the Pallas greedy-NMS decode (default), stats.jsonl +
cfg.yaml run artifacts, and the dashboard render.

Run on the real TPU: PYTHONPATH="/root/repo:$PYTHONPATH" \
    python tools_drives/sad_revalidation_drive.py
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


def base_cfg(root, out_name):
    return {
        "MODEL": {"TYPE": "retinanet", "NUM_CLASSES": 2,
                  "CONV_BODY": "FPN.add_fpn_ResNet50_conv5_body"},
        "NUM_GPUS": 1,
        "FPN": {"FPN_ON": True, "RPN_MIN_LEVEL": 3, "RPN_MAX_LEVEL": 7,
                "EXTRA_CONV_LEVELS": True, "COARSEST_STRIDE": 128},
        "RETINANET": {"RETINANET_ON": True, "ASPECT_RATIOS": (1.0, 2.0),
                      "SCALES_PER_OCTAVE": 1},
        "RESNETS": {"CHANNEL_RATIO": 0.25},
        "TRAIN": {"SCALES": (64,), "MAX_SIZE": 128, "IMS_PER_BATCH": 2,
                  "DATASETS": ("sad_revalid",), "SNAPSHOT_ITERS": 100000,
                  "WEIGHTS": ""},
        "TEST": {"SCALES": (64,), "MAX_SIZE": 128,
                 "DATASETS": ("sad_revalid",), "SCORE_THRESH": 0.05},
        "SOLVER": {"BASE_LR": 1e-3, "MAX_ITER": 600, "WARM_UP_ITERS": 200,
                   "WARM_UP_FACTOR": 0.1, "GAMMA": 0.1, "STEPS": (0,)},
        "PIXEL_STD": (57.375, 57.12, 58.395),
        "COMPUTE_DTYPE": "float32",
        "OUTPUT_DIR": os.path.join(root, out_name),
    }


def main():
    from sad_tpu.config import Config, register_dataset
    from sad_tpu.config.config import merge_cfg_from_dict
    from sad_tpu.eval.test_engine import test_net_on_dataset
    from sad_tpu.models import create_model
    from sad_tpu.train.train_loop import train_model

    root = tempfile.mkdtemp(prefix="sad_revalid_")
    img_dir, ann = make_dataset(root)
    register_dataset("sad_revalid", img_dir, ann, allow_override=True)

    # ---- 1. plain student overfit
    cfg = merge_cfg_from_dict(Config(), base_cfg(root, "plain"))
    t0 = time.perf_counter()
    state = train_model(cfg)
    print(f"plain train: {time.perf_counter() - t0:.0f}s", flush=True)
    r_plain = test_net_on_dataset(
        cfg, create_model(cfg), state.params,
        output_dir=os.path.join(root, "test_plain"),
    )
    print(f"plain: AP={r_plain['AP']:.4f} AP50={r_plain['AP50']:.4f}",
          flush=True)

    train_dir = os.path.join(root, "plain", "train", "sad_revalid")
    teacher_ckpt = os.path.join(train_dir, "model_final.pkl")
    assert os.path.exists(teacher_ckpt)
    # run artifacts at HEAD
    assert os.path.exists(os.path.join(train_dir, "stats.jsonl"))
    assert os.path.exists(os.path.join(train_dir, "cfg.yaml"))
    from sad_tpu.tools.dashboard import render_report

    report = render_report(os.path.join(root, "plain"))
    assert "stats.jsonl" in report and "<svg" in report
    print("run artifacts + dashboard: OK", flush=True)

    # ---- 2. distilled student (teacher = the overfit checkpoint)
    sd = base_cfg(root, "distill")
    sd["MODEL"]["TYPE"] = "distillation"
    sd["RNG_SEED"] = 7  # different student init than the teacher's run
    sd["DISTILLATION"] = {
        "DISTILLATION_ON": True, "LOSS_ALPHA": 0.5, "LOSS_GAMMA": 2.0,
        "ADAPTIVE_NORMALIZER": True, "LOGITS_POWER": 1.8,
        "TEMPERATURE": 1.0,
    }
    scfg = merge_cfg_from_dict(Config(), sd)
    td = base_cfg(root, "distill_teacher")
    td["TRAIN"]["WEIGHTS"] = teacher_ckpt
    tcfg = merge_cfg_from_dict(Config(), td)

    t0 = time.perf_counter()
    dstate = train_model(scfg, teacher_cfg=tcfg)
    print(f"distill train: {time.perf_counter() - t0:.0f}s", flush=True)
    r_dist = test_net_on_dataset(
        scfg, create_model(scfg), dstate.params,
        output_dir=os.path.join(root, "test_distill"),
    )
    print(f"distilled: AP={r_dist['AP']:.4f} AP50={r_dist['AP50']:.4f}",
          flush=True)

    print(json.dumps({
        "plain_AP": round(float(r_plain["AP"]), 4),
        "distilled_AP": round(float(r_dist["AP"]), 4),
        "gain": round(float(r_dist["AP"] - r_plain["AP"]), 4),
    }))
    assert r_plain["AP"] > 0.5, "plain overfit failed to learn"
    assert r_dist["AP"] >= r_plain["AP"] - 0.02, (
        "distilled student regressed vs plain"
    )
    print("DRIVE OK")


if __name__ == "__main__":
    sys.exit(main())
