"""Chip drive: exact vs approx per-level top-k decode — AP delta + speed.

VERDICT r2 weak #1: the TPU decode substituted jax.lax.approx_max_k
(recall_target 0.99) for the reference's exact per-level top-N
(detectron/lib/core/test_retinanet.py:136-139) with no measured AP evidence.
This drive trains one RetinaNet on a dense 8-category synthetic COCO set,
then evaluates the SAME checkpoint twice — TEST.EXACT_TOPK True vs False —
and reports the AP/AP50 deltas, the per-level truncation pressure (how many
above-threshold candidates the top-1000 actually cut), and the pure
inference throughput of each decode.

Run: PYTHONPATH="/root/repo:$PYTHONPATH" python tools_drives/topk_parity_drive.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=256)
    ap.add_argument("--iters", type=int, default=1000)
    ap.add_argument("--smoke", action="store_true",
                    help="tiny CPU smoke: 12 images, 10 iters")
    args = ap.parse_args()
    if args.smoke:
        args.images, args.iters = 12, 10

    import jax
    import jax.numpy as jnp

    from sad_tpu.config import Config, register_dataset
    from sad_tpu.config.config import merge_cfg_from_dict
    from sad_tpu.data.synth_coco import generate_synthetic_coco
    from sad_tpu.eval.test_engine import test_net_on_dataset
    from sad_tpu.models import create_model
    from sad_tpu.train.train_loop import train_model

    root = tempfile.mkdtemp(prefix="topk_parity_")
    t0 = time.perf_counter()
    tr_dir, tr_json = generate_synthetic_coco(root, "train", args.images, seed=0)
    va_dir, va_json = generate_synthetic_coco(root, "val", args.images, seed=1)
    print(f"dataset gen: {time.perf_counter() - t0:.0f}s", flush=True)
    register_dataset("topk_train", tr_dir, tr_json, allow_override=True)
    register_dataset("topk_val", va_dir, va_json, allow_override=True)

    base = {
        "MODEL": {"TYPE": "retinanet", "NUM_CLASSES": 9,
                  "CONV_BODY": "FPN.add_fpn_ResNet50_conv5_body"},
        "NUM_GPUS": 1,
        "FPN": {"FPN_ON": True, "RPN_MIN_LEVEL": 3, "RPN_MAX_LEVEL": 7,
                "EXTRA_CONV_LEVELS": True, "COARSEST_STRIDE": 128},
        "RETINANET": {"RETINANET_ON": True,
                      "ASPECT_RATIOS": (0.5, 1.0, 2.0),
                      "SCALES_PER_OCTAVE": 3},
        "RESNETS": {"CHANNEL_RATIO": 0.25},
        "TRAIN": {"SCALES": (320,), "MAX_SIZE": 512, "IMS_PER_BATCH": 8,
                  "DATASETS": ("topk_train",), "SNAPSHOT_ITERS": 100000,
                  "WEIGHTS": ""},
        "TEST": {"SCALES": (320,), "MAX_SIZE": 512,
                 "DATASETS": ("topk_val",), "SCORE_THRESH": 0.05},
        "SOLVER": {"BASE_LR": 2e-3, "MAX_ITER": args.iters,
                   "WARM_UP_ITERS": min(200, args.iters // 2),
                   "WARM_UP_FACTOR": 0.1, "GAMMA": 0.1,
                   "STEPS": (0, max(1, int(args.iters * 0.8)))},
        "PIXEL_STD": (57.375, 57.12, 58.395),
        "COMPUTE_DTYPE": "float32",
        "OUTPUT_DIR": os.path.join(root, "out"),
    }
    cfg = merge_cfg_from_dict(Config(), base)

    t0 = time.perf_counter()
    state = train_model(cfg)
    print(f"train {base['SOLVER']['MAX_ITER']} iters: "
          f"{time.perf_counter() - t0:.0f}s", flush=True)
    model = create_model(cfg)

    results = {}
    for exact in (True, False):
        c = merge_cfg_from_dict(cfg, {"TEST": {"EXACT_TOPK": exact}})
        t0 = time.perf_counter()
        r = test_net_on_dataset(
            c, model, state.params,
            output_dir=os.path.join(root, f"test_{'exact' if exact else 'approx'}"),
        )
        dt = time.perf_counter() - t0
        tag = "exact" if exact else "approx"
        results[tag] = {"AP": float(r["AP"]), "AP50": float(r["AP50"]),
                        "AP75": float(r.get("AP75", float("nan"))),
                        "APs": float(r.get("APs", float("nan"))),
                        "eval_wall_s": round(dt, 1)}
        print(tag, results[tag], flush=True)

    # ---- truncation pressure: is the top-1000 cut actually engaged?
    from sad_tpu.eval.inference import make_inference_fn
    from PIL import Image

    files = sorted(os.listdir(va_dir))[:8]
    ims = []
    hws = []
    for f in files:
        arr = np.asarray(Image.open(os.path.join(va_dir, f)))
        hws.append(arr.shape[:2])
        ims.append(arr)
    # simple shared canvas at TEST scale for the pressure probe
    import cv2
    canvases = np.zeros((len(ims), 512, 512, 3), np.float32)
    scales = []
    for i, arr in enumerate(ims):
        h, w = arr.shape[:2]
        s = min(320.0 / min(h, w), 512.0 / max(h, w))
        rs = cv2.resize(arr.astype(np.float32), None, fx=s, fy=s)
        canvases[i, : rs.shape[0], : rs.shape[1]] = (
            (rs[..., ::-1] - np.float32(cfg.PIXEL_MEANS))
            / np.float32(cfg.PIXEL_STD)
        )
        scales.append(s)
    out = jax.jit(lambda p, x: model.apply({"params": p}, x))(
        state.params, jnp.asarray(canvases)
    )
    pressure = {}
    for lvl, p in out["cls_prob"].items():
        arr = np.asarray(p, np.float32).reshape(len(ims), -1)
        th = cfg.RETINANET.INFERENCE_TH if lvl < max(out["cls_prob"]) else 0.0
        above = (arr > th).sum(axis=1)
        pressure[f"P{lvl}"] = {
            "mean_above_th": int(above.mean()),
            "max_above_th": int(above.max()),
            "truncated_images": int((above > cfg.RETINANET.PRE_NMS_TOP_N).sum()),
        }
    print("truncation pressure:", json.dumps(pressure), flush=True)

    # ---- pure inference throughput, exact vs approx
    im_hw = jnp.asarray(
        np.array([[h, w] for h, w in hws[: len(ims)]], np.float32))
    im_scale = jnp.asarray(np.array(scales, np.float32))
    images = jnp.asarray(canvases)
    speed = {}
    for exact in (True, False):
        c = merge_cfg_from_dict(cfg, {"TEST": {"EXACT_TOPK": exact}})
        infer = make_inference_fn(c, model)
        fn = jax.jit(lambda im, hw, sc: infer(state.params, im, hw, sc))
        off = [jnp.float32(0.0)]

        def call(im, hw, sc):
            off[0] = off[0] + jnp.float32(1e-6)
            return fn(im + off[0], hw, sc)

        r = call(images, im_hw, im_scale)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        iters = 30
        for _ in range(iters):
            r = call(images, im_hw, im_scale)
        jax.block_until_ready(r)
        dt = time.perf_counter() - t0
        tag = "exact" if exact else "approx"
        speed[tag] = {"imgs_per_s": round(len(ims) * iters / dt, 1),
                      "ms_per_batch": round(dt / iters * 1e3, 2)}
        print("speed", tag, speed[tag], flush=True)

    print(json.dumps({
        "exact": results["exact"],
        "approx": results["approx"],
        "ap_delta_approx_minus_exact": round(
            results["approx"]["AP"] - results["exact"]["AP"], 5),
        "pressure": pressure,
        "speed": speed,
    }))
    print("DRIVE OK")


if __name__ == "__main__":
    sys.exit(main())
