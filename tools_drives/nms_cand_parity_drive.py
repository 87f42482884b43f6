"""Chip drive: TEST.NMS_CAND_TOPK fidelity — AP delta + detection diff.

The candidate cut for the final class-wise R-CNN NMS
(eval/rcnn_inference.py, TEST.NMS_CAND_TOPK) is provably bit-identical
while <= N candidates clear SCORE_THRESH (tests/test_nms_cand_topk.py);
this drive measures what happens on a REAL trained model where the valid-
candidate count is data-dependent: train one Faster R-CNN R-50-FPN (thin
trunk) on a multi-class synthetic COCO set (same recipe as
rpn_topk_parity_drive), then evaluate the SAME checkpoint at
NMS_CAND_TOPK in {0 (full), 4096, 1024} and report AP deltas + eval wall
time, plus a direct decode-output diff (det counts, box/score deltas) of
full-vs-cut on the val batches.

At the drive geometry (scale 320, R=1000 proposals, 9 classes) the
candidate pool is R x 8 = 8000, so 4096 and 1024 both truncate for real.

Run: PYTHONPATH="/root/repo:$PYTHONPATH" python tools_drives/nms_cand_parity_drive.py
     [--smoke]   (tiny CPU wiring check)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo/tools_drives")
from driveutil import record_result  # noqa: E402


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=256)
    ap.add_argument("--iters", type=int, default=800)
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()
    if args.smoke:
        args.images, args.iters = 8, 4

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sad_tpu.config import Config, register_dataset
    from sad_tpu.config.config import merge_cfg_from_dict
    from sad_tpu.data.synth_coco import generate_synthetic_coco
    from sad_tpu.eval.test_engine import test_net_on_dataset
    from sad_tpu.models import create_model
    from sad_tpu.train.train_loop import train_model

    root = tempfile.mkdtemp(prefix="nms_cand_")
    t0 = time.perf_counter()
    size_range = (80, 120) if args.smoke else (260, 460)
    tr_dir, tr_json = generate_synthetic_coco(
        root, "train", args.images, seed=0, size_range=size_range)
    va_dir, va_json = generate_synthetic_coco(
        root, "val", max(args.images // 2, 8), seed=1, size_range=size_range)
    print(f"dataset gen: {time.perf_counter() - t0:.0f}s", flush=True)
    register_dataset("nmscand_train", tr_dir, tr_json, allow_override=True)
    register_dataset("nmscand_val", va_dir, va_json, allow_override=True)

    scale = 64 if args.smoke else 320
    max_size = 128 if args.smoke else 512
    base = {
        "MODEL": {"TYPE": "generalized_rcnn", "NUM_CLASSES": 9,
                  "FASTER_RCNN": True,
                  "CONV_BODY": "FPN.add_fpn_ResNet50_conv5_body"},
        "NUM_GPUS": 1,
        "FPN": {"FPN_ON": True, "MULTILEVEL_RPN": True,
                "MULTILEVEL_ROIS": True,
                "RPN_MIN_LEVEL": 2, "RPN_MAX_LEVEL": 6,
                "ROI_MIN_LEVEL": 2, "ROI_MAX_LEVEL": 5,
                "COARSEST_STRIDE": 64},
        "FAST_RCNN": {"ROI_XFORM_RESOLUTION": 7,
                      "MLP_HEAD_DIM": 64 if args.smoke else 256},
        "RESNETS": {"CHANNEL_RATIO": 0.25},
        "TRAIN": {"SCALES": (scale,), "MAX_SIZE": max_size,
                  "IMS_PER_BATCH": 4, "DATASETS": ("nmscand_train",),
                  "SNAPSHOT_ITERS": 100000, "WEIGHTS": "",
                  "RPN_PRE_NMS_TOP_N": 2000, "RPN_POST_NMS_TOP_N": 1000,
                  "BATCH_SIZE_PER_IM": 128},
        "TEST": {"SCALES": (scale,), "MAX_SIZE": max_size,
                 "DATASETS": ("nmscand_val",), "SCORE_THRESH": 0.05,
                 "RPN_PRE_NMS_TOP_N": 1000, "RPN_POST_NMS_TOP_N": 1000},
        "SOLVER": {"BASE_LR": 2e-3, "MAX_ITER": args.iters,
                   "WARM_UP_ITERS": min(100, args.iters // 2),
                   "WARM_UP_FACTOR": 0.1, "GAMMA": 0.1,
                   "STEPS": (0, max(1, int(args.iters * 0.8)))},
        "PIXEL_STD": (57.375, 57.12, 58.395),
        "COMPUTE_DTYPE": "float32" if args.smoke else "bfloat16",
        "OUTPUT_DIR": os.path.join(root, "out"),
    }
    cfg = merge_cfg_from_dict(Config(), base)

    t0 = time.perf_counter()
    state = train_model(cfg)
    print(f"train {args.iters} iters: {time.perf_counter() - t0:.0f}s",
          flush=True)

    results = {}
    cand_values = (0, 16) if args.smoke else (0, 4096, 1024)
    for cand in cand_values:
        c = merge_cfg_from_dict(cfg, {"TEST": {"NMS_CAND_TOPK": cand}})
        model = create_model(c)
        tag = f"cand{cand}" if cand else "full"
        t0 = time.perf_counter()
        r = test_net_on_dataset(
            c, model, state.params,
            output_dir=os.path.join(root, f"test_{tag}"),
        )
        dt = time.perf_counter() - t0
        results[tag] = {"AP": float(r["AP"]), "AP50": float(r["AP50"]),
                        "AP75": float(r.get("AP75", float("nan"))),
                        "eval_wall_s": round(dt, 1)}
        print(tag, results[tag], flush=True)

    # ---- direct decode diff on one val batch: full vs the first cut,
    # through the real eval image prep (canvas orientation handled there)
    from PIL import Image

    from sad_tpu.eval.rcnn_inference import make_rcnn_inference_fn
    from sad_tpu.eval.test_engine import (
        _test_canvas_shapes,
        prepare_test_batch,
    )

    cut = cand_values[1]
    c_cut = merge_cfg_from_dict(cfg, {"TEST": {"NMS_CAND_TOPK": cut}})
    model_full = create_model(cfg)
    model_cut = create_model(c_cut)
    fn_full = make_rcnn_inference_fn(cfg, model_full)
    fn_cut = make_rcnn_inference_fn(c_cut, model_cut)
    land, _port = _test_canvas_shapes(cfg)

    entries = []
    for f in sorted(os.listdir(va_dir)):
        p = os.path.join(va_dir, f)
        with Image.open(p) as im:
            iw, ih = im.size
        if iw >= ih:  # one orientation -> one canvas/batch
            entries.append({"image": p, "height": ih, "width": iw})
        if len(entries) == 8:
            break
    host = prepare_test_batch(cfg, entries, land)
    images = jnp.asarray(host["data"])
    im_hw = jnp.asarray(host["im_hw"])
    im_scale = jnp.asarray(host["im_scale"])
    o_full = jax.device_get(fn_full(state.params, images, im_hw, im_scale))
    o_cut = jax.device_get(fn_cut(state.params, images, im_hw, im_scale))
    vf, vc = o_full["valid"], o_cut["valid"]
    det_diff = {
        "n_images": len(entries),
        "det_count_full": int(vf.sum()),
        "det_count_cut": int(vc.sum()),
        "valid_mask_identical": bool((vf == vc).all()),
        "max_box_delta": float(
            np.abs(np.where(vf[..., None], o_full["boxes"], 0)
                   - np.where(vc[..., None], o_cut["boxes"], 0)).max()),
        "max_score_delta": float(
            np.abs(np.where(vf, o_full["scores"], 0)
                   - np.where(vc, o_cut["scores"], 0)).max()),
        "classes_identical": bool(
            (np.where(vf, o_full["classes"], 0)
             == np.where(vc, o_cut["classes"], 0)).all()),
    }
    print("det_diff", json.dumps(det_diff), flush=True)

    out = {"results": results, "det_diff_full_vs_first_cut": det_diff,
           "cand_values": list(cand_values),
           "geometry": {"scale": scale, "max_size": max_size,
                        "rois": 1000, "fg_classes": 8}}
    for cand in cand_values[1:]:
        out[f"ap_delta_cand{cand}_minus_full"] = round(
            results[f"cand{cand}"]["AP"] - results["full"]["AP"], 6)
    print(json.dumps(out))
    if not args.smoke:
        record_result("nms_cand_topk_parity", out)
    print("DRIVE OK")


if __name__ == "__main__":
    sys.exit(main())
