"""Chip drive: exact vs approx RPN pre-NMS top-k — AP delta + speed.

RPN analogue of topk_parity_drive (which closed the decode hole,
VERDICT r2 weak #1): cfg.RPN.EXACT_TOPK=False routes the per-(level, image)
pre-NMS candidate selection through jax.lax.approx_max_k (recall 0.99)
instead of the sort-based exact top_k over the dense objectness grids —
P2 alone is ~200k scores at the reference 800x1344 canvas, and the exact
top-k inside S2 of the box-path decomposition costs ~3 ms/step
(BENCH_NOTES.md). Unlike the decode case the proposal pool feeds NMS and
fg/bg sampling rather than the final detections directly, so the AP effect
must be measured, not argued.

This drive trains one Faster R-CNN R-50-FPN (thin trunk) on a multi-class
synthetic COCO set, evaluates the SAME checkpoint with RPN.EXACT_TOPK True
vs False, and reports AP deltas + eval throughput. Train-step timing at
reference geometry runs separately via:
  python tools_drives/rcnn_step_drive.py <mask_1x.yaml> --no-mask \
      MODEL.MASK_ON False RPN.EXACT_TOPK False

Run: PYTHONPATH="/root/repo:$PYTHONPATH" python tools_drives/rpn_topk_parity_drive.py
     [--smoke]   (tiny CPU smoke; approx lowers to exact on CPU so the
                  smoke proves wiring, not the delta)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=256)
    ap.add_argument("--iters", type=int, default=800)
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--train-both", action="store_true",
                    help="ALSO train a second model with RPN.EXACT_TOPK="
                         "False (approx candidate selection feeding NMS + "
                         "fg/bg sampling DURING training — the riskier "
                         "half of the knob) and compare final AP of the "
                         "two checkpoints under exact eval.")
    args = ap.parse_args()
    if args.smoke:
        args.images, args.iters = 8, 4

    from sad_tpu.config import Config, register_dataset
    from sad_tpu.config.config import merge_cfg_from_dict
    from sad_tpu.data.synth_coco import generate_synthetic_coco
    from sad_tpu.eval.test_engine import test_net_on_dataset
    from sad_tpu.models import create_model
    from sad_tpu.train.train_loop import train_model

    root = tempfile.mkdtemp(prefix="rpn_topk_")
    t0 = time.perf_counter()
    size_range = (80, 120) if args.smoke else (260, 460)
    tr_dir, tr_json = generate_synthetic_coco(
        root, "train", args.images, seed=0, size_range=size_range)
    va_dir, va_json = generate_synthetic_coco(
        root, "val", max(args.images // 2, 8), seed=1, size_range=size_range)
    print(f"dataset gen: {time.perf_counter() - t0:.0f}s", flush=True)
    register_dataset("rpntopk_train", tr_dir, tr_json, allow_override=True)
    register_dataset("rpntopk_val", va_dir, va_json, allow_override=True)

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
                  "IMS_PER_BATCH": 4, "DATASETS": ("rpntopk_train",),
                  "SNAPSHOT_ITERS": 100000, "WEIGHTS": "",
                  # train-mode proposal budget scaled to the image area
                  # (reference 1x uses 2000 at 800px; 320px has ~6% of the
                  # P2 cells) — keeps the top-k under real truncation
                  "RPN_PRE_NMS_TOP_N": 2000, "RPN_POST_NMS_TOP_N": 1000,
                  "BATCH_SIZE_PER_IM": 128},
        "TEST": {"SCALES": (scale,), "MAX_SIZE": max_size,
                 "DATASETS": ("rpntopk_val",), "SCORE_THRESH": 0.05,
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
    for exact in (True, False):
        c = merge_cfg_from_dict(cfg, {"RPN": {"EXACT_TOPK": exact}})
        model = create_model(c)  # cfg_static is baked into the module
        tag = "exact" if exact else "approx"
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

    out = {
        "exact": results["exact"],
        "approx": results["approx"],
        "ap_delta_approx_minus_exact": round(
            results["approx"]["AP"] - results["exact"]["AP"], 5),
    }

    if args.train_both:
        # Same data, same RNG_SEED, same schedule — the ONLY difference is
        # the candidate selection feeding proposal NMS + fg/bg sampling
        # during training. Both checkpoints evaluated with exact decode.
        cfg_at = merge_cfg_from_dict(cfg, {
            "RPN": {"EXACT_TOPK": False},
            "OUTPUT_DIR": os.path.join(root, "out_approx_train"),
        })
        t0 = time.perf_counter()
        state_at = train_model(cfg_at)
        print(f"approx-train {args.iters} iters: "
              f"{time.perf_counter() - t0:.0f}s", flush=True)
        c = merge_cfg_from_dict(cfg_at, {"RPN": {"EXACT_TOPK": True}})
        model = create_model(c)
        r = test_net_on_dataset(
            c, model, state_at.params,
            output_dir=os.path.join(root, "test_approx_trained"),
        )
        out["approx_trained"] = {
            "AP": float(r["AP"]), "AP50": float(r["AP50"]),
            "AP75": float(r.get("AP75", float("nan")))}
        out["ap_delta_approx_train_minus_exact_train"] = round(
            out["approx_trained"]["AP"] - results["exact"]["AP"], 5)
        print("approx_trained", out["approx_trained"], flush=True)

    print(json.dumps(out))
    print("DRIVE OK")


if __name__ == "__main__":
    sys.exit(main())
