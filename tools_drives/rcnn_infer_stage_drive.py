"""Chip drive: localize the R-CNN SERVING cost by jitting infer PREFIXES.

The round-5 serving rows (results/rcnn_inference.json: Faster 58.4
imgs/s, 5.66x) are the weakest published ratios vs the train side
(12.97x) — the note blames "NMS/decode-heavy" without a number. Each
stage I_k runs everything I_{k-1} runs plus one more pipeline piece, all
inside ONE jit (realistic fusion context):

  I1 backbone + RPN heads
  I2 + proposal candidates (per-level sigmoid + top-k + decode + clip)
  I3 + sublane-batched proposal NMS + collect/distribute
  I4 + multilevel RoIAlign (TEST.RPN_POST_NMS_TOP_N rois/im) + box head
       (= the model __call__ serving forward)
  I5 + final decode: per-(roi, class) candidates + class-wise NMS over
       r x 79 candidates (= full make_rcnn_inference_fn, no mask)

Deltas localize the cost. Known suspect: at r=1000 the final class-wise
NMS has K=79,000 candidates per image — beyond the Pallas batched
kernel's MAX_K//SUBLANES=16,384 VMEM ceiling it falls back to the
single-problem kernel (1 of 8 sublanes, no problem packing;
ops/pallas_nms.py:171-174).

Evolving-state timing (images perturbed per call) per the BENCH_NOTES
memoization-hazard methodology.

Run: PYTHONPATH="/root/repo:$PYTHONPATH" python tools_drives/rcnn_infer_stage_drive.py
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo/tools_drives")
from driveutil import record_result  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from sad_tpu.config import load_cfg
    from sad_tpu.data.anchors import field_of_anchors, generate_cell_anchors
    from sad_tpu.data.minibatch import canvas_shapes
    from sad_tpu.eval.rcnn_inference import (
        decode_rcnn_detections,
        make_rcnn_inference_fn,
    )
    from sad_tpu.models import create_model
    from sad_tpu.models.model_builder import init_model_params
    from sad_tpu.ops.proposals import (
        collect_and_distribute_fpn_proposals,
        multilevel_roi_align,
        nms_levels_batched,
        proposal_candidates,
    )

    import os

    bs = int(os.environ.get("STAGE_BS", "8"))
    iters = int(os.environ.get("STAGE_ITERS", "20"))
    cfg = load_cfg(
        "/root/reference/detectron/configs/12_2017_baselines/"
        "e2e_mask_rcnn_R-50-FPN_1x.yaml",
        ["NUM_GPUS", "1", "TRAIN.WEIGHTS", "", "COMPUTE_DTYPE", "bfloat16",
         "PIXEL_STD", "(57.375,57.12,58.395)", "MODEL.MASK_ON", "False"]
        + sys.argv[1:],  # extra KEY VALUE overrides (CPU smoke runs)
    )
    (h, w), _ = canvas_shapes(cfg)
    model = create_model(cfg)
    params = init_model_params(model, jax.random.PRNGKey(0), (1, 256, 256, 3))
    rng = np.random.RandomState(0)
    images0 = jnp.asarray(rng.randn(bs, h, w, 3), jnp.float32)
    im_hw = jnp.asarray(np.tile(np.float32([800.0, 1202.0]), (bs, 1)))
    im_scale = jnp.asarray(np.full((bs,), 1.0, np.float32))

    rpn_levels = tuple(range(cfg.FPN.RPN_MIN_LEVEL, cfg.FPN.RPN_MAX_LEVEL + 1))
    roi_levels = tuple(range(cfg.FPN.ROI_MIN_LEVEL, cfg.FPN.ROI_MAX_LEVEL + 1))

    def infer_prefix(params, images, stop: int):
        b = images.shape[0]
        feats = model.apply({"params": params}, images, method="backbone")
        rpn_feats = {l: feats[l] for l in rpn_levels if l in feats}
        logits, deltas = model.apply(
            {"params": params}, rpn_feats, method=lambda m, f: m.rpn(f)
        )
        if stop == 1:
            return sum(jnp.sum(v) for v in logits.values()) + sum(
                jnp.sum(v) for v in deltas.values()
            )

        prop_levels = []
        for lvl in rpn_feats:
            hl, wl = rpn_feats[lvl].shape[1:3]
            stride = 2.0 ** lvl
            size = cfg.FPN.RPN_ANCHOR_START_SIZE * (
                2 ** (lvl - cfg.FPN.RPN_MIN_LEVEL)
            )
            cell = np.concatenate([
                generate_cell_anchors(stride, (size,), (ar,))
                for ar in cfg.FPN.RPN_ASPECT_RATIOS
            ])
            na = len(cfg.FPN.RPN_ASPECT_RATIOS)
            anchors = jnp.asarray(
                field_of_anchors(cell, stride, hl, wl), jnp.float32
            )
            scores = jax.nn.sigmoid(logits[lvl])
            d = deltas[lvl].reshape(b, hl, wl, na, 4)
            bx, ts, ms = jax.vmap(
                lambda s, dd, ihw, a=anchors: proposal_candidates(
                    s, dd, a, ihw,
                    cfg.TEST.RPN_PRE_NMS_TOP_N,
                    float(cfg.TEST.RPN_MIN_SIZE),
                    exact_topk=cfg.RPN.EXACT_TOPK,
                )
            )(scores, d, im_hw)
            prop_levels.append((lvl, bx, ts, ms))
        if stop == 2:
            return sum(jnp.sum(c[1]) for c in prop_levels)

        lv_b, lv_s, lv_v = nms_levels_batched(
            prop_levels, cfg.TEST.RPN_NMS_THRESH, cfg.TEST.RPN_POST_NMS_TOP_N
        )

        def per_image(lvb, lvs, lvv):
            return collect_and_distribute_fpn_proposals(
                lvb, lvs, lvv,
                cfg.TEST.RPN_POST_NMS_TOP_N,
                cfg.FPN.ROI_MIN_LEVEL, cfg.FPN.ROI_MAX_LEVEL,
                cfg.FPN.ROI_CANONICAL_SCALE, cfg.FPN.ROI_CANONICAL_LEVEL,
            )

        boxes, scores, valid, roi_lvls = jax.vmap(per_image)(lv_b, lv_s, lv_v)
        if stop == 3:
            return jnp.sum(boxes) + jnp.sum(scores)

        r = boxes.shape[1]
        batch_col = jnp.repeat(jnp.arange(b, dtype=jnp.float32), r)[:, None]
        flat_rois = jnp.concatenate([batch_col, boxes.reshape(-1, 4)], axis=1)
        roi_feats = multilevel_roi_align(
            {l: feats[l] for l in roi_levels if l in feats},
            flat_rois, roi_lvls.reshape(-1), valid.reshape(-1),
            cfg.FAST_RCNN.ROI_XFORM_RESOLUTION,
            cfg.FAST_RCNN.ROI_XFORM_SAMPLING_RATIO,
            slots_per_im=r,
            inference=True,  # match the serving path's dispatch (round 5)
        )
        cls_score, bbox_pred = model.apply(
            {"params": params}, roi_feats, method=lambda m, f: m.box_head(f)
        )
        if stop == 4:
            return jnp.sum(cls_score) + jnp.sum(bbox_pred)

        dets = decode_rcnn_detections(
            cfg, boxes, valid,
            jax.nn.softmax(cls_score.reshape(b, r, -1), axis=-1),
            bbox_pred.reshape(b, r, -1), im_hw, im_scale,
        )
        return jnp.sum(dets["scores"]) + jnp.sum(dets["boxes"])

    fns = {
        f"I{s}": jax.jit(lambda p, d, s=s: infer_prefix(p, d, s))
        for s in (1, 2, 3, 4, 5)
    }
    full = make_rcnn_inference_fn(cfg, model)
    fns["Ifull"] = lambda p, d: jnp.sum(full(p, d, im_hw, im_scale)["scores"])

    # the TEST.NMS_CAND_TOPK cut variant: stages I1-I4 are identical by
    # construction, so only the decode-bearing stages are re-timed
    import dataclasses

    cfg_cut = dataclasses.replace(
        cfg, TEST=dataclasses.replace(cfg.TEST, NMS_CAND_TOPK=4096)
    )
    full_cut = make_rcnn_inference_fn(cfg_cut, model)
    fns["Ifull_cand4k"] = lambda p, d: jnp.sum(
        full_cut(p, d, im_hw, im_scale)["scores"]
    )

    results = {}
    images = images0
    for name, fn in fns.items():
        t0 = time.perf_counter()
        out = fn(params, images)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            # evolving input (memoization hazard); scale keeps it finite
            images = images * 1.0000001
            out = fn(params, images)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / iters * 1e3
        results[name] = round(ms, 1)
        print(name, {"ms": round(ms, 1), "compile_s": round(compile_s, 1)},
              flush=True)

    print(json.dumps(results))
    if sys.argv[1:]:
        return  # smoke run at non-default geometry: no durable record
    import os as _os
    record_result("rcnn_infer_stages" + _os.environ.get("RESULT_SUFFIX", ""), {
        "metric": "cumulative-prefix ms/step, faster-rcnn R-50-FPN TEST "
                  "geometry bs8 bf16",
        "canvas": [h, w],
        "stages": results,
        "legend": {
            "I1": "backbone + RPN heads",
            "I2": "+ proposal candidates (top-k/decode/clip)",
            "I3": "+ proposal NMS + collect/distribute",
            "I4": "+ RoIAlign(1000/im) + box head",
            "I5": "+ final decode incl. class-wise NMS (79k cands/im)",
            "Ifull": "make_rcnn_inference_fn end-to-end",
            "Ifull_cand4k": "end-to-end with TEST.NMS_CAND_TOPK=4096 "
                            "(sublane-batched final NMS re-enabled)",
        },
    })


if __name__ == "__main__":
    main()
