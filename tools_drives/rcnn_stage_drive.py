"""Chip drive: localize Faster R-CNN step cost by jitting loss-fn PREFIXES.

Each stage S_k runs everything S_{k-1} runs plus one more pipeline piece,
all inside ONE jit (so fusion context is realistic, unlike micro timings):

  S1 backbone + RPN heads + RPN losses
  S2 + proposal candidates (per-level top_k + decode + clip)
  S3 + sublane-batched NMS over all level x image problems
  S4 + collect/distribute + fg/bg sampling
  S5 + multilevel RoIAlign (box branch)
  S6 + box head + fast-rcnn losses  (= full loss forward)
  S7 grad(S6)                       (= full fwd+bwd, no SGD)

Deltas between consecutive stages localize the cost. Evolving-state
timing (inputs perturbed per call) to defeat memoization.

Run: PYTHONPATH="/root/repo:$PYTHONPATH" python tools_drives/rcnn_stage_drive.py \
    [cfg.yaml] [--no-mask]
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from sad_tpu.config import load_cfg
    from sad_tpu.data.anchors import field_of_anchors, generate_cell_anchors
    from sad_tpu.models import create_model
    from sad_tpu.models.model_builder import init_model_params
    from sad_tpu.ops.proposals import (
        collect_and_distribute_fpn_proposals,
        map_rois_to_fpn_levels,
        multilevel_roi_align,
        nms_levels_batched,
        proposal_candidates,
        sample_proposal_labels,
        sampled_fg_cap,
    )
    from sad_tpu.train.rcnn_train import fast_rcnn_losses, rpn_losses

    cfg_path = (
        sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--")
        else "/root/reference/detectron/configs/12_2017_baselines/"
        "e2e_mask_rcnn_R-50-FPN_1x.yaml"
    )
    with_mask = "--mask" in sys.argv
    cfg = load_cfg(
        cfg_path,
        ["NUM_GPUS", "1", "TRAIN.WEIGHTS", "", "COMPUTE_DTYPE", "bfloat16",
         "PIXEL_STD", "(57.375,57.12,58.395)"]
        + ([] if with_mask else ["MODEL.MASK_ON", "False"]),
    )
    from sad_tpu.data.minibatch import canvas_shapes

    (h, w), _ = canvas_shapes(cfg)
    n_images = cfg.TRAIN.IMS_PER_BATCH
    model = create_model(cfg)
    params = init_model_params(model, jax.random.PRNGKey(0), (1, h, w, 3))

    import os
    import tempfile

    from PIL import Image

    from sad_tpu.data.rpn_minibatch import RCNNMinibatchBuilder

    rng = np.random.RandomState(0)
    d = tempfile.mkdtemp(prefix="rcnn_stage_")
    entries = []
    for i in range(n_images):
        p = os.path.join(d, f"{i}.png")
        Image.fromarray(rng.randint(0, 255, (600, 980, 3), np.uint8)).save(p)
        nb = 8
        x0 = rng.uniform(0, 800, nb)
        y0 = rng.uniform(0, 450, nb)
        bw = rng.uniform(40, 160, nb)
        bh = rng.uniform(40, 120, nb)
        boxes = np.stack([x0, y0, x0 + bw, y0 + bh], 1).astype(np.float32)
        segms = [
            [[float(bx[0]), float(bx[1]), float(bx[2]), float(bx[1]),
              float(bx[2]), float(bx[3]), float(bx[0]), float(bx[3])]]
            for bx in boxes
        ] if cfg.MODEL.MASK_ON else [None] * nb
        entries.append({
            "id": i + 1, "image": p, "width": 980, "height": 600,
            "flipped": False,
            "boxes": boxes,
            "gt_classes": rng.randint(
                1, cfg.MODEL.NUM_CLASSES, nb).astype(np.int32),
            "is_crowd": np.zeros(nb, bool),
            "segms": segms,
        })
    built = RCNNMinibatchBuilder(cfg).build(entries, seed=0)
    batch = jax.tree.map(
        jnp.asarray, built.as_pytree() if hasattr(built, "as_pytree") else built
    )
    print("canvas:", (h, w), flush=True)

    rpn_levels = tuple(range(cfg.FPN.RPN_MIN_LEVEL, cfg.FPN.RPN_MAX_LEVEL + 1))
    roi_levels = tuple(range(cfg.FPN.ROI_MIN_LEVEL, cfg.FPN.ROI_MAX_LEVEL + 1))

    def loss_prefix(params, data, rng_key, stop: int):
        b = data.shape[0]
        # keep the rng input live in every stage (otherwise S1-S3 would
        # DCE it and identical inputs could be memoized tunnel-side)
        rng_probe = jax.random.uniform(rng_key, ()) * 1e-30
        feats = model.apply({"params": params}, data, method="backbone")
        rpn_feats = {l: feats[l] for l in rpn_levels if l in feats}
        logits, deltas = model.apply(
            {"params": params}, rpn_feats, method=lambda m, f: m.rpn(f)
        )
        total, _m = rpn_losses(cfg, logits, deltas, batch, 1)
        total = total + rng_probe
        if stop == 1:
            return total

        prop_levels = []
        for lvl in rpn_feats:
            stride = 2.0 ** lvl
            size = cfg.FPN.RPN_ANCHOR_START_SIZE * (
                2 ** (lvl - cfg.FPN.RPN_MIN_LEVEL)
            )
            cell = np.concatenate([
                generate_cell_anchors(stride, (size,), (ar,))
                for ar in cfg.FPN.RPN_ASPECT_RATIOS
            ])
            hl, wl = logits[lvl].shape[1:3]
            na = logits[lvl].shape[-1]
            anchors = jnp.asarray(
                field_of_anchors(cell, stride, hl, wl), jnp.float32
            )
            scores = jax.nn.sigmoid(jax.lax.stop_gradient(logits[lvl]))
            dl = jax.lax.stop_gradient(
                deltas[lvl].reshape(b, hl, wl, na, 4)
            )
            cand = jax.vmap(
                lambda s, dd, ihw: proposal_candidates(
                    s, dd, anchors, ihw,
                    cfg.TRAIN.RPN_PRE_NMS_TOP_N,
                    float(cfg.TRAIN.RPN_MIN_SIZE),
                )
            )(scores, dl, batch["im_hw"])
            prop_levels.append((lvl,) + cand)
        if stop == 2:
            return total + sum(jnp.sum(c[1]) * 0.0 for c in prop_levels)

        lv_b, lv_s, lv_v = nms_levels_batched(
            prop_levels, cfg.TRAIN.RPN_NMS_THRESH,
            cfg.TRAIN.RPN_POST_NMS_TOP_N,
        )
        if stop == 3:
            return total + sum(jnp.sum(v) * 0.0 for v in lv_b.values())

        rngs = jax.random.split(rng_key, b)

        def per_image(lvb, lvs, lvv, gb, gc, ri):
            boxes, _s, valid, _l = collect_and_distribute_fpn_proposals(
                lvb, lvs, lvv, cfg.TRAIN.RPN_POST_NMS_TOP_N,
                cfg.FPN.ROI_MIN_LEVEL, cfg.FPN.ROI_MAX_LEVEL,
            )
            return sample_proposal_labels(
                ri, boxes, valid, gb, gc,
                cfg.TRAIN.BATCH_SIZE_PER_IM, cfg.TRAIN.FG_FRACTION,
                cfg.TRAIN.FG_THRESH, cfg.TRAIN.BG_THRESH_HI,
                cfg.TRAIN.BG_THRESH_LO, cfg.MODEL.NUM_CLASSES,
                cfg.MODEL.BBOX_REG_WEIGHTS,
            )

        sampled = jax.vmap(per_image)(
            lv_b, lv_s, lv_v, batch["gt_boxes"], batch["gt_classes"], rngs
        )
        if stop == 4:
            return total + jnp.sum(sampled["rois"]) * 0.0

        r = sampled["rois"].shape[1]
        batch_col = jnp.repeat(jnp.arange(b, dtype=jnp.float32), r)[:, None]
        flat_rois = jnp.concatenate(
            [batch_col, sampled["rois"].reshape(-1, 4)], axis=1
        )
        lvls = map_rois_to_fpn_levels(
            flat_rois[:, 1:], cfg.FPN.ROI_MIN_LEVEL, cfg.FPN.ROI_MAX_LEVEL,
            cfg.FPN.ROI_CANONICAL_SCALE, cfg.FPN.ROI_CANONICAL_LEVEL,
        )
        roi_feat_maps = {l: feats[l] for l in roi_levels if l in feats}
        roi_feats = multilevel_roi_align(
            roi_feat_maps, flat_rois, lvls, sampled["valid"].reshape(-1),
            cfg.FAST_RCNN.ROI_XFORM_RESOLUTION,
            cfg.FAST_RCNN.ROI_XFORM_SAMPLING_RATIO,
        )
        if stop == 5:
            return total + jnp.sum(roi_feats) * 0.0

        cls_score, bbox_pred = model.apply(
            {"params": params}, roi_feats, method=lambda m, f: m.box_head(f)
        )
        box_total, _bm = fast_rcnn_losses(
            cfg, cls_score, sampled["labels"].reshape(-1), bbox_pred,
            sampled["bbox_targets"].reshape(cls_score.shape[0], -1),
            sampled["bbox_inside_weights"].reshape(cls_score.shape[0], -1),
            sampled["bbox_outside_weights"].reshape(cls_score.shape[0], -1),
            sampled["valid"].reshape(-1), 1, n_images=b,
        )
        total = total + box_total
        if stop == 6 or not cfg.MODEL.MASK_ON:
            return total

        # ---- mask sub-stages (mirror rcnn_train.py mask branch: aux heads
        # run on the leading fg_cap slots only)
        from sad_tpu.train.mask_keypoint import (
            mask_loss, mask_targets_on_device,
        )

        fg_cap = sampled_fg_cap(
            cfg.TRAIN.BATCH_SIZE_PER_IM, cfg.TRAIN.FG_FRACTION
        )
        fg_rois = sampled["rois"][:, :fg_cap]
        fg_is_fg = sampled["is_fg"][:, :fg_cap].reshape(-1)
        fg_labels = sampled["labels"][:, :fg_cap].reshape(-1)
        fg_col = jnp.repeat(jnp.arange(b, dtype=jnp.float32), fg_cap)[:, None]
        flat_fg_rois = jnp.concatenate(
            [fg_col, fg_rois.reshape(-1, 4)], axis=1
        )
        fg_lvls = map_rois_to_fpn_levels(
            flat_fg_rois[:, 1:], cfg.FPN.ROI_MIN_LEVEL, cfg.FPN.ROI_MAX_LEVEL,
            cfg.FPN.ROI_CANONICAL_SCALE, cfg.FPN.ROI_CANONICAL_LEVEL,
        )
        mfeats = multilevel_roi_align(
            roi_feat_maps, flat_fg_rois, fg_lvls, fg_is_fg,
            cfg.MRCNN.ROI_XFORM_RESOLUTION, cfg.MRCNN.ROI_XFORM_SAMPLING_RATIO,
        )
        if stop == 7:
            return total + jnp.sum(mfeats) * 0.0
        mlogits = model.apply(
            {"params": params}, mfeats, method=lambda m, f: m.mask_head(f)
        )
        if stop == 8:
            return total + jnp.sum(mlogits) * 0.0

        def mask_tgt(i):
            return mask_targets_on_device(
                batch["gt_mask_rasters"][i], sampled["rois"][i, :fg_cap],
                sampled["matched_gt"][i, :fg_cap], cfg.MRCNN.RESOLUTION,
                batch["gt_mask_stride"],
            )

        mtargets = jax.vmap(mask_tgt)(jnp.arange(b)).reshape(
            (-1,) + (cfg.MRCNN.RESOLUTION,) * 2
        )
        ml = mask_loss(cfg, mlogits, mtargets, fg_labels, fg_is_fg, 1)
        return total + ml

    key = jax.random.PRNGKey(3)
    results = {}
    stages = [1, 2, 3, 4, 5, 6] + ([7, 8, 9] if with_mask else [])
    last = 9 if with_mask else 6
    fns = {
        s: jax.jit(lambda p, d, k, s=s: loss_prefix(p, d, k, s))
        for s in stages
    }
    fns["grad"] = jax.jit(
        lambda p, d, k: jax.grad(lambda pp: loss_prefix(pp, d, k, last))(p)
    )

    for name, fn in fns.items():
        t0 = time.perf_counter()
        out = fn(params, batch["data"], key)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
        iters = 10
        t0 = time.perf_counter()
        for i in range(iters):
            # rng evolves per call (defeats tunnel memoization); data is
            # left untouched so the jit signature (uint8 canvas) is stable
            key, sub = jax.random.split(key)
            out = fn(params, batch["data"], sub)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / iters * 1e3
        results[f"S{name}"] = round(ms, 1)
        print(f"S{name}", {"ms": round(ms, 1), "compile_s": round(compile_s, 1)},
              flush=True)

    # ---- S8: grad + momentum SGD (donated state), mirroring the real step
    from sad_tpu.models import bias_mask, trainable_mask
    from sad_tpu.train import TrainState, init_momentum_state
    from sad_tpu.train.optimizer import MomentumSGDState, momentum_sgd_update

    def sgd_step(state, data, k):
        grads = jax.grad(
            lambda pp: loss_prefix(pp, data, k, last)
        )(state.params)
        t_mask = trainable_mask(
            state.params, cfg.TRAIN.FREEZE_AT, cfg.TRAIN.FREEZE_CONV_BODY
        )
        b_mask = bias_mask(state.params)
        new_params, new_mom = momentum_sgd_update(
            state.params, grads, MomentumSGDState(state.velocity),
            jnp.float32(1e-6), momentum=cfg.SOLVER.MOMENTUM,
            weight_decay=cfg.SOLVER.WEIGHT_DECAY,
            trainable=t_mask, is_bias=b_mask,
        )
        return TrainState(new_params, new_mom.velocity)

    fn8 = jax.jit(sgd_step, donate_argnums=(0,))
    # donation consumes the state's buffers; keep an undonated copy for S9
    params9 = jax.tree.map(jnp.copy, params)
    state = TrainState(params, init_momentum_state(params).velocity)
    t0 = time.perf_counter()
    state = fn8(state, batch["data"], key)
    jax.block_until_ready(state.params)
    compile_s = time.perf_counter() - t0
    iters = 10
    t0 = time.perf_counter()
    for i in range(iters):
        key, sub = jax.random.split(key)
        state = fn8(state, batch["data"], sub)
    jax.block_until_ready(state.params)
    ms = (time.perf_counter() - t0) / iters * 1e3
    results["S8_sgd"] = round(ms, 1)
    print("S8_sgd", {"ms": round(ms, 1), "compile_s": round(compile_s, 1)},
          flush=True)

    # ---- S9: the real make_rcnn_train_step, timed identically
    from sad_tpu.train.rcnn_train import make_rcnn_train_step

    step = jax.jit(
        make_rcnn_train_step(cfg, model, n_groups=1), donate_argnums=(0,)
    )
    state = TrainState(params9, init_momentum_state(params9).velocity)
    t0 = time.perf_counter()
    state, metrics = step(state, batch, jnp.float32(1e-6), key)
    jax.block_until_ready(metrics["loss"])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(iters):
        key, sub = jax.random.split(key)
        state, metrics = step(state, batch, jnp.float32(1e-6), sub)
    jax.block_until_ready(metrics["loss"])
    ms = (time.perf_counter() - t0) / iters * 1e3
    results["S9_real_step"] = round(ms, 1)
    print("S9_real_step", {"ms": round(ms, 1),
                           "compile_s": round(compile_s, 1)}, flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
