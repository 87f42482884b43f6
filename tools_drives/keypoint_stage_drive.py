"""Chip drive: decompose the Keypoint R-CNN train step (VERDICT r2 item 4).

The keypoint step measured 100.7 ms at the e2e_keypoint_rcnn_R-50-FPN_1x
geometry (800x1344 canvas, bs2) = 8.28x the 2.40 imgs/s/GPU reference —
3x worse relative speedup than every sibling. Localize where it goes:

  A. backbone fwd alone (the 832x1344 trunk suspect)
  B. full train step with KEYPOINTS_ON=False (box branch only; same
     proposal sampling — our kp head runs on the box fg slots, so the
     B->C delta is exactly the keypoint branch: RoIAlign-14 + 8x512 tower
     + deconv/upsample + on-device targets + loss, fwd+bwd)
  C. full train step with keypoints (the 100.7 ms configuration)
  D. keypoint tower alone on the (2*fg_cap, 14, 14, 256) RoI features —
     fwd and fwd+bwd, with its analytic FLOPs -> achieved MXU fraction.

Memoization hygiene (BENCH_NOTES hazard): every timed call must differ in
input BITS. Additive offsets must exceed the dtype's ulp at the data's
magnitude — 1e-6 on a ~100-magnitude f32 image or on bf16 rounds to the
SAME array and the tunnel replays the result (first version of this drive
read 0.3 ms for the 800x1344 trunk: fiction). Steps evolve via donated
state + a per-call bit-distinct lr; pure forwards evolve their input by
0.125 (exactly representable, > ulp at any magnitude here).

Run: PYTHONPATH="/root/repo:$PYTHONPATH" python tools_drives/keypoint_stage_drive.py
"""

import json
import sys
import time

import numpy as np


def _timed(tag, fn, iters=20, warm_windows=8, sanity_floor_ms=None):
    import jax

    out = fn()
    jax.block_until_ready(out)
    prev = None
    for _ in range(warm_windows):
        t0 = time.perf_counter()
        for _ in range(5):
            out = fn()
        jax.block_until_ready(out)
        cur = (time.perf_counter() - t0) / 5
        if prev is not None and abs(cur - prev) / cur < 0.03:
            break
        prev = cur
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{tag}: {ms:.1f} ms", flush=True)
    if sanity_floor_ms is not None and ms < sanity_floor_ms:
        raise RuntimeError(
            f"{tag} read {ms:.2f} ms < sanity floor {sanity_floor_ms} ms — "
            "memoized replay suspected, inputs are not evolving in bits"
        )
    return round(ms, 1)


def main():
    import jax
    import jax.numpy as jnp

    from sad_tpu.config import load_cfg
    from sad_tpu.config.config import merge_cfg_from_dict
    from sad_tpu.models import create_model
    from sad_tpu.models.model_builder import init_model_params
    from sad_tpu.ops.proposals import sampled_fg_cap
    from sad_tpu.train import TrainState, init_momentum_state
    from sad_tpu.train.rcnn_train import make_rcnn_train_step

    cfg_path = (
        "/root/reference/detectron/configs/12_2017_baselines/"
        "e2e_keypoint_rcnn_R-50-FPN_1x.yaml"
    )
    cfg = load_cfg(cfg_path, [
        "NUM_GPUS", "1", "TRAIN.WEIGHTS", "", "COMPUTE_DTYPE", "bfloat16",
        "PIXEL_STD", "(57.375,57.12,58.395)",
    ])
    from sad_tpu.data.minibatch import canvas_shapes

    (h, w), _ = canvas_shapes(cfg)
    n_images = cfg.TRAIN.IMS_PER_BATCH
    fg_cap = sampled_fg_cap(cfg.TRAIN.BATCH_SIZE_PER_IM, cfg.TRAIN.FG_FRACTION)
    print(f"canvas {(h, w)} bs{n_images} fg_cap/im {fg_cap}", flush=True)
    model = create_model(cfg)
    # init at a small canvas: conv/FC param shapes are canvas-independent,
    # and the init program at the full 800x1344 canvas costs ~440 s of
    # server-side compile over the tunnel (measured) for zero benefit
    params0 = init_model_params(model, jax.random.PRNGKey(0), (1, 256, 256, 3))
    _copy = jax.jit(lambda t: jax.tree_util.tree_map(jnp.copy, t))

    def fresh_params():
        # device-to-device copy (fresh buffers so per-phase donation can't
        # delete a previous phase's params); no host round-trip
        out = _copy(params0)
        jax.block_until_ready(out)
        return out

    # ---- batch via the real minibatch builder (synthetic person boxes)
    import os
    import tempfile

    from PIL import Image

    from sad_tpu.data.rpn_minibatch import RCNNMinibatchBuilder

    rng = np.random.RandomState(0)
    d = tempfile.mkdtemp(prefix="kp_stage_")
    entries = []
    for i in range(n_images):
        p = os.path.join(d, f"{i}.png")
        Image.fromarray(rng.randint(0, 255, (600, 980, 3), np.uint8)).save(p)
        nb = 3  # realistic persons-per-image
        x0 = rng.uniform(0, 700, nb)
        y0 = rng.uniform(0, 400, nb)
        bw = rng.uniform(60, 200, nb)
        bh = rng.uniform(120, 200, nb)
        boxes = np.stack([x0, y0, x0 + bw, y0 + bh], 1).astype(np.float32)
        nk = cfg.KRCNN.NUM_KEYPOINTS
        kp = np.zeros((nb, nk, 3), np.float32)
        kp[..., 0] = rng.uniform(boxes[:, 0:1], boxes[:, 2:3], (nb, nk))
        kp[..., 1] = rng.uniform(boxes[:, 1:2], boxes[:, 3:4], (nb, nk))
        kp[..., 2] = 2.0
        entries.append({
            "id": i + 1, "image": p, "width": 980, "height": 600,
            "flipped": False, "boxes": boxes,
            "gt_classes": np.ones(nb, np.int32),
            "is_crowd": np.zeros(nb, bool),
            "segms": [None] * nb,
            "gt_keypoints": kp,
        })
    built = RCNNMinibatchBuilder(cfg).build(entries, seed=0)
    batch = jax.tree.map(
        jnp.asarray, built.as_pytree() if hasattr(built, "as_pytree") else built
    )

    results = {}

    # ---- A. trunk fwd (input evolves by 0.125 per call — representable at
    # image magnitude in f32; the sum feeds back so XLA cannot fold it)
    data_f32 = batch["data"].astype(jnp.float32)
    p_trunk = fresh_params()

    @jax.jit
    def trunk_probe(x, s):
        feats = model.apply({"params": p_trunk}, x + s * 0.0, method="backbone")
        tot = sum(
            jnp.sum(v.astype(jnp.float32)) for v in feats.values()
        )
        return tot

    carry = [jnp.float32(0.0)]

    def trunk_call():
        carry[0] = carry[0] + jnp.float32(0.125)
        return trunk_probe(data_f32 + carry[0], carry[0])

    results["A_trunk_fwd_ms"] = _timed("A trunk fwd", trunk_call,
                                       sanity_floor_ms=1.0)

    # ---- B / C: full steps without/with the keypoint branch. The donated
    # state evolves; lr is additionally bit-distinct per call so even a
    # zero-update step cannot be replayed.
    def run_step(tag, c, b, floor):
        step = jax.jit(make_rcnn_train_step(c, model, n_groups=1),
                       donate_argnums=(0,))
        p = fresh_params()
        holder = {
            "s": TrainState(p, init_momentum_state(p).velocity),
            "k": jax.random.PRNGKey(3),
            "i": 0,
        }

        def call():
            holder["k"], sub = jax.random.split(holder["k"])
            holder["i"] += 1
            lr = jnp.float32(1e-6) * (1.0 + (holder["i"] % 13) / 16.0)
            holder["s"], metrics = step(holder["s"], b, lr, sub)
            return metrics["loss"]

        ms = _timed(tag, call, sanity_floor_ms=floor)
        assert np.isfinite(float(holder["s"].velocity and 0.0) + ms)
        return ms

    cfg_nokp = merge_cfg_from_dict(cfg, {"MODEL": {"KEYPOINTS_ON": False}})
    batch_nokp = {k: v for k, v in batch.items() if k != "gt_keypoints"}
    results["B_step_box_only_ms"] = run_step(
        "B box-only step", cfg_nokp, batch_nokp, floor=5.0
    )
    results["C_step_with_kp_ms"] = run_step(
        "C keypoint step", cfg, batch, floor=5.0
    )
    results["kp_branch_ms"] = round(
        results["C_step_with_kp_ms"] - results["B_step_box_only_ms"], 1
    )

    # ---- D. keypoint tower alone at the exact branch shape (bf16: evolve
    # by 0.125, representable at N(0,1) magnitude)
    n_rois = n_images * fg_cap
    feats0 = jax.random.normal(
        jax.random.PRNGKey(7),
        (n_rois, cfg.KRCNN.ROI_XFORM_RESOLUTION,
         cfg.KRCNN.ROI_XFORM_RESOLUTION, 256),
        jnp.bfloat16,
    )
    p_head = fresh_params()

    head_fwd = jax.jit(
        lambda f: jnp.sum(
            model.apply({"params": p_head}, f,
                        method=lambda m, x: m.kps_head(x)).astype(jnp.float32)
        )
    )
    head_bwd = jax.jit(jax.grad(
        lambda f: jnp.sum(
            model.apply({"params": p_head}, f,
                        method=lambda m, x: m.kps_head(x)).astype(jnp.float32)
        )
    ))
    foff = [jnp.bfloat16(0.0)]

    def fwd_call():
        foff[0] = foff[0] + jnp.bfloat16(0.125)
        return head_fwd(feats0 + foff[0])

    def bwd_call():
        foff[0] = foff[0] + jnp.bfloat16(0.125)
        return head_bwd(feats0 + foff[0])

    results["D_kp_head_fwd_ms"] = _timed("D kp head fwd", fwd_call,
                                         sanity_floor_ms=0.5)
    results["D_kp_head_fwdbwd_ms"] = _timed("D kp head fwd+bwd", bwd_call,
                                            sanity_floor_ms=1.0)

    # analytic tower FLOPs (fwd): conv1 256->512 + (n-1) x 512->512, 3x3 at
    # RxR, + deconv 512->K 4x4 at 2Rx2R
    r = cfg.KRCNN.ROI_XFORM_RESOLUTION
    dim = cfg.KRCNN.CONV_HEAD_DIM
    k = cfg.KRCNN.NUM_KEYPOINTS
    nconv = cfg.KRCNN.NUM_STACKED_CONVS
    per_roi = (
        r * r * dim * 256 * 9 * 2
        + (nconv - 1) * r * r * dim * dim * 9 * 2
        + (2 * r) * (2 * r) * k * dim * 16 * 2
    )
    tflop_fwd = per_roi * n_rois / 1e12
    results["kp_head_fwd_tflop"] = round(tflop_fwd, 3)
    results["kp_head_fwd_tflops_rate"] = round(
        tflop_fwd / (results["D_kp_head_fwd_ms"] / 1e3), 1
    )
    results["kp_head_fwdbwd_tflops_rate"] = round(
        3 * tflop_fwd / (results["D_kp_head_fwdbwd_ms"] / 1e3), 1
    )
    results["imgs_per_s_with_kp"] = round(
        n_images / (results["C_step_with_kp_ms"] / 1e3), 2
    )
    print(json.dumps(results))
    print("DRIVE OK")


if __name__ == "__main__":
    sys.exit(main())
