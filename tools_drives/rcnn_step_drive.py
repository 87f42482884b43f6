"""Chip drive: realistic-scale Faster R-CNN train-step throughput.

e2e Faster R-CNN R-50-FPN at the reference 1x geometry (800 shortest
side -> 832x1344 canvas, 2 imgs, RPN POST_NMS_TOP_N=2000, 512 RoIs/im)
— the configuration whose graph was compile-prohibitive before the RPN
proposal NMS moved to the Pallas kernel (~25 min per NMS instance x 5
FPN levels; see rpn_nms_micro_drive results in BENCH_NOTES.md).

Honest evolving-state timing (LR 1e-6, finite-loss asserts).
Reference baseline: e2e Faster R-CNN R-50-FPN 1x trains at 16 imgs /
0.544 s on 8x P100 = 3.68 imgs/s/GPU (upstream MODEL_ZOO.md).

Run: PYTHONPATH="/root/repo:$PYTHONPATH" python tools_drives/rcnn_step_drive.py
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from sad_tpu.config import load_cfg
    from sad_tpu.models import create_model
    from sad_tpu.models.model_builder import init_model_params
    from sad_tpu.train import TrainState, init_momentum_state
    from sad_tpu.train.rcnn_train import make_rcnn_train_step

    import sys

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    cfg_path = (
        args[0] if args else
        "/root/reference/detectron/configs/model_comp/"
        "e2e_faster_rcnn_R-50-FPN_1x.yaml"
    )
    cfg = load_cfg(
        cfg_path,
        ["NUM_GPUS", "1", "TRAIN.WEIGHTS", "", "COMPUTE_DTYPE", "bfloat16",
         "PIXEL_STD", "(57.375,57.12,58.395)"]
        + (["MODEL.MASK_ON", "False"] if "--no-mask" in sys.argv else [])
        + args[1:],  # extra KEY VALUE override pairs
    )
    print("cfg:", cfg_path.rsplit("/", 1)[-1], "MASK_ON:", cfg.MODEL.MASK_ON,
          flush=True)
    from sad_tpu.data.minibatch import canvas_shapes

    (h, w), _ = canvas_shapes(cfg)
    n_images = cfg.TRAIN.IMS_PER_BATCH  # 4 in the model_comp yaml
    model = create_model(cfg)
    # init at a small canvas: param shapes are canvas-independent and the
    # init program at the full canvas costs ~440 s of server-side compile
    # over the tunnel (measured, keypoint_stage_drive)
    params = init_model_params(model, jax.random.PRNGKey(0), (1, 256, 256, 3))

    # real minibatch builder over synthetic 600x980 images
    import os
    import tempfile

    from PIL import Image

    from sad_tpu.data.rpn_minibatch import RCNNMinibatchBuilder

    rng = np.random.RandomState(0)
    d = tempfile.mkdtemp(prefix="rcnn_step_")
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
        entry = {
            "id": i + 1, "image": p, "width": 980, "height": 600,
            "flipped": False,
            "boxes": boxes,
            "gt_classes": rng.randint(
                1, cfg.MODEL.NUM_CLASSES, nb).astype(np.int32),
            "is_crowd": np.zeros(nb, bool),
            "segms": segms,
        }
        if cfg.MODEL.KEYPOINTS_ON:
            nk = cfg.KRCNN.NUM_KEYPOINTS
            kp = np.zeros((nb, nk, 3), np.float32)
            kp[..., 0] = rng.uniform(boxes[:, 0:1], boxes[:, 2:3], (nb, nk))
            kp[..., 1] = rng.uniform(boxes[:, 1:2], boxes[:, 3:4], (nb, nk))
            kp[..., 2] = 2.0  # visible
            entry["gt_keypoints"] = kp
        entries.append(entry)
    built = RCNNMinibatchBuilder(cfg).build(entries, seed=0)
    batch = jax.tree.map(
        jnp.asarray, built.as_pytree() if hasattr(built, "as_pytree") else built
    )
    print("canvas:", (h, w), "batch keys:", sorted(batch)[:6], flush=True)

    step = jax.jit(
        make_rcnn_train_step(cfg, model, n_groups=1), donate_argnums=(0,)
    )
    state = TrainState(params, init_momentum_state(params).velocity)
    lr = jnp.float32(1e-6)
    key = jax.random.PRNGKey(3)

    t0 = time.perf_counter()
    state, metrics = step(state, batch, lr, key)
    jax.block_until_ready(metrics["loss"])
    compile_s = time.perf_counter() - t0
    assert np.isfinite(float(metrics["loss"])), "NaN in warmup"

    # warm past the fresh-executable slow phase (server-side upload over the
    # axon tunnel; see tools_drives/rcnn_step_variance_drive.py): 5-iter
    # windows until two consecutive windows agree within 3%
    prev = None
    for _ in range(8):
        t0 = time.perf_counter()
        for _ in range(5):
            key, sub = jax.random.split(key)
            state, metrics = step(state, batch, lr, sub)
        jax.block_until_ready(metrics["loss"])
        cur = (time.perf_counter() - t0) / 5
        if prev is not None and abs(cur - prev) / cur < 0.03:
            break
        prev = cur

    import os

    prof_dir = os.environ.get("SAD_PROFILE_DIR")
    if prof_dir:
        jax.profiler.start_trace(prof_dir)
    iters = 20
    t0 = time.perf_counter()
    for i in range(iters):
        key, sub = jax.random.split(key)
        state, metrics = step(state, batch, lr, sub)
    jax.block_until_ready(metrics["loss"])
    dt = time.perf_counter() - t0
    if prof_dir:
        jax.profiler.stop_trace()
    assert np.isfinite(float(metrics["loss"]))

    fam = (
        "keypoint" if cfg.MODEL.KEYPOINTS_ON
        else "mask" if cfg.MODEL.MASK_ON else "faster"
    )
    payload = {
        "metric": fam + "_rcnn_train_imgs_per_sec_per_chip",
        "value": round(n_images * iters / dt, 2),
        "ms_per_step": round(dt / iters * 1e3, 1),
        "compile_s": round(compile_s, 1),
        # reference 8xP100 per-GPU rates (MODEL_ZOO.md): e2e FRCNN
        # R-50-FPN 0.544 s/iter -> 3.68; e2e Mask R-50-FPN 0.889 -> 2.25;
        # e2e keypoint R-50-FPN 1x 0.832 s/iter -> 2.40 imgs/s/GPU
        "vs_baseline": round(
            n_images * iters / dt
            / (2.40 if cfg.MODEL.KEYPOINTS_ON
               else 2.25 if cfg.MODEL.MASK_ON else 3.68), 2
        ),
        "batch": n_images,
        "remat": bool(cfg.REMAT_BACKBONE),
    }
    print(json.dumps(payload))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from driveutil import record_result
    record_result(
        f"family_{fam}_rcnn_bs{n_images}"
        + ("_remat_on" if cfg.REMAT_BACKBONE else ""),
        payload,
    )


if __name__ == "__main__":
    main()
