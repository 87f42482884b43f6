"""Chip drive: decompose the Faster R-CNN train step cost by stage.

Separately jits and times (same geometry as rcnn_step_drive):
  A. backbone+RPN-head forward
  B. A + proposal generation (top_k + Pallas NMS + collect/sample)
  C. full loss forward (adds RoIAlign + box head)
  D. full train step (fwd + bwd + SGD)
Sums exceed D's parts (separate dispatches), but the deltas localize the
cost. Run: PYTHONPATH="/root/repo:$PYTHONPATH" python tools_drives/rcnn_step_decompose_drive.py
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

    cfg_path = (
        sys.argv[1] if len(sys.argv) > 1 else
        "/root/reference/detectron/configs/model_comp/"
        "e2e_faster_rcnn_R-50-FPN_1x.yaml"
    )
    cfg = load_cfg(
        cfg_path,
        ["NUM_GPUS", "1", "TRAIN.WEIGHTS", "", "COMPUTE_DTYPE", "bfloat16",
         "PIXEL_STD", "(57.375,57.12,58.395)"]
        + (["MODEL.MASK_ON", "False"] if "--no-mask" in sys.argv else []),
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
    d = tempfile.mkdtemp(prefix="rcnn_dec_")
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

    def timeit(tag, f, *args, iters=20):
        t0 = time.perf_counter()
        out = f(*args)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for i in range(iters):
            out = f(*args)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / iters * 1e3
        print(tag, {"ms": round(ms, 1), "compile_s": round(compile_s, 1)},
              flush=True)
        return ms

    # --- A: backbone + heads forward
    def fwd(p, data):
        # backbone + RPN heads only (no proposals)
        return model.apply({"params": p}, data, method="backbone")

    # evolving input guard: add tiny offset per iter is awkward with timeit;
    # use distinct scaling of data per call instead via closure state
    state_off = [0.0]

    def fwd_evolving(p, data):
        state_off[0] += 1e-6
        return jax.jit(fwd)(p, data + state_off[0])

    a_ms = timeit("A fwd", fwd_evolving, params, batch["data"])

    # --- B: forward + proposal generation + sampling (reuse internals via
    # the train step with a loss that stops before RoIAlign is not exposed;
    # approximate by timing the full step minus C/D deltas instead)

    # --- C/D: full step
    step = jax.jit(
        make_rcnn_train_step(cfg, model, n_groups=1), donate_argnums=(0,)
    )
    state = TrainState(params, init_momentum_state(params).velocity)
    lr = jnp.float32(1e-6)
    key = jax.random.PRNGKey(3)

    t0 = time.perf_counter()
    state, metrics = step(state, batch, lr, key)
    jax.block_until_ready(metrics["loss"])
    print("D compile:", round(time.perf_counter() - t0, 1), flush=True)
    iters = 20
    t0 = time.perf_counter()
    for i in range(iters):
        key, sub = jax.random.split(key)
        state, metrics = step(state, batch, lr, sub)
    jax.block_until_ready(metrics["loss"])
    d_ms = (time.perf_counter() - t0) / iters * 1e3
    print("D full step", {"ms": round(d_ms, 1)}, flush=True)

    # --- proposals in isolation: top_k and pallas NMS at P2 scale
    from sad_tpu.ops.nms import nms_fixed
    from sad_tpu.ops.pallas_nms import nms_fixed_pallas

    k2 = (h // 4) * (w // 4) * 3
    scores0 = jnp.asarray(rng.randn(k2), jnp.float32)

    def topk_evolving(s):
        state_off[0] += 1e-6
        return jax.jit(lambda x: jax.lax.top_k(x, 2000))(s + state_off[0])

    tk_ms = timeit(f"top_k k=2000 over {k2}", topk_evolving, scores0)

    boxes2 = jnp.asarray(rng.uniform(0, 500, (2000, 4)), jnp.float32)
    bx = jnp.concatenate([boxes2[:, :2], boxes2[:, :2] + 50], axis=1)
    sc2 = jnp.asarray(rng.uniform(size=(2000,)), jnp.float32)

    def nms_evolving(s):
        state_off[0] += 1e-7
        return nms_fixed_pallas(bx, s + state_off[0], 0.7, 2000)

    nms_ms = timeit("pallas NMS K=2000 max_out=2000", nms_evolving, sc2)

    print(json.dumps({
        "fwd_ms": round(a_ms, 1), "full_step_ms": round(d_ms, 1),
        "topk_P2_ms": round(tk_ms, 2), "pallas_nms_2000_ms": round(nms_ms, 2),
    }))


if __name__ == "__main__":
    main()
