"""Chip drive: re-bisect RoIAlign roi_chunk with warmup-aware timing.

The earlier 64-vs-256 bisection predates the fresh-executable warmup
discovery (BENCH_NOTES.md: a freshly-compiled executable's first ~10-20
calls are up to 20x slower over the axon tunnel), so its 604.6 ms reading
for chunk=256 was likely a cold window, not the chunk size. This drive
times the FULL Faster R-CNN train step (the rcnn_step_drive geometry) at
several roi_chunk values, each with 5-iter warmup windows until two
consecutive windows agree within 3%, in ONE process (later compiles share
the uploaded server-side state, skipping the slow phase entirely).

Run: PYTHONPATH="/root/repo:$PYTHONPATH" python tools_drives/roi_chunk_bisect_drive.py
"""

import functools
import json
import time


def build_step_inputs():
    import os
    import tempfile

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from sad_tpu.config import load_cfg
    from sad_tpu.data.minibatch import canvas_shapes
    from sad_tpu.data.rpn_minibatch import RCNNMinibatchBuilder
    from sad_tpu.models import create_model
    from sad_tpu.models.model_builder import init_model_params

    cfg = load_cfg(
        "/root/reference/detectron/configs/model_comp/"
        "e2e_faster_rcnn_R-50-FPN_1x.yaml",
        ["NUM_GPUS", "1", "TRAIN.WEIGHTS", "", "COMPUTE_DTYPE", "bfloat16",
         "PIXEL_STD", "(57.375,57.12,58.395)"],
    )
    (h, w), _ = canvas_shapes(cfg)
    n_images = cfg.TRAIN.IMS_PER_BATCH
    model = create_model(cfg)
    params = init_model_params(model, jax.random.PRNGKey(0), (1, h, w, 3))

    rng = np.random.RandomState(0)
    d = tempfile.mkdtemp(prefix="roi_chunk_")
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
        segms = (
            [[[float(b[0]), float(b[1]), float(b[2]), float(b[1]),
               float(b[2]), float(b[3]), float(b[0]), float(b[3])]]
             for b in boxes]
            if cfg.MODEL.MASK_ON else [None] * nb
        )
        entries.append({
            "id": i + 1, "image": p, "width": 980, "height": 600,
            "flipped": False, "boxes": boxes,
            "gt_classes": rng.randint(
                1, cfg.MODEL.NUM_CLASSES, nb).astype(np.int32),
            "is_crowd": np.zeros(nb, bool), "segms": segms,
        })
    built = RCNNMinibatchBuilder(cfg).build(entries, seed=0)
    batch = jax.tree.map(
        jnp.asarray, built.as_pytree() if hasattr(built, "as_pytree") else built
    )
    return cfg, model, params, batch, n_images


def time_step(cfg, model, params, batch, n_images, chunk):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sad_tpu.ops import detectron_ops
    from sad_tpu.train import TrainState, init_momentum_state
    from sad_tpu.train.rcnn_train import make_rcnn_train_step

    orig = time_step.orig
    detectron_ops.roi_align = functools.wraps(orig)(
        functools.partial(orig, roi_chunk=chunk)
    )
    try:
        step = jax.jit(
            make_rcnn_train_step(cfg, model, n_groups=1), donate_argnums=(0,)
        )
        # The step donates its state, which would invalidate the shared
        # `params` buffers for every later chunk value — give each chunk
        # its own copies.
        params = jax.tree.map(lambda x: jnp.array(x, copy=True), params)
        state = TrainState(params, init_momentum_state(params).velocity)
        lr = jnp.float32(1e-6)
        key = jax.random.PRNGKey(3)

        t0 = time.perf_counter()
        state, metrics = step(state, batch, lr, key)
        jax.block_until_ready(metrics["loss"])
        compile_s = time.perf_counter() - t0
        assert np.isfinite(float(metrics["loss"]))

        prev = None
        for _ in range(10):
            t0 = time.perf_counter()
            for _ in range(5):
                key, sub = jax.random.split(key)
                state, metrics = step(state, batch, lr, sub)
            jax.block_until_ready(metrics["loss"])
            cur = (time.perf_counter() - t0) / 5
            if prev is not None and abs(cur - prev) / cur < 0.03:
                break
            prev = cur

        iters = 20
        t0 = time.perf_counter()
        for _ in range(iters):
            key, sub = jax.random.split(key)
            state, metrics = step(state, batch, lr, sub)
        jax.block_until_ready(metrics["loss"])
        dt = time.perf_counter() - t0
        assert np.isfinite(float(metrics["loss"]))
        return {"roi_chunk": chunk,
                "ms_per_step": round(dt / iters * 1e3, 1),
                "imgs_per_sec": round(n_images * iters / dt, 2),
                "compile_s": round(compile_s, 1)}
    finally:
        detectron_ops.roi_align = orig


def main():
    from sad_tpu.ops import detectron_ops

    time_step.orig = detectron_ops.roi_align
    cfg, model, params, batch, n_images = build_step_inputs()
    results = []
    # 64 first and last: the first compile in a process may still pay a
    # residual warmup tail; the repeat at the end is the control.
    for chunk in (64, 128, 256, 512, 64):
        r = time_step(cfg, model, params, batch, n_images, chunk)
        print(json.dumps(r), flush=True)
        results.append(r)
    best = min(results, key=lambda r: r["ms_per_step"])
    print(json.dumps({"best": best}))


if __name__ == "__main__":
    main()
