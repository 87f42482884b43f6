"""Chip drive: localize the trimodal R-CNN step timings (52/98/600 ms).

Same HEAD, same harness, back-to-back processes gave 52.4, 599.5 and
97.8 ms/step for the identical jitted train step. This drive separates
the hypotheses inside ONE process:

  - time the same executable in 3 windows           -> per-call state?
  - re-jit the same step with a cache-busting no-op -> compile nondeterminism?

Run: PYTHONPATH=/root/repo python tools_drives/rcnn_step_variance_drive.py
"""

import json
import time


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from sad_tpu.config import load_cfg
    from sad_tpu.models import create_model
    from sad_tpu.models.model_builder import init_model_params
    from sad_tpu.train import TrainState, init_momentum_state
    from sad_tpu.train.rcnn_train import make_rcnn_train_step

    cfg = load_cfg(
        "/root/reference/detectron/configs/model_comp/"
        "e2e_faster_rcnn_R-50-FPN_1x.yaml",
        ["NUM_GPUS", "1", "TRAIN.WEIGHTS", "", "COMPUTE_DTYPE", "bfloat16",
         "PIXEL_STD", "(57.375,57.12,58.395)"],
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
    d = tempfile.mkdtemp(prefix="rcnn_var_")
    entries = []
    for i in range(n_images):
        p = os.path.join(d, f"{i}.png")
        Image.fromarray(rng.randint(0, 255, (600, 980, 3), np.uint8)).save(p)
        nb = 8
        x0 = rng.uniform(0, 800, nb)
        y0 = rng.uniform(0, 450, nb)
        bw = rng.uniform(40, 160, nb)
        bh = rng.uniform(40, 120, nb)
        entries.append({
            "id": i + 1, "image": p, "width": 980, "height": 600,
            "flipped": False,
            "boxes": np.stack([x0, y0, x0 + bw, y0 + bh], 1).astype(np.float32),
            "gt_classes": rng.randint(
                1, cfg.MODEL.NUM_CLASSES, nb).astype(np.int32),
            "is_crowd": np.zeros(nb, bool),
            "segms": [None] * nb,
        })
    built = RCNNMinibatchBuilder(cfg).build(entries, seed=0)
    batch = jax.tree.map(jnp.asarray, built)

    base_step = make_rcnn_train_step(cfg, model, n_groups=1)
    key = jax.random.PRNGKey(3)
    results = {}

    def timed(tag, step_fn, windows=3, iters=10):
        nonlocal key
        state = TrainState(
            jax.tree.map(jnp.copy, params),
            init_momentum_state(params).velocity,
        )
        t0 = time.perf_counter()
        state, metrics = step_fn(state, batch, jnp.float32(1e-6), key)
        jax.block_until_ready(metrics["loss"])
        compile_s = round(time.perf_counter() - t0, 1)
        ws = []
        for _ in range(windows):
            t0 = time.perf_counter()
            for _ in range(iters):
                key, sub = jax.random.split(key)
                state, metrics = step_fn(
                    state, batch, jnp.float32(1e-6), sub
                )
            jax.block_until_ready(metrics["loss"])
            ws.append(round((time.perf_counter() - t0) / iters * 1e3, 1))
        results[tag] = {"compile_s": compile_s, "windows_ms": ws}
        print(tag, results[tag], flush=True)

    # A: plain compile of the step
    timed("A", jax.jit(base_step, donate_argnums=(0,)))

    # B: same step, distinct HLO hash (dead rng-free perturbation on lr)
    def step_b(state, b, lr, k):
        return base_step(state, b, lr + jnp.float32(0.0) * 1e-30, k)

    timed("B", jax.jit(step_b, donate_argnums=(0,)))

    # C: another distinct compile
    def step_c(state, b, lr, k):
        return base_step(state, b, lr * jnp.float32(1.0 + 1e-30), k)

    timed("C", jax.jit(step_c, donate_argnums=(0,)))

    print(json.dumps(results))


if __name__ == "__main__":
    main()
