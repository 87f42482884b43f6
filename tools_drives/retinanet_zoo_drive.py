"""Chip drive: plain RetinaNet train-step throughput vs the MODEL_ZOO rows.

The flagship bench measures the joint distillation step; this measures the
PLAIN (non-distill) RetinaNet train step at the true 1x geometry (800
shortest side, TRAIN.SCALES of retinanet_*_1x.yaml) for the three trunks
the upstream MODEL_ZOO publishes step times for (MODEL_ZOO.md:889-961,
8x Tesla P100):

| model | s/iter (16 imgs) | imgs/s/GPU |
|---|---|---|
| RetinaNet R-50-FPN 1x | 0.483 | 4.141 |
| RetinaNet R-101-FPN 1x | 0.666 | 3.003 |
| RetinaNet X-101-64x4d-FPN 1x | 1.613 | 1.240 |

X-101-64x4d exercises the grouped-conv path (RESNETS.NUM_GROUPS=64,
WIDTH_PER_GROUP=4) at production scale.

Methodology: bench.py's (synthetic per-level targets, evolving-state
timing with finite-loss asserts, windowed warmup for the axon
fresh-executable phase).

Run: PYTHONPATH="/root/repo:$PYTHONPATH" python tools_drives/retinanet_zoo_drive.py \
    [yaml] [--groups N] [KEY VALUE ...]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINES = {  # imgs/s/GPU on 8x P100, MODEL_ZOO.md:889-961
    "retinanet_R-50-FPN_1x.yaml": 16 / 0.483 / 8,
    "retinanet_R-101-FPN_1x.yaml": 16 / 0.666 / 8,
    "retinanet_X-101-64x4d-FPN_1x.yaml": 16 / 1.613 / 8,
}


def main():
    import jax
    import jax.numpy as jnp

    from sad_tpu.config import load_cfg
    from sad_tpu.data.minibatch import canvas_shapes
    from sad_tpu.models import create_model
    from sad_tpu.models.model_builder import init_model_params
    from sad_tpu.train import TrainState, init_momentum_state, make_train_step

    argv = sys.argv[1:]
    n_groups = 4
    if "--groups" in argv:
        i = argv.index("--groups")
        n_groups = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    yaml = argv[0] if argv else (
        "/root/reference/detectron/configs/12_2017_baselines/"
        "retinanet_R-50-FPN_1x.yaml"
    )
    name = yaml.rsplit("/", 1)[-1]
    cfg = load_cfg(
        yaml,
        ["NUM_GPUS", "1", "TRAIN.WEIGHTS", "", "COMPUTE_DTYPE", "bfloat16",
         "PIXEL_STD", "(57.375,57.12,58.395)"] + argv[1:],
    )
    (h, w), _ = canvas_shapes(cfg)
    n_images = cfg.TRAIN.IMS_PER_BATCH * n_groups
    print(f"cfg: {name} canvas: {(h, w)} groups: {n_groups} "
          f"imgs: {n_images}", flush=True)

    model = create_model(cfg)
    # init at a small canvas: param shapes are canvas-independent and the
    # full-canvas init program costs minutes of server-side compile
    params = init_model_params(model, jax.random.PRNGKey(0), (1, 256, 256, 3))

    rng = np.random.RandomState(0)
    a = cfg.num_anchors_per_cell()
    batch = {
        "data_u8": jnp.asarray(
            rng.randint(90, 150, (n_images, h, w, 3)).astype(np.uint8)),
        "content_hw": jnp.asarray(
            np.tile(np.float32([800.0, float(cfg.TRAIN.MAX_SIZE)]),
                    (n_images, 1))),
        "labels": {},
        "bbox_targets": {},
        "fg_mask": {},
        "fg_num": jnp.asarray([24.0] * n_groups, jnp.float32),
    }
    for lvl in cfg.fpn_levels():
        s = 2 ** lvl
        hl, wl = h // s, w // s
        batch["labels"][lvl] = jnp.asarray(
            rng.randint(-1, cfg.MODEL.NUM_CLASSES, (n_images, hl, wl, a)),
            jnp.int32)
        batch["bbox_targets"][lvl] = jnp.asarray(
            rng.randn(n_images, hl, wl, a, 4), jnp.float32)
        batch["fg_mask"][lvl] = jnp.asarray(
            rng.uniform(size=(n_images, hl, wl, a)) < 0.002)

    step = jax.jit(
        make_train_step(cfg, model, n_groups=n_groups), donate_argnums=(0,)
    )
    state = TrainState(params, init_momentum_state(params).velocity)
    lr = jnp.float32(1e-6)

    t0 = time.perf_counter()
    state, metrics = step(state, None, batch, lr)
    jax.block_until_ready(metrics["loss"])
    compile_s = time.perf_counter() - t0
    assert np.isfinite(float(metrics["loss"])), "NaN in warmup"

    prev = None
    for _ in range(8):
        t0 = time.perf_counter()
        for _ in range(5):
            state, metrics = step(state, None, batch, lr)
        jax.block_until_ready(metrics["loss"])
        cur = (time.perf_counter() - t0) / 5
        if prev is not None and abs(cur - prev) / cur < 0.03:
            break
        prev = cur

    iters = 15
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, None, batch, lr)
    jax.block_until_ready(metrics["loss"])
    dt = time.perf_counter() - t0
    assert np.isfinite(float(metrics["loss"]))

    imgs_per_sec = n_images * iters / dt
    base = BASELINES.get(name)
    short = name.replace("retinanet_", "").replace(".yaml", "")
    payload = {
        "metric": "plain_retinanet_train_imgs_per_sec_per_chip",
        "model": short,
        "value": round(imgs_per_sec, 2),
        "ms_per_step": round(dt / iters * 1e3, 1),
        "canvas": [h, w],
        "batch": n_images,
        "compile_s": round(compile_s, 1),
        "vs_baseline": round(imgs_per_sec / base, 2) if base else None,
    }
    print(json.dumps(payload))
    import os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from driveutil import record_result
    trunk = "".join(short.split("-")[:2]).lower()  # R-50.. -> r50, X-101..
    record_result("zoo_retinanet_" + trunk, payload)


if __name__ == "__main__":
    main()
