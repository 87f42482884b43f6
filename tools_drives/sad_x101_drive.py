"""Chip drive: joint SAD step for headline row 2 — R-101 student
distilled from an X-101-64x4d teacher at scale 500.

The flagship bench measures headline row 1 (R-50 <- R-101,
/root/reference/README.md:9). This measures the OTHER published SAD
configuration (README.md:10: R-101 student 34.4 -> 36.8 distilled from
X-101 36.6), whose joint step carries the grouped-conv trunk as the
frozen teacher forward — the workload the round-4 lane-packing default
(ops/grouped_conv.py, BENCH_NOTES grouped-conv section) was built for.

Configs: configs/focal_distillation/retinanet_R-101-FPN_distillation.yaml
(student, SCALES 500 / MAX_SIZE 833) +
retinanet_X-101-64x4d-FPN_1x_teacher.yaml; the reference forces teacher
scales equal to the student's (lib/roi_data/minibatch.py:74-82), which
load_cfg-with-overrides reproduces here.

Baseline: the reference publishes no distillation step time; as with
bench.py we use the plain R-101 RetinaNet MODEL_ZOO rate (16 imgs /
0.666 s on 8x P100 = 3.003 imgs/s/GPU, MODEL_ZOO.md:921-929) — the
joint step is strictly heavier (adds a frozen X-101 forward), so beating
that per-chip is beating the reference.

Methodology = bench.py (u8 canvas, evolving-state timing, windowed
warmup, finite-loss asserts). Run:
  PYTHONPATH=/root/repo python tools_drives/sad_x101_drive.py [--groups N] [KEY VALUE ...]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from sad_tpu.config import load_cfg
    from sad_tpu.data.minibatch import canvas_shapes
    from sad_tpu.models import create_model
    from sad_tpu.models.model_builder import init_model_params
    from sad_tpu.train import TrainState, init_momentum_state, make_train_step

    argv = sys.argv[1:]
    n_groups = 8
    if "--groups" in argv:
        i = argv.index("--groups")
        n_groups = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]

    common = ["NUM_GPUS", "8", "TRAIN.WEIGHTS", "", "COMPUTE_DTYPE",
              "bfloat16", "PIXEL_STD", "(57.375,57.12,58.395)"]
    student_cfg = load_cfg(
        "/root/reference/detectron/configs/focal_distillation/"
        "retinanet_R-101-FPN_distillation.yaml",
        common + argv,
    )
    teacher_cfg = load_cfg(
        "/root/reference/detectron/configs/focal_distillation/"
        "retinanet_X-101-64x4d-FPN_1x_teacher.yaml",
        # teacher scales forced equal to the student's (minibatch.py:74-82)
        common + ["TRAIN.SCALES", "(500,)", "TRAIN.MAX_SIZE", "833"] + argv,
    )

    (h, w), _ = canvas_shapes(student_cfg)
    n_images = student_cfg.TRAIN.IMS_PER_BATCH * n_groups
    print(f"canvas: {(h, w)} groups: {n_groups} imgs: {n_images}",
          flush=True)

    student = create_model(student_cfg)
    teacher = create_model(teacher_cfg)
    sp = init_model_params(student, jax.random.PRNGKey(0), (1, 256, 256, 3))
    tp = init_model_params(teacher, jax.random.PRNGKey(1), (1, 256, 256, 3))

    rng = np.random.RandomState(0)
    a = student_cfg.num_anchors_per_cell()
    batch = {
        "data_u8": jnp.asarray(
            rng.randint(90, 150, (n_images, h, w, 3)).astype(np.uint8)),
        "content_hw": jnp.asarray(
            np.tile(np.float32([500.0, 833.0]), (n_images, 1))),
        "labels": {},
        "bbox_targets": {},
        "fg_mask": {},
        "fg_num": jnp.asarray([24.0] * n_groups, jnp.float32),
    }
    for lvl in student_cfg.fpn_levels():
        s = 2 ** lvl
        hl, wl = h // s, w // s
        batch["labels"][lvl] = jnp.asarray(
            rng.randint(-1, 81, (n_images, hl, wl, a)), jnp.int32
        )
        batch["bbox_targets"][lvl] = jnp.asarray(
            rng.randn(n_images, hl, wl, a, 4), jnp.float32
        )
        batch["fg_mask"][lvl] = jnp.asarray(
            rng.uniform(size=(n_images, hl, wl, a)) < 0.002
        )

    step = jax.jit(
        make_train_step(student_cfg, student, teacher, n_groups=n_groups,
                        teacher_cfg=teacher_cfg),
        donate_argnums=(0,),
    )
    state = TrainState(sp, init_momentum_state(sp).velocity)
    lr = jnp.float32(1e-6)  # see bench.py: finite evolving state, no NaN
                            # fixed point the tunnel could memoize

    t0 = time.perf_counter()
    state, metrics = step(state, tp, batch, lr)
    jax.block_until_ready(metrics["loss"])
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", flush=True)
    assert np.isfinite(float(metrics["loss"])), "step produced NaN"

    prev = None
    for _ in range(8):
        t0 = time.perf_counter()
        for _ in range(5):
            state, metrics = step(state, tp, batch, lr)
        jax.block_until_ready(metrics["loss"])
        cur = (time.perf_counter() - t0) / 5
        if prev is not None and abs(cur - prev) / cur < 0.03:
            break
        prev = cur

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, tp, batch, lr)
    jax.block_until_ready(metrics["loss"])
    dt = time.perf_counter() - t0
    assert np.isfinite(float(metrics["loss"])), "step produced NaN"

    imgs_per_sec = n_images * iters / dt
    baseline = 16 / 0.666 / 8  # plain R-101 per-GPU imgs/s, MODEL_ZOO
    payload = {
        "metric": "joint_distill_x101_imgs_per_sec_per_chip",
        "value": round(imgs_per_sec, 3),
        "unit": f"imgs/s/chip (R101<-X101 SAD step, {h}x{w}, "
                f"bs{n_images})",
        "ms_per_step": round(dt / iters * 1e3, 1),
        "vs_baseline": round(imgs_per_sec / baseline, 3),
    }
    print(json.dumps(payload), flush=True)
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from driveutil import record_result
    record_result(f"sad_x101_joint_step_bs{n_images}", payload)


if __name__ == "__main__":
    main()
