"""Chip drive: joint SAD step throughput across input-path variants.

Variants (all bs32, 640x1024, honest evolving-state timing per
BENCH_NOTES.md methodology — finite-loss asserts, LR 1e-6):
  A. f32 host-normalized 'data' + 'teacher_data' (the round-1/2 bench path)
  B. shared uint8 canvas 'data_u8' + on-device dual normalization — the
     path the training loader actually ships since round 2
  C. B + teacher params stored bfloat16 (frozen weights never see the
     optimizer; storing them bf16 halves their HBM reads each step)

Run with the default axon env: PYTHONPATH="/root/repo:$PYTHONPATH" \
    python tools_drives/bench_variants_drive.py
"""

from __future__ import annotations

import json
import time

import numpy as np


def build(n_groups=16, h=640, w=1024, extra=()):
    import jax
    import jax.numpy as jnp

    from sad_tpu.config import load_cfg
    from sad_tpu.models import create_model
    from sad_tpu.models.model_builder import init_model_params

    student_cfg = load_cfg(
        "/root/reference/detectron/configs/focal_distillation/"
        "retinanet_R-50-FPN_distillation.yaml",
        ["NUM_GPUS", "8", "TRAIN.WEIGHTS", "", "COMPUTE_DTYPE", "bfloat16",
         # random-init nets diverge on std~60 inputs (verify-skill gotcha);
         # unit-scale normalization keeps the timing loop finite
         "PIXEL_STD", "(57.375,57.12,58.395)"] + list(extra),
    )
    teacher_cfg = load_cfg(
        "/root/reference/detectron/configs/focal_distillation/"
        "retinanet_R-101-FPN_1x_teacher.yaml",
        ["NUM_GPUS", "8", "TRAIN.WEIGHTS", "", "COMPUTE_DTYPE", "bfloat16",
         # random-init nets diverge on std~60 inputs (verify-skill gotcha);
         # unit-scale normalization keeps the timing loop finite
         "PIXEL_STD", "(57.375,57.12,58.395)"] + list(extra),
    )
    n_images = student_cfg.TRAIN.IMS_PER_BATCH * n_groups
    student = create_model(student_cfg)
    teacher = create_model(teacher_cfg)
    sp = init_model_params(student, jax.random.PRNGKey(0), (1, h, w, 3))
    tp = init_model_params(teacher, jax.random.PRNGKey(1), (1, h, w, 3))

    rng = np.random.RandomState(0)
    a = student_cfg.num_anchors_per_cell()
    base = {
        "labels": {},
        "bbox_targets": {},
        "fg_mask": {},
        "fg_num": jnp.asarray([24.0] * n_groups, jnp.float32),
    }
    for lvl in student_cfg.fpn_levels():
        s = 2 ** lvl
        hl, wl = h // s, w // s
        base["labels"][lvl] = jnp.asarray(
            rng.randint(-1, 81, (n_images, hl, wl, a)), jnp.int32
        )
        base["bbox_targets"][lvl] = jnp.asarray(
            rng.randn(n_images, hl, wl, a, 4), jnp.float32
        )
        base["fg_mask"][lvl] = jnp.asarray(
            rng.uniform(size=(n_images, hl, wl, a)) < 0.002
        )
    # pixel values near the means: the normalized inputs stay unit-scale
    u8 = rng.randint(90, 150, (n_images, h, w, 3)).astype(np.uint8)
    return (
        student_cfg, teacher_cfg, student, teacher, sp, tp, base, u8,
        n_images, n_groups,
    )


def time_step(step, state, tp, batch, lr, n_images, iters=10):
    import jax

    state, metrics = step(state, tp, batch, lr)
    jax.block_until_ready(metrics["loss"])
    assert np.isfinite(float(metrics["loss"])), "NaN in warmup"
    state, metrics = step(state, tp, batch, lr)
    jax.block_until_ready(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, tp, batch, lr)
    jax.block_until_ready(metrics["loss"])
    dt = time.perf_counter() - t0
    assert np.isfinite(float(metrics["loss"])), "NaN in timed loop"
    return n_images * iters / dt, dt / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from sad_tpu.train import TrainState, init_momentum_state, make_train_step

    (scfg, tcfg, student, teacher, sp, tp, base, u8,
     n_images, n_groups) = build()
    lr = jnp.float32(1e-6)
    results = {}

    # the step donates its TrainState — keep a host copy so each variant
    # starts from identical, undeleted params
    sp_host = jax.tree.map(np.asarray, sp)
    del sp

    def fresh_state():
        p = jax.tree.map(jnp.asarray, sp_host)
        return TrainState(p, init_momentum_state(p).velocity)

    import sys

    step = jax.jit(
        make_train_step(scfg, student, teacher, n_groups=n_groups,
                        teacher_cfg=tcfg),
        donate_argnums=(0,),
    )

    if "--skip-a" not in sys.argv:
        # A: f32 dual-stream
        rng = np.random.RandomState(1)
        batch_a = dict(base)
        batch_a["data"] = jnp.asarray(
            rng.randn(n_images, 640, 1024, 3), jnp.float32)
        batch_a["teacher_data"] = jnp.asarray(
            rng.randn(n_images, 640, 1024, 3), jnp.float32)
        results["A_f32_dual"] = time_step(
            step, fresh_state(), tp, batch_a, lr, n_images)
        print("A (f32 dual-stream):", results["A_f32_dual"], flush=True)
        del batch_a

    # B: shared u8 canvas, on-device normalization (the shipped path)
    batch_b = dict(base)
    batch_b["data_u8"] = jnp.asarray(u8)
    batch_b["content_hw"] = jnp.asarray(
        np.tile(np.float32([600.0, 1000.0]), (n_images, 1)))
    results["B_u8_shared"] = time_step(
        step, fresh_state(), tp, batch_b, lr, n_images)
    print("B (u8 shared canvas):", results["B_u8_shared"], flush=True)

    # C: B + bf16-stored teacher params
    tp16 = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, tp)
    results["C_u8_bf16_teacher"] = time_step(
        step, fresh_state(), tp16, batch_b, lr, n_images)
    print("C (u8 + bf16 teacher):", results["C_u8_bf16_teacher"], flush=True)

    print(json.dumps({k: {"imgs_per_s": round(v[0], 2),
                          "ms_per_step": round(v[1], 1)}
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
