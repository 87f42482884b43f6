"""Chip drive: FOLD_AFFINE lever measurement (VERDICT r4 item 4).

The round-4 stage decomposition found the trunk bandwidth-bound
(BENCH_NOTES.md:836-875); folding each frozen AffineChannel scale into the
preceding conv's weights (y = conv(x, W*s) + b) removes a per-channel
multiply over every trunk activation — the live-forward analogue of the
reference converter's BN fold (tools/pickle_caffe_blobs.py:148-170).
Whether XLA was already fusing that multiply for free is exactly what this
drive answers; a recorded negative is an acceptable outcome.

Measures, fold off vs on (same params, same batches, evolving-state
timing):
  1. the flagship joint SAD train step (R-50 <- R-101, bs32, 640x1024,
     shipped u8-canvas path) — teacher forward + student train;
  2. X-101-64x4d teacher inference at scale 500, exact top-k, bs8 —
     the pure-inference trunk-heavy path.

Run: PYTHONPATH="/root/repo:$PYTHONPATH" python tools_drives/affine_fold_drive.py
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo/tools_drives")
from bench_variants_drive import build, time_step  # noqa: E402
from driveutil import record_result  # noqa: E402


def flagship(fold: bool):
    import jax
    import jax.numpy as jnp

    from sad_tpu.train import TrainState, init_momentum_state, make_train_step

    extra = ("FOLD_AFFINE", "True") if fold else ()
    (scfg, tcfg, student, teacher, sp, tp, base, u8,
     n_images, n_groups) = build(extra=extra)
    batch = dict(base)
    batch["data_u8"] = jnp.asarray(u8)
    batch["content_hw"] = jnp.asarray(
        np.tile(np.float32([600.0, 1000.0]), (n_images, 1)))
    step = jax.jit(
        make_train_step(scfg, student, teacher, n_groups=n_groups,
                        teacher_cfg=tcfg),
        donate_argnums=(0,),
    )
    state = TrainState(sp, init_momentum_state(sp).velocity)
    imgs_per_s, ms = time_step(
        step, state, tp, batch, jnp.float32(1e-6), n_images)
    return {"imgs_per_s": round(imgs_per_s, 2), "ms_per_step": round(ms, 1)}


def x101_inference(fold: bool):
    import jax
    import jax.numpy as jnp

    from sad_tpu.config import load_cfg
    from sad_tpu.data.minibatch import canvas_shapes
    from sad_tpu.eval.inference import make_inference_fn
    from sad_tpu.models import create_model
    from sad_tpu.models.model_builder import init_model_params

    bs, iters = 8, 20
    cfg = load_cfg(
        "/root/reference/detectron/configs/focal_distillation/"
        "retinanet_X-101-64x4d-FPN_1x_teacher.yaml",
        ["NUM_GPUS", "1", "TRAIN.WEIGHTS", "", "COMPUTE_DTYPE", "bfloat16",
         "TEST.EXACT_TOPK", "True", "FOLD_AFFINE", str(fold)],
    )
    (h, w), _ = canvas_shapes(cfg)
    model = create_model(cfg)
    params = init_model_params(model, jax.random.PRNGKey(0), (1, 256, 256, 3))
    infer = make_inference_fn(cfg, model)
    rng = np.random.RandomState(0)
    images0 = jnp.asarray(rng.randn(bs, h, w, 3), jnp.float32)
    im_hw = jnp.asarray(np.tile(np.float32([500.0, 833.0]), (bs, 1)))
    im_scale = jnp.asarray(np.full((bs,), 1.0, np.float32))

    @jax.jit
    def run(p, images):  # params as jit args (x101_infer_r4_failure lesson)
        def body(carry, _):
            out = infer(p, carry, im_hw, im_scale)
            shift = jnp.sum(out["scores"]) * 1e-9 + 1.0000001
            return carry * shift, ()

        final, _ = jax.lax.scan(body, images, None, length=iters)
        return final

    jax.block_until_ready(run(params, images0))
    jax.block_until_ready(run(params, images0))
    t0 = time.perf_counter()
    jax.block_until_ready(run(params, images0))
    dt = time.perf_counter() - t0
    return {"imgs_per_s": round(bs * iters / dt, 2),
            "ms_per_im": round(dt / iters / bs * 1e3, 3)}


def main():
    payload = {"metric": "fold_affine_lever"}
    for fold in (False, True):
        r = flagship(fold)
        payload[f"flagship_fold_{'on' if fold else 'off'}"] = r
        print(f"flagship fold={fold}: {r}", flush=True)
    for fold in (False, True):
        r = x101_inference(fold)
        payload[f"x101_infer_fold_{'on' if fold else 'off'}"] = r
        print(f"x101 inference fold={fold}: {r}", flush=True)
    payload["flagship_speedup"] = round(
        payload["flagship_fold_on"]["imgs_per_s"]
        / payload["flagship_fold_off"]["imgs_per_s"], 4)
    payload["x101_infer_speedup"] = round(
        payload["x101_infer_fold_on"]["imgs_per_s"]
        / payload["x101_infer_fold_off"]["imgs_per_s"], 4)
    print(json.dumps(payload))
    record_result("affine_fold_lever", payload)


if __name__ == "__main__":
    main()
