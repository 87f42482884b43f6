"""Chip drive: serving-path throughput — exported StableHLO vs live jit.

Times end-to-end RetinaNet R-50 inference (forward + decode + class-wise
NMS, bs8, the BENCH_NOTES inference geometry) two ways on the real chip:
  1. live `jax.jit` of make_inference_fn (the test_engine path)
  2. the serialized `jax.export` artifact reloaded via load_exported —
     what a production serving binary would execute (no model Python).

Run: PYTHONPATH="/root/repo:$PYTHONPATH" python tools_drives/serving_bench_drive.py
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from sad_tpu.config import load_cfg
    from sad_tpu.eval.export import export_retinanet_inference, load_exported
    from sad_tpu.eval.inference import make_inference_fn
    from sad_tpu.models import create_model
    from sad_tpu.models.model_builder import init_model_params

    cfg = load_cfg(
        "/root/reference/detectron/configs/focal_distillation/"
        "retinanet_R-50-FPN_distillation.yaml",
        ["NUM_GPUS", "1", "TRAIN.WEIGHTS", "", "COMPUTE_DTYPE", "bfloat16"],
    )
    h, w = 640, 1024
    bs = 8
    model = create_model(cfg)
    params = init_model_params(model, jax.random.PRNGKey(0), (1, h, w, 3))

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(bs, h, w, 3), jnp.float32)
    im_hw = jnp.asarray(np.tile(np.float32([600.0, 1000.0]), (bs, 1)))
    im_scale = jnp.asarray(np.full((bs,), 1.6667, np.float32))

    def time_fn(fn, tag, iters=20):
        out = fn(images, im_hw, im_scale)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(images, im_hw, im_scale)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        r = {"imgs_per_s": round(bs * iters / dt, 2),
             "ms_per_im": round(dt / iters / bs * 1e3, 3)}
        print(tag, r, flush=True)
        return r

    infer = make_inference_fn(cfg, model)
    live = jax.jit(lambda im, hw, sc: infer(params, im, hw, sc))

    # evolving inputs: add a tiny per-iter offset on device so the
    # serving-stack can't replay a memoized (executable, input) pair
    off = [jnp.float32(0.0)]

    def live_call(im, hw, sc):
        off[0] = off[0] + jnp.float32(1e-6)
        return live(im + off[0], hw, sc)

    r_live = time_fn(live_call, "live-jit")

    path = "/tmp/sad_serving_export.bin"
    export_retinanet_inference(cfg, model, params, bs, (h, w), path)
    serve = load_exported(path)
    served = jax.jit(serve)

    off[0] = jnp.float32(0.0)

    def served_call(im, hw, sc):
        off[0] = off[0] + jnp.float32(1e-6)
        return served(im + off[0], hw, sc)

    r_exp = time_fn(served_call, "exported")

    import os

    print(json.dumps({
        "live_jit": r_live,
        "exported_artifact": r_exp,
        "artifact_mb": round(os.path.getsize(path) / 1e6, 1),
    }))


if __name__ == "__main__":
    main()
