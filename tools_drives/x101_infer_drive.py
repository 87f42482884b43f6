"""Chip drive: X-101-64x4d teacher inference throughput at scale 500.

Pseudo-label generation over COCO unlabeled2017 is the semi-supervised
workhorse of headline row 2 (R-101 <- X-101, /root/reference/README.md:10):
the reference runs test_net.py with the X-101 teacher config over 123k
unlabeled images (SURVEY §3.4; lib/core/test_retinanet.py:97-101 dumps the
raw outputs). Its MODEL_ZOO X-101 inference rate is 0.341 s/im on a P100
(MODEL_ZOO.md:953-961, scale-800 1x; our geometry is the SMALLER teacher
scale 500 / canvas 512x896, so the comparison is favorable-but-labeled).

Measures make_inference_fn (forward + decode + class-wise NMS) for the
X-101 teacher yaml, TEST.EXACT_TOPK exact AND approx (the proven
fast-profile knob), bs8. The grouped trunk rides the lane-packed
block-diagonal phrasing (ops/grouped_conv.py auto default) — the first
inference-path measurement of that default.

Run: PYTHONPATH="/root/repo:$PYTHONPATH" python tools_drives/x101_infer_drive.py
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from sad_tpu.config import load_cfg
    from sad_tpu.data.minibatch import canvas_shapes
    from sad_tpu.eval.inference import make_inference_fn
    from sad_tpu.models import create_model
    from sad_tpu.models.model_builder import init_model_params

    bs, iters = 8, 20
    results = {}
    for exact in (True, False):
        cfg = load_cfg(
            "/root/reference/detectron/configs/focal_distillation/"
            "retinanet_X-101-64x4d-FPN_1x_teacher.yaml",
            ["NUM_GPUS", "1", "TRAIN.WEIGHTS", "", "COMPUTE_DTYPE",
             "bfloat16", "TEST.EXACT_TOPK", str(exact)],
        )
        (h, w), _ = canvas_shapes(cfg)  # landscape canvas at scale 500
        model = create_model(cfg)
        params = init_model_params(
            model, jax.random.PRNGKey(0), (1, 256, 256, 3)
        )
        infer = make_inference_fn(cfg, model)
        rng = np.random.RandomState(0)
        images0 = jnp.asarray(rng.randn(bs, h, w, 3), jnp.float32)
        im_hw = jnp.asarray(np.tile(np.float32([500.0, 833.0]), (bs, 1)))
        im_scale = jnp.asarray(np.full((bs,), 1.0, np.float32))

        # params MUST be a jit argument (round-4 postmortem: closure-
        # capturing them baked the ~90M-param pytree into the HLO as
        # constants and the serialized remote-compile request tripped the
        # tunnel's body limit, HTTP 413 — results/x101_infer_r4_failure).
        @jax.jit
        def run(p, images):
            def body(carry, _):
                out = infer(p, carry, im_hw, im_scale)
                shift = jnp.sum(out["scores"]) * 1e-9 + 1.0000001
                return carry * shift, ()

            final, _ = jax.lax.scan(body, images, None, length=iters)
            return final

        t0 = time.perf_counter()
        jax.block_until_ready(run(params, images0))  # compile + warm
        print(f"exact={exact} canvas={(h, w)} compile+first: "
              f"{time.perf_counter() - t0:.1f}s", flush=True)
        jax.block_until_ready(run(params, images0))
        t0 = time.perf_counter()
        jax.block_until_ready(run(params, images0))
        dt = time.perf_counter() - t0
        tag = "exact" if exact else "approx"
        results[tag] = {
            "imgs_per_s": round(bs * iters / dt, 2),
            "ms_per_im": round(dt / iters / bs * 1e3, 3),
        }
        print(f"TEST.EXACT_TOPK={exact}:", results[tag], flush=True)

    results["speedup"] = round(
        results["approx"]["imgs_per_s"] / results["exact"]["imgs_per_s"], 3
    )
    payload = {
        "metric": "x101_teacher_inference_scale500",
        "vs_baseline_exact": round(
            results["exact"]["imgs_per_s"] / (1 / 0.341), 2),
        **results,
    }
    print(json.dumps(payload))
    import sys
    sys.path.insert(0, "/root/repo/tools_drives")
    from driveutil import record_result
    record_result("x101_teacher_inference", payload)


if __name__ == "__main__":
    main()
