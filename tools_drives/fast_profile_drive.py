"""Chip drive: the opt-in "fast profile" — both approx-top-k knobs ON.

Both knobs were individually proven AP-neutral on chip (BENCH_NOTES:
decode stress drive -1.7e-8, RPN parity drive -2.3e-4) but default OFF
(reference parity) and were never measured together. This drive times the
headline RetinaNet inference path (make_inference_fn: forward + decode +
class-wise NMS, bs8 640x1024, the BENCH_NOTES inference geometry) with
TEST.EXACT_TOPK True vs False — the RPN.EXACT_TOPK half of the profile is
measured by rcnn_step_drive with the override pair ("RPN.EXACT_TOPK",
"False") in the round-4 queue script.

Timing: evolving-state lax.scan (images rotate each iteration) so the
axon serving stack cannot memoize dispatches (BENCH_NOTES rule).

Run: PYTHONPATH="/root/repo:$PYTHONPATH" python tools_drives/fast_profile_drive.py
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from sad_tpu.config import load_cfg
    from sad_tpu.eval.inference import make_inference_fn
    from sad_tpu.models import create_model
    from sad_tpu.models.model_builder import init_model_params

    h, w, bs, iters = 640, 1024, 8, 20
    results = {}
    for exact in (True, False):
        cfg = load_cfg(
            "/root/reference/detectron/configs/focal_distillation/"
            "retinanet_R-50-FPN_distillation.yaml",
            ["NUM_GPUS", "1", "TRAIN.WEIGHTS", "", "COMPUTE_DTYPE",
             "bfloat16", "TEST.EXACT_TOPK", str(exact)],
        )
        model = create_model(cfg)
        params = init_model_params(
            model, jax.random.PRNGKey(0), (1, h, w, 3)
        )
        infer = make_inference_fn(cfg, model)
        rng = np.random.RandomState(0)
        images0 = jnp.asarray(rng.randn(bs, h, w, 3), jnp.float32)
        im_hw = jnp.asarray(np.tile(np.float32([600.0, 1000.0]), (bs, 1)))
        im_scale = jnp.asarray(np.full((bs,), 1.6667, np.float32))

        @jax.jit
        def run(images):
            def body(carry, _):
                out = infer(params, carry, im_hw, im_scale)
                # rotate the input from the output so every iteration is a
                # fresh dispatch (evolving-state rule)
                shift = jnp.sum(out["scores"]) * 1e-9 + 1.0000001
                return carry * shift, ()

            final, _ = jax.lax.scan(body, images, None, length=iters)
            return final

        jax.block_until_ready(run(images0))  # compile + warm
        jax.block_until_ready(run(images0))
        t0 = time.perf_counter()
        jax.block_until_ready(run(images0))
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
    print(json.dumps({"metric": "fast_profile_inference", **results}))


if __name__ == "__main__":
    main()
