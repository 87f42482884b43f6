"""Chip drive: Faster/Mask R-CNN end-to-end inference throughput.

First serving-path measurement of the R-CNN families (the serving bench
covers RetinaNet only) and of the round-5 per-image-blocked RoIAlign on
the eval path (eval batches are image-major with DETECTIONS_PER_IM /
POST_NMS_TOP_N slots; blocking engages at bs >= 4).

Measures make_rcnn_inference_fn (backbone + RPN + box head + decode +
class-wise NMS, plus the mask head on kept boxes for the mask config) at
the reference TEST geometry (scale 800, max 1333), bs8, bf16. Baselines:
MODEL_ZOO.md:570-579 e2e_faster_rcnn_R-50-FPN_1x 0.093+0.004 s/im;
:729-739 e2e_mask_rcnn_R-50-FPN_1x 0.099+0.019 s/im (P100, bs1).

Honest-timing notes (BENCH_NOTES methodology): inputs evolve every call
(no replay memoization), finite outputs asserted.

Run: PYTHONPATH="/root/repo:$PYTHONPATH" python tools_drives/rcnn_infer_drive.py
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo/tools_drives")
from driveutil import record_result  # noqa: E402


def measure(kind: str):
    import jax
    import jax.numpy as jnp

    from sad_tpu.config import load_cfg
    from sad_tpu.data.minibatch import canvas_shapes
    from sad_tpu.eval.rcnn_inference import make_rcnn_inference_fn
    from sad_tpu.models import create_model
    from sad_tpu.models.model_builder import init_model_params

    import os

    bs = int(os.environ.get("INFER_BS", "8"))
    iters = 20
    yaml = (
        "e2e_keypoint_rcnn_R-50-FPN_1x.yaml" if kind == "keypoint"
        else "e2e_mask_rcnn_R-50-FPN_1x.yaml"
    )
    cfg = load_cfg(
        f"/root/reference/detectron/configs/12_2017_baselines/{yaml}",
        ["NUM_GPUS", "1", "TRAIN.WEIGHTS", "", "COMPUTE_DTYPE", "bfloat16",
         "PIXEL_STD", "(57.375,57.12,58.395)"]
        + (["MODEL.MASK_ON", "False"] if kind == "faster" else [])
        + [a for a in sys.argv[1:] if not a.startswith("--")],
    )
    (h, w), _ = canvas_shapes(cfg)
    model = create_model(cfg)
    params = init_model_params(model, jax.random.PRNGKey(0), (1, 256, 256, 3))
    infer = make_rcnn_inference_fn(cfg, model)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(bs, h, w, 3), jnp.float32)
    im_hw = jnp.asarray(np.tile(np.float32([800.0, 1202.0]), (bs, 1)))
    im_scale = jnp.asarray(np.full((bs,), 1.0, np.float32))

    def run_once(imgs):
        out = infer(params, imgs, im_hw, im_scale)
        shift = jnp.sum(out["scores"]) * 1e-9 + 1.0000001
        return imgs * shift, out

    t0 = time.perf_counter()
    images, out = run_once(images)
    jax.block_until_ready(out["scores"])
    print(f"kind={kind} canvas={(h, w)} compile+first: "
          f"{time.perf_counter() - t0:.1f}s", flush=True)
    assert bool(jnp.isfinite(out["scores"]).all())
    images, out = run_once(images)
    jax.block_until_ready(out["scores"])
    t0 = time.perf_counter()
    for _ in range(iters):
        images, out = run_once(images)
    jax.block_until_ready(out["scores"])
    dt = time.perf_counter() - t0
    assert bool(jnp.isfinite(out["scores"]).all())
    return {"imgs_per_s": round(bs * iters / dt, 2),
            "ms_per_im": round(dt / iters / bs * 1e3, 3)}


def main():
    import os

    bs = os.environ.get("INFER_BS", "8")
    payload = {"metric": f"rcnn_inference_scale800_bs{bs}"}
    overrides = [a for a in sys.argv[1:] if not a.startswith("--")]
    if overrides:
        payload["overrides"] = overrides
    base = {"faster": 0.093 + 0.004, "mask": 0.099 + 0.019,
            "keypoint": 0.097 + 0.092}
    for tag in ("faster", "mask", "keypoint"):
        r = measure(tag)
        r["vs_baseline"] = round(r["imgs_per_s"] * base[tag], 2)
        payload[tag] = r
        print(tag, json.dumps(r), flush=True)
    payload["baseline_note"] = (
        "P100 bs1 infer s/im: faster 0.093+0.004 (MODEL_ZOO.md:570-579), "
        "mask 0.099+0.019 (:729-739), keypoint 0.097+0.092 (:1389-1404)"
    )
    print(json.dumps(payload))
    record_result("rcnn_inference" + os.environ.get("RESULT_SUFFIX", ""),
                  payload)


if __name__ == "__main__":
    main()
