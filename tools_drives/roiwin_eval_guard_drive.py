"""Chip drive: windowed-vs-dense RoIAlign forward — eval AP guard.

The serving paths now auto-select the windowed Pallas RoIAlign forward
(inference= flag, round-5 serving arc). The kernels are value-equivalent
by golden test (tests/test_pallas_roi_align.py, CPU interpret + chip
runs), but this pins the END-TO-END consequence on chip: the SAME
trained checkpoint (the nms_cand_parity drive's 800-iter Faster R-CNN,
reused from its run dir) evaluated through test_net_on_dataset with the
dense forward forced vs the new windowed default. Expect AP deltas at
float-accumulation noise.

Run: PYTHONPATH="/root/repo:$PYTHONPATH" python tools_drives/roiwin_eval_guard_drive.py [root]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo/tools_drives")
from driveutil import record_result  # noqa: E402


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/nms_cand_e264z1ia"
    run_dir = os.path.join(root, "out/train/nmscand_train")
    if not os.path.exists(os.path.join(run_dir, "model_final.pkl")):
        print(f"no checkpoint under {run_dir}; run nms_cand_parity_drive "
              "first", file=sys.stderr)
        return 1

    import jax

    from sad_tpu.config import load_cfg, register_dataset
    from sad_tpu.eval.test_engine import test_net_on_dataset
    from sad_tpu.models import create_model
    from sad_tpu.models.model_builder import init_model_params
    from sad_tpu.ops import pallas_roi_align
    from sad_tpu.train.train_loop import load_reference_or_native

    register_dataset(
        "nmscand_val", os.path.join(root, "images_val"),
        os.path.join(root, "instances_val.json"), allow_override=True,
    )
    cfg = load_cfg(os.path.join(run_dir, "cfg.yaml"), [])
    model = create_model(cfg)
    template = init_model_params(
        model, jax.random.PRNGKey(0), (1, 128, 128, 3)
    )
    params = load_reference_or_native(
        os.path.join(run_dir, "model_final.pkl"), template, cfg
    )

    out = {}
    for tag, mode in (("dense", "dense"), ("windowed_default", None)):
        pallas_roi_align.ROI_ALIGN_MODE = mode
        t0 = time.perf_counter()
        r = test_net_on_dataset(
            cfg, model, params,
            output_dir=os.path.join(root, f"test_guard_{tag}"),
        )
        out[tag] = {
            "AP": float(r["AP"]), "AP50": float(r["AP50"]),
            "AP75": float(r.get("AP75", float("nan"))),
            "eval_wall_s": round(time.perf_counter() - t0, 1),
        }
        print(tag, out[tag], flush=True)
    pallas_roi_align.ROI_ALIGN_MODE = None
    out["ap_delta_windowed_minus_dense"] = round(
        out["windowed_default"]["AP"] - out["dense"]["AP"], 6
    )
    print(json.dumps(out))
    record_result("roiwin_eval_guard", out)
    print("DRIVE OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
