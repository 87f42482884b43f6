"""TPU drive: end-to-end learning proof for the lane-packed grouped conv.

The phrasing equivalence is pinned on CPU (values+grads,
tests/test_grouped_conv.py) and the micro sweep picked lane as the TPU
default (BENCH_NOTES round-4 grouped-conv section). This drive proves the
default ON REAL HARDWARE end-to-end:

1. Overfit a mini ResNeXt RetinaNet (NUM_GROUPS=8, WIDTH_PER_GROUP=4 —
   cg 4..32 across stages, exactly the X-101 regime) on the synthetic
   red-box set through train_model with the auto (lane) phrasing.
   Expect AP > 0.5 like the R-50 proof (BENCH_NOTES round-1).
2. Evaluate the SAME checkpoint with the phrasing forced to fgc and to
   lane: the APs must agree (trace-time swap under unchanged weights —
   the checkpoint-compat contract of ops/grouped_conv.py).

Run on the real TPU: PYTHONPATH="/root/repo:$PYTHONPATH" \
    python tools_drives/gconv_learning_drive.py
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(__file__))
from sad_revalidation_drive import base_cfg, make_dataset  # noqa: E402


def main():
    import jax

    from sad_tpu.config import Config, register_dataset
    from sad_tpu.config.config import merge_cfg_from_dict
    from sad_tpu.eval.test_engine import test_net_on_dataset
    from sad_tpu.models import create_model
    from sad_tpu.ops import grouped_conv as gc
    from sad_tpu.train.train_loop import train_model

    root = tempfile.mkdtemp(prefix="gconv_learn_")
    img_dir, ann = make_dataset(root)
    register_dataset("sad_revalid", img_dir, ann, allow_override=True)

    d = base_cfg(root, "gconv")
    d["RESNETS"] = {"NUM_GROUPS": 8, "WIDTH_PER_GROUP": 4,
                    "CHANNEL_RATIO": 1.0}
    cfg = merge_cfg_from_dict(Config(), d)

    pack_res2 = gc.resolve_pack(gc.GROUPED_CONV_IMPL, 8, 4)
    print(f"backend={jax.default_backend()} impl={gc.GROUPED_CONV_IMPL} "
          f"pack(res2 g8 cg4)={pack_res2}", flush=True)

    t0 = time.perf_counter()
    state = train_model(cfg)
    print(f"train: {time.perf_counter() - t0:.0f}s", flush=True)

    aps = {}
    for impl in ("lane", "fgc"):
        old = gc.GROUPED_CONV_IMPL
        try:
            gc.GROUPED_CONV_IMPL = impl
            r = test_net_on_dataset(
                cfg, create_model(cfg), state.params,
                output_dir=os.path.join(root, f"test_{impl}"),
            )
        finally:
            gc.GROUPED_CONV_IMPL = old
        aps[impl] = float(r["AP"])
        print(f"eval[{impl}]: AP={r['AP']:.4f} AP50={r['AP50']:.4f}",
              flush=True)

    print(json.dumps({
        "metric": "gconv_learning_proof",
        "trained_impl": "auto(lane on TPU)",
        "AP_lane": round(aps["lane"], 4),
        "AP_fgc": round(aps["fgc"], 4),
        "delta": round(aps["lane"] - aps["fgc"], 6),
    }))
    assert aps["lane"] > 0.5, "grouped-conv trunk failed to learn"
    assert abs(aps["lane"] - aps["fgc"]) < 0.01, (
        "phrasing swap changed eval AP — checkpoint-compat contract broken"
    )
    print("DRIVE OK")


if __name__ == "__main__":
    sys.exit(main())
