"""End-to-end CLI gate: train_net trains -> checkpoints -> evals -> asserts
EXPECTED_RESULTS, and test_net enforces the same gate on saved weights.

This is the CI analogue of the reference's post-training quality assertion
(lib/core/config.py:966-973 EXPECTED_RESULTS + task_evaluation
check_expected_results): a regression anywhere in the loader -> train step ->
checkpoint -> inference -> COCO-eval loop fails loudly.

Runs the real CLIs on the virtual CPU mesh with a width-shrunk R-50
(RESNETS.CHANNEL_RATIO) at a 64x128 canvas to keep the compile tractable on
one core.
"""

import json
import os

import numpy as np
import pytest
import yaml
from PIL import Image

from sad_tpu.config import register_dataset
from sad_tpu.eval.task_evaluation import ExpectedResultsError

pytestmark = pytest.mark.e2e  # heavyweight: excluded from the default run (pytest.ini)

DATASET = "cli_gate_synth"


@pytest.fixture(scope="module")
def gate_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_gate")
    img_dir = root / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    images, anns = [], []
    for i in range(1, 5):
        w, h = 96, 64
        arr = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
        arr[10:30, 8:40] = (220, 30, 30)  # one red box
        Image.fromarray(arr).save(img_dir / f"{i:06d}.jpg")
        images.append(
            {"id": i, "file_name": f"{i:06d}.jpg", "height": h, "width": w}
        )
        anns.append(
            {"id": i, "image_id": i, "category_id": 1, "bbox": [8, 10, 32, 20],
             "area": 640, "iscrowd": 0}
        )
    ann_file = root / "instances.json"
    with open(ann_file, "w") as f:
        json.dump(
            {"images": images, "annotations": anns,
             "categories": [{"id": 1, "name": "red"}]}, f,
        )
    register_dataset(DATASET, str(img_dir), str(ann_file), allow_override=True)

    out_dir = str(root / "out")
    cfg = {
        "MODEL": {"TYPE": "retinanet", "NUM_CLASSES": 2,
                  "CONV_BODY": "FPN.add_fpn_ResNet50_conv5_body"},
        "NUM_GPUS": 1,
        "FPN": {"FPN_ON": True, "RPN_MIN_LEVEL": 3, "RPN_MAX_LEVEL": 7,
                "EXTRA_CONV_LEVELS": True, "COARSEST_STRIDE": 128},
        "RETINANET": {"RETINANET_ON": True, "ASPECT_RATIOS": (1.0,),
                      "SCALES_PER_OCTAVE": 1},
        "RESNETS": {"CHANNEL_RATIO": 0.125},
        "TRAIN": {"SCALES": (64,), "MAX_SIZE": 128, "IMS_PER_BATCH": 2,
                  "DATASETS": (DATASET,), "SNAPSHOT_ITERS": 20000,
                  "WEIGHTS": ""},
        "TEST": {"SCALES": (64,), "MAX_SIZE": 128, "DATASETS": (DATASET,),
                 "NMS": 0.5},
        "SOLVER": {"BASE_LR": 1e-9, "MAX_ITER": 2, "WARM_UP_ITERS": 0},
        "COMPUTE_DTYPE": "float32",
        "OUTPUT_DIR": out_dir,
        # random weights detect nothing: AP == 0.0 is the expected result
        "EXPECTED_RESULTS": [[DATASET, "box", "AP", 0.0]],
    }
    cfg_file = root / "gate.yaml"
    with open(cfg_file, "w") as f:
        yaml.safe_dump(cfg, f)
    return {"cfg_file": str(cfg_file), "out_dir": out_dir}


def test_train_eval_gate_passes_and_checkpoints(gate_env):
    from sad_tpu.tools.train_net import main

    main(["--cfg", gate_env["cfg_file"], "--max-iters", "2"])
    train_dir = os.path.join(gate_env["out_dir"], "train", DATASET)
    assert os.path.exists(os.path.join(train_dir, "model_final.pkl"))

    # run artifacts: cfg.yaml + stats.jsonl in the run dir, cfg embedded in
    # the checkpoint (ref: net.py:149-182), dashboard renders the dir
    import pickle

    import yaml as _yaml

    assert os.path.exists(os.path.join(train_dir, "stats.jsonl"))
    with open(os.path.join(train_dir, "cfg.yaml")) as f:
        dumped = _yaml.safe_load(f)
    assert dumped["MODEL"]["TYPE"] == "retinanet"
    with open(os.path.join(train_dir, "model_final.pkl"), "rb") as f:
        ck = pickle.load(f)
    assert _yaml.safe_load(ck["cfg_yaml"])["MODEL"]["TYPE"] == "retinanet"

    from sad_tpu.tools.dashboard import render_report

    report = render_report(train_dir)
    assert "stats.jsonl" in report and "model_final.pkl" in report


def test_test_net_gate_fails_on_regression(gate_env):
    """The same weights cannot reach AP 0.9 — the gate must raise."""
    from sad_tpu.tools.test_net import main

    weights = os.path.join(
        gate_env["out_dir"], "train", DATASET, "model_final.pkl"
    )
    assert os.path.exists(weights)
    with pytest.raises(ExpectedResultsError):
        main([
            "--cfg", gate_env["cfg_file"], "--weights", weights,
            "EXPECTED_RESULTS", f"[['{DATASET}','box','AP',0.9]]",
        ])
