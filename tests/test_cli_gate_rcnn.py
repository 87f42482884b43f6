"""End-to-end CLI gate for the R-CNN family: train_net on MODEL.TYPE
generalized_rcnn (Faster + mask branch) over a synthetic COCO dataset ->
checkpoints -> test_net evals box+segm and enforces EXPECTED_RESULTS.

Complements test_cli_gate.py (retinanet): this drives the *R-CNN* branch of
train/train_loop.py — RCNNMinibatchBuilder inside the real TrainingLoader,
on-device proposal sampling, mask losses — through the actual CLIs on the
virtual CPU mesh, the path the reference exercises via
tools/train_net.py + tools/test_net.py on Mask R-CNN configs.
"""

import json
import os
import pickle

import numpy as np
import pytest
import yaml
from PIL import Image

from sad_tpu.config import register_dataset
from sad_tpu.eval.task_evaluation import ExpectedResultsError

pytestmark = pytest.mark.e2e  # heavyweight: excluded from the default run (pytest.ini)

DATASET = "cli_gate_rcnn_synth"


@pytest.fixture(scope="module")
def gate_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_gate_rcnn")
    img_dir = root / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    images, anns = [], []
    for i in range(1, 5):
        w, h = 96, 64
        arr = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
        arr[10:30, 8:40] = (220, 30, 30)
        Image.fromarray(arr).save(img_dir / f"{i:06d}.jpg")
        images.append(
            {"id": i, "file_name": f"{i:06d}.jpg", "height": h, "width": w}
        )
        anns.append(
            {
                "id": i, "image_id": i, "category_id": 1,
                "bbox": [8, 10, 32, 20], "area": 640, "iscrowd": 0,
                "segmentation": [[8, 10, 40, 10, 40, 30, 8, 30]],
            }
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
        "MODEL": {
            "TYPE": "generalized_rcnn",
            "CONV_BODY": "FPN.add_fpn_ResNet50_conv5_body",
            "NUM_CLASSES": 2,
            "FASTER_RCNN": True,
            "MASK_ON": True,
        },
        "NUM_GPUS": 1,
        "FPN": {
            "FPN_ON": True, "MULTILEVEL_RPN": True, "MULTILEVEL_ROIS": True,
            "RPN_MIN_LEVEL": 2, "RPN_MAX_LEVEL": 6,
            "ROI_MIN_LEVEL": 2, "ROI_MAX_LEVEL": 5,
            "COARSEST_STRIDE": 64,
        },
        "FAST_RCNN": {"MLP_HEAD_DIM": 32, "ROI_XFORM_RESOLUTION": 7},
        "MRCNN": {"DIM_REDUCED": 16},
        "RESNETS": {"CHANNEL_RATIO": 0.125},
        "TRAIN": {
            "SCALES": (64,), "MAX_SIZE": 128, "IMS_PER_BATCH": 2,
            "DATASETS": (DATASET,), "SNAPSHOT_ITERS": 20000, "WEIGHTS": "",
            "RPN_PRE_NMS_TOP_N": 40, "RPN_POST_NMS_TOP_N": 16,
            "BATCH_SIZE_PER_IM": 8,
        },
        "TEST": {
            "SCALES": (64,), "MAX_SIZE": 128, "DATASETS": (DATASET,),
            "NMS": 0.5, "RPN_PRE_NMS_TOP_N": 50, "RPN_POST_NMS_TOP_N": 20,
        },
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


def test_rcnn_train_cli_checkpoints_and_logs_mask_loss(gate_env):
    from sad_tpu.tools.train_net import main

    main(["--cfg", gate_env["cfg_file"], "--max-iters", "2"])
    train_dir = os.path.join(gate_env["out_dir"], "train", DATASET)
    assert os.path.exists(os.path.join(train_dir, "model_final.pkl"))

    # the mask branch actually ran inside the real loop: loss_mask is a
    # logged stat and the checkpoint holds mask-head params
    with open(os.path.join(train_dir, "stats.jsonl")) as f:
        rows = [json.loads(line) for line in f if line.strip()]
    assert rows, "no stats logged"
    keys = set().union(*(r.keys() for r in rows))
    assert any("loss_mask" in k for k in keys), sorted(keys)
    assert any("loss_cls" in k for k in keys)

    with open(os.path.join(train_dir, "model_final.pkl"), "rb") as f:
        ck = pickle.load(f)
    leaf_names = []

    def _walk(d, prefix=""):
        for k, v in d.items():
            if isinstance(v, dict):
                _walk(v, prefix + k + "/")
            else:
                leaf_names.append(prefix + k)

    _walk(ck["params"])
    assert any("mask" in n.lower() for n in leaf_names), leaf_names[:20]


def test_rcnn_test_cli_gate(gate_env):
    from sad_tpu.tools.test_net import main

    weights = os.path.join(
        gate_env["out_dir"], "train", DATASET, "model_final.pkl"
    )
    assert os.path.exists(weights)
    # passes at the honest AP 0.0 expectation (random tiny weights)
    main(["--cfg", gate_env["cfg_file"], "--weights", weights])
    # and the gate must raise on an impossible expectation
    with pytest.raises(ExpectedResultsError):
        main([
            "--cfg", gate_env["cfg_file"], "--weights", weights,
            "EXPECTED_RESULTS", f"[['{DATASET}','box','AP',0.9]]",
        ])
