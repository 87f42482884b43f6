"""Semi-supervised pseudo-label loop on CPU: teacher inference over an
unlabeled dataset -> COCO-format annotation json -> registered catalog
entry -> training roidb (ref: SURVEY.md §3.4 — the reference reuses
test_net with TEST.DATASETS=('coco_2017_unlabel',) and distributes
pre-made jsons; here generate_pseudo_labels is a first-class API)."""

import json
import os

import jax
import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def unlabeled_dataset(tmp_path_factory):
    from sad_tpu.config import register_dataset

    root = tmp_path_factory.mktemp("pseudo")
    img_dir = root / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    images = []
    for i in range(1, 5):
        arr = np.full((64, 96, 3), 110, np.uint8)
        # a bright square so a random-init model still scores SOMETHING
        arr[20:40, 30:60] = [247, 40, 40]
        arr += rng.randint(0, 8, arr.shape).astype(np.uint8)  # 247+7 <= 255
        Image.fromarray(arr).save(img_dir / f"{i:06d}.jpg")
        images.append(
            {"id": i, "file_name": f"{i:06d}.jpg", "height": 64, "width": 96}
        )
    ann = root / "unlabeled.json"
    ann.write_text(json.dumps({
        "images": images,
        "annotations": [],
        "categories": [{"id": 1, "name": "red"}, {"id": 2, "name": "blue"}],
    }))
    register_dataset(
        "pseudo_unlabeled_synth", str(img_dir), str(ann), allow_override=True
    )
    return root, img_dir


def test_generate_pseudo_labels_roundtrip(unlabeled_dataset, tmp_path):
    import yaml

    from sad_tpu.config import load_cfg, register_dataset
    from sad_tpu.data.dataset import CocoDataset, combined_roidb_for_training
    from sad_tpu.eval.test_engine import generate_pseudo_labels
    from sad_tpu.models import create_model
    from sad_tpu.models.model_builder import init_model_params

    root, img_dir = unlabeled_dataset
    cfg_d = {
        "MODEL": {"TYPE": "retinanet", "NUM_CLASSES": 3,
                  "CONV_BODY": "FPN.add_fpn_ResNet50_conv5_body"},
        "FPN": {"FPN_ON": True, "RPN_MIN_LEVEL": 3, "RPN_MAX_LEVEL": 7,
                "EXTRA_CONV_LEVELS": True, "COARSEST_STRIDE": 128},
        "RETINANET": {"RETINANET_ON": True, "ASPECT_RATIOS": (1.0,),
                      "SCALES_PER_OCTAVE": 1},
        "RESNETS": {"CHANNEL_RATIO": 0.125},
        "TEST": {"SCALES": (64,), "MAX_SIZE": 128, "SCORE_THRESH": 0.0,
                 "DATASETS": ("pseudo_unlabeled_synth",)},
        "COMPUTE_DTYPE": "float32",
    }
    cfg_file = tmp_path / "teacher.yaml"
    cfg_file.write_text(yaml.safe_dump(cfg_d))
    cfg = load_cfg(str(cfg_file))
    model = create_model(cfg)
    params = init_model_params(model, jax.random.PRNGKey(0), (1, 64, 128, 3))

    out_json = str(tmp_path / "pseudo.json")
    generate_pseudo_labels(
        cfg, model, params, "pseudo_unlabeled_synth", out_json,
        score_thresh=0.0,  # random weights: keep everything
        batch_size=2,
    )
    data = json.loads(open(out_json).read())
    assert data["images"] and data["categories"]
    assert data["annotations"], "random-init teacher at thresh 0 must emit"
    a0 = data["annotations"][0]
    for k in ("id", "image_id", "category_id", "bbox", "area", "iscrowd"):
        assert k in a0
    assert a0["category_id"] in (1, 2)

    # the json is a valid catalog entry: it loads as a gt dataset and
    # produces a training roidb (DISTILLATION.UNLABEL_DATASETS flow)
    register_dataset(
        "pseudo_labeled_synth", str(img_dir), out_json, allow_override=True
    )
    roidb = combined_roidb_for_training(("pseudo_labeled_synth",), False)
    assert roidb
    assert all(len(e["boxes"]) > 0 for e in roidb)
    ds = CocoDataset("pseudo_labeled_synth")
    assert len(ds.get_roidb()) == 4


def test_sharded_pseudo_labels_match_unsharded(unlabeled_dataset, tmp_path):
    """Mesh-sharded pseudo-label generation (batch_size divisible by the
    8-device mesh -> run_inference_on_roidb shards the batch over the
    'data' axis; the repo's replacement for the reference's per-GPU
    subprocess sharding, test_engine.py:115-153 + subprocess.py:39) must
    produce the same annotations as the single-device path. batch_size=2
    skips the mesh (2 % 8 != 0); batch_size=8 engages it."""
    import yaml

    from sad_tpu.config import load_cfg
    from sad_tpu.models import create_model
    from sad_tpu.models.model_builder import init_model_params
    from sad_tpu.eval.test_engine import generate_pseudo_labels

    root, img_dir = unlabeled_dataset
    assert jax.device_count() == 8, "conftest must provide the 8-CPU mesh"
    cfg_d = {
        "MODEL": {"TYPE": "retinanet", "NUM_CLASSES": 3,
                  "CONV_BODY": "FPN.add_fpn_ResNet50_conv5_body"},
        "FPN": {"FPN_ON": True, "RPN_MIN_LEVEL": 3, "RPN_MAX_LEVEL": 7,
                "EXTRA_CONV_LEVELS": True, "COARSEST_STRIDE": 128},
        "RETINANET": {"RETINANET_ON": True, "ASPECT_RATIOS": (1.0,),
                      "SCALES_PER_OCTAVE": 1},
        "RESNETS": {"CHANNEL_RATIO": 0.125},
        "TEST": {"SCALES": (64,), "MAX_SIZE": 128, "SCORE_THRESH": 0.0,
                 "DATASETS": ("pseudo_unlabeled_synth",)},
        "COMPUTE_DTYPE": "float32",
    }
    cfg_file = tmp_path / "teacher.yaml"
    cfg_file.write_text(yaml.safe_dump(cfg_d))
    cfg = load_cfg(str(cfg_file))
    model = create_model(cfg)
    params = init_model_params(model, jax.random.PRNGKey(0), (1, 64, 128, 3))

    outs = {}
    for bs in (2, 8):
        out_json = str(tmp_path / f"pseudo_bs{bs}.json")
        generate_pseudo_labels(
            cfg, model, params, "pseudo_unlabeled_synth", out_json,
            score_thresh=0.0, batch_size=bs,
        )
        outs[bs] = json.loads(open(out_json).read())["annotations"]

    assert len(outs[2]) == len(outs[8]) > 0
    key = lambda a: (a["image_id"], a["category_id"], tuple(a["bbox"]))
    for a2, a8 in zip(sorted(outs[2], key=key), sorted(outs[8], key=key)):
        assert a2["image_id"] == a8["image_id"]
        assert a2["category_id"] == a8["category_id"]
        np.testing.assert_allclose(a2["bbox"], a8["bbox"], atol=1e-3)
        np.testing.assert_allclose(a2["score"], a8["score"], rtol=1e-5)
