"""Semi-supervised stream semantics at the loader level.

The reference's UNLABEL_DISTILLATION training mixes two streams
(lib/roi_data/loader.py): loader threads fill whichever stream is behind
(:109-115) and the enqueue thread strictly alternates labeled/unlabeled by
batch parity (:140-146). The 'unlabeled' stream itself is the roidb union of
DISTILLATION.UNLABEL_DATASETS — which in the shipped config mixes the
pseudo-labeled set with real coco_2017_train
(configs/focal_distillation/retinanet_R-50-FPN_distillation.yaml:49-51).

These tests pin both semantics with counters, for the threaded AND the
multi-process loader.
"""

import json

import numpy as np
import pytest
from PIL import Image

from sad_tpu.config import Config, register_dataset
from sad_tpu.config.catalog import DatasetSpec
from sad_tpu.config.config import merge_cfg_from_dict
from sad_tpu.data.dataset import CocoDataset, combined_roidb_for_training
from sad_tpu.data.loader import TrainingLoader

pytestmark = pytest.mark.e2e  # heavyweight: excluded from the default run (pytest.ini)


def _make_dataset(root, name, n_images, fill):
    img_dir = root / name
    img_dir.mkdir()
    images, anns = [], []
    for i in range(1, n_images + 1):
        arr = np.full((64, 96, 3), fill, dtype=np.uint8)
        Image.fromarray(arr).save(img_dir / f"{i:06d}.png")
        images.append(
            {"id": i, "file_name": f"{i:06d}.png", "height": 64, "width": 96}
        )
        anns.append(
            {"id": i, "image_id": i, "category_id": 1, "bbox": [8, 10, 32, 20],
             "area": 640, "iscrowd": 0}
        )
    ann = root / f"{name}.json"
    with open(ann, "w") as f:
        json.dump({"images": images, "annotations": anns,
                   "categories": [{"id": 1, "name": "c"}]}, f)
    return DatasetSpec(name, str(img_dir), str(ann))


def _cfg():
    return merge_cfg_from_dict(Config(), {
        "MODEL": {"TYPE": "distillation", "NUM_CLASSES": 2},
        "NUM_GPUS": 1,
        "FPN": {"FPN_ON": True, "RPN_MIN_LEVEL": 3, "RPN_MAX_LEVEL": 7,
                "EXTRA_CONV_LEVELS": True, "COARSEST_STRIDE": 128},
        "RETINANET": {"RETINANET_ON": True, "ASPECT_RATIOS": (1.0,),
                      "SCALES_PER_OCTAVE": 1},
        "TRAIN": {"SCALES": (64,), "MAX_SIZE": 128, "IMS_PER_BATCH": 2},
        "DISTILLATION": {"DISTILLATION_ON": True,
                         "UNLABEL_DISTILLATION": True},
        # identity normalization so pixel values identify the stream
        "PIXEL_MEANS": (0.0, 0.0, 0.0),
    })


@pytest.fixture(scope="module")
def streams(tmp_path_factory):
    root = tmp_path_factory.mktemp("semi")
    labeled = _make_dataset(root, "semi_labeled", 6, fill=200)
    pseudo = _make_dataset(root, "semi_pseudo", 5, fill=0)
    extra = _make_dataset(root, "semi_extra_train", 3, fill=0)
    return labeled, pseudo, extra


def _stream_of(batch):
    # labeled images are bright (200), unlabeled black (0); batches carry
    # uint8 canvases (DEVICE_NORMALIZE) or normalized f32
    data = batch.get("data_u8", batch.get("data"))
    return "labeled" if float(np.max(data)) > 100 else "unlabeled"


@pytest.mark.parametrize("loader_kind", ["threads", "processes"])
def test_strict_parity_alternation_counters(streams, loader_kind):
    labeled_spec, pseudo_spec, _ = streams
    cfg = _cfg()
    roidb = CocoDataset(labeled_spec).get_roidb()
    unlabeled = CocoDataset(pseudo_spec).get_roidb()
    if loader_kind == "threads":
        loader = TrainingLoader(
            cfg, roidb, None, unlabeled, batch_images=2, num_threads=2,
        ).start()
    else:
        from sad_tpu.data.mp_loader import MultiprocessTrainingLoader

        loader = MultiprocessTrainingLoader(
            cfg, roidb, None, unlabeled, batch_images=2, num_workers=2,
        ).start()
    counts = {"labeled": 0, "unlabeled": 0}
    try:
        seq = []
        for _ in range(8):
            s = _stream_of(loader.get_next_batch())
            seq.append(s)
            counts[s] += 1
    finally:
        loader.shutdown()
    # strict parity: L U L U ... (ref loader.py:140-146) => exact 50/50
    assert seq == ["labeled", "unlabeled"] * 4
    assert counts["labeled"] == counts["unlabeled"] == 4


def test_unlabel_datasets_union_mixes_pseudo_and_train(streams):
    """DISTILLATION.UNLABEL_DATASETS lists the pseudo set AND
    coco_2017_train; the unlabeled stream is their roidb union."""
    _, pseudo_spec, extra_spec = streams
    register_dataset(pseudo_spec.name, pseudo_spec.image_directory,
                     pseudo_spec.annotation_file, is_pseudo_labeled=True,
                     allow_override=True)
    register_dataset(extra_spec.name, extra_spec.image_directory,
                     extra_spec.annotation_file, allow_override=True)
    union = combined_roidb_for_training(
        (pseudo_spec.name, extra_spec.name), use_flipped=False
    )
    assert len(union) == 5 + 3
    srcs = {e["dataset"] for e in union} if "dataset" in union[0] else None
    if srcs is not None:
        assert srcs == {pseudo_spec.name, extra_spec.name}
