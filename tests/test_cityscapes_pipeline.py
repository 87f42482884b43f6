"""Raw-Cityscapes dataset path: gtFine tree -> COCO json -> roidb ->
inference -> COCO eval -> official-format export.

Closes the reference's cityscapes capability (dataset_catalog.py:40-64 +
lib/datasets/cityscapes/tools/convert_cityscapes_to_coco.py +
cityscapes_json_dataset_evaluator.py) end-to-end on a synthetic fixture.
"""

import dataclasses as dc
import json
import os

import numpy as np
import pytest
from PIL import Image

from sad_tpu.tools.convert_cityscapes_to_coco import (
    convert_cityscapes_instance_only,
)

pytestmark = pytest.mark.e2e  # heavyweight: excluded from the default run (pytest.ini)

CITY = "frankfurt"


def _poly_rect(x0, y0, x1, y1):
    return [[x0, y0], [x1, y0], [x1, y1], [x0, y1]]


@pytest.fixture(scope="module")
def cityscapes_root(tmp_path_factory):
    """A miniature cityscapes tree: gtFine val polygons + matching images."""
    root = tmp_path_factory.mktemp("cityscapes")
    ann_dir = root / "gtFine_trainvaltest" / "gtFine" / "val" / CITY
    img_dir = root / "images" / CITY
    ann_dir.mkdir(parents=True)
    img_dir.mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(2):
        stem = f"{CITY}_00000{i}_000294_"
        objs = [
            {"label": "car", "polygon": _poly_rect(10, 10, 40, 30)},
            {"label": "person", "polygon": _poly_rect(50, 8, 58, 28)},
            {"label": "cargroup", "polygon": _poly_rect(0, 0, 6, 6)},  # crowd
            {"label": "sky", "polygon": _poly_rect(0, 0, 63, 10)},  # non-inst
            {"label": "car", "polygon": [[1, 1], [2, 2]]},  # degenerate
        ]
        with open(ann_dir / f"{stem}gtFine_polygons.json", "w") as f:
            json.dump({"imgHeight": 64, "imgWidth": 64, "objects": objs}, f)
        Image.fromarray(
            rng.randint(0, 255, (64, 64, 3), np.uint8)
        ).save(img_dir / f"{stem}leftImg8bit.png")
    return root


@pytest.fixture(scope="module")
def converted_json(cityscapes_root, tmp_path_factory):
    out = tmp_path_factory.mktemp("csout")
    written = convert_cityscapes_instance_only(
        str(cityscapes_root), str(out), ["gtFine_val"]
    )
    return written["gtFine_val"]


class TestConverter:
    def test_coco_structure(self, converted_json):
        with open(converted_json) as f:
            d = json.load(f)
        assert len(d["images"]) == 2
        names = {c["name"] for c in d["categories"]}
        assert names == {"car", "person"}  # sky/cargroup/degenerate skipped
        assert len(d["annotations"]) == 4  # 2 per image
        a = d["annotations"][0]
        assert a["bbox"] == [10, 10, 31, 21]  # xyxy->xywh with +1 extent
        assert a["area"] == pytest.approx(30 * 20)  # shoelace
        assert a["iscrowd"] == 0
        assert len(a["segmentation"][0]) == 8
        im = d["images"][0]
        assert im["file_name"].endswith("leftImg8bit.png")
        assert im["seg_file_name"].endswith("gtFine_instanceIds.png")

    def test_loads_as_dataset(self, cityscapes_root, converted_json):
        from sad_tpu.config.catalog import DatasetSpec
        from sad_tpu.data.dataset import CocoDataset

        spec = DatasetSpec(
            "cityscapes_fine_instanceonly_seg_val",
            str(cityscapes_root / "images" / CITY),
            converted_json,
        )
        ds = CocoDataset(spec)
        roidb = ds.get_roidb()
        assert len(roidb) == 2
        e = roidb[0]
        assert e["boxes"].shape == (2, 4)
        assert os.path.exists(e["image"])
        # polygons survive into the roidb for segm training
        assert e["segms"][0]


class TestEndToEnd:
    def test_infer_eval_export(self, cityscapes_root, converted_json, tmp_path):
        """Tiny Mask R-CNN inference over the converted dataset, COCO bbox +
        segm eval, then the official cityscapes result export."""
        import jax

        from sad_tpu.eval.cityscapes_eval import export_cityscapes_results
        from sad_tpu.eval.coco_eval import COCOEvaluator
        from sad_tpu.eval.test_engine import run_inference_on_roidb
        from sad_tpu.config.catalog import DatasetSpec
        from sad_tpu.data.dataset import CocoDataset
        from sad_tpu.models import create_model
        from sad_tpu.models.model_builder import init_model_params
        from tests.test_rcnn import rcnn_cfg

        cfg = rcnn_cfg(mask=True)
        cfg = dc.replace(
            cfg,
            MODEL=dc.replace(cfg.MODEL, NUM_CLASSES=3),
            RESNETS=dc.replace(cfg.RESNETS, CHANNEL_RATIO=0.0625),
            MRCNN=dc.replace(
                cfg.MRCNN, DIM_REDUCED=16, ROI_XFORM_RESOLUTION=7,
                RESOLUTION=14,
            ),
            TEST=dc.replace(
                cfg.TEST, SCALES=(48,), MAX_SIZE=64, SCORE_THRESH=0.0,
                DETECTIONS_PER_IM=4,
            ),
        )
        spec = DatasetSpec(
            "cityscapes_fine_instanceonly_seg_val",
            str(cityscapes_root / "images" / CITY),
            converted_json,
        )
        ds = CocoDataset(spec)
        roidb = ds.get_roidb()
        with open(converted_json) as f:
            gt = json.load(f)
        model = create_model(cfg)
        params = init_model_params(model, jax.random.PRNGKey(0), (1, 64, 64, 3))
        contig_to_json = {v: k for k, v in ds.json_to_contiguous.items()}
        dets = run_inference_on_roidb(
            cfg, model, params, roidb, contig_to_json, batch_size=1,
        )
        assert dets, "no detections produced"
        bbox_res = COCOEvaluator(gt, iou_type="bbox").evaluate(dets)
        assert 0.0 <= bbox_res["AP"] <= 1.0  # random weights: any valid value
        seg_dets = [d for d in dets if "segmentation" in d]
        assert seg_dets, "mask head produced no segmentations"
        segm_res = COCOEvaluator(gt, iou_type="segm").evaluate(seg_dets)
        assert "AP" in segm_res

        cat_names = {c["id"]: c["name"] for c in gt["categories"]}
        out_dir = export_cityscapes_results(
            roidb, seg_dets, cat_names, str(tmp_path)
        )
        txts = [f for f in os.listdir(out_dir) if f.endswith("pred.txt")]
        assert len(txts) == 2  # one per image, official naming
        lines = open(os.path.join(out_dir, txts[0])).read().splitlines()
        for ln in lines:
            png, label_id, score = ln.split()
            assert os.path.exists(os.path.join(out_dir, png))
            assert int(label_id) in (24, 25, 26, 27, 28, 31, 32, 33)
            assert 0.0 <= float(score) <= 1.0
