"""Aux evaluation surface: box voting, soft-NMS postprocess, TTA merge, VOC
evaluator, EXPECTED_RESULTS gate, segms utilities."""

import dataclasses
import os

import numpy as np
import pytest

from sad_tpu.config import Config
from sad_tpu.config.config import merge_cfg_from_dict
from sad_tpu.eval.task_evaluation import ExpectedResultsError, check_expected_results
from sad_tpu.eval.test_augmentation import (
    bbox_aug_transforms,
    box_voting,
    merge_aug_detections,
    postprocess_detections,
)
from sad_tpu.eval.voc_eval import voc_ap, voc_eval_boxes
from sad_tpu.utils import segms


class TestBoxVoting:
    def test_id_voting_moves_box_to_weighted_average(self):
        top = np.asarray([[10, 10, 20, 20, 0.9]], np.float32)
        alls = np.asarray(
            [[10, 10, 20, 20, 0.9], [12, 12, 22, 22, 0.1]], np.float32
        )
        out = box_voting(top, alls, thresh=0.5, scoring_method="ID")
        expected = np.average(alls[:, :4], axis=0, weights=alls[:, 4])
        np.testing.assert_allclose(out[0, :4], expected, rtol=1e-5)
        assert out[0, 4] == pytest.approx(0.9)  # ID keeps the score

    def test_avg_scoring(self):
        top = np.asarray([[0, 0, 10, 10, 0.8]], np.float32)
        alls = np.asarray([[0, 0, 10, 10, 0.8], [1, 1, 11, 11, 0.4]], np.float32)
        out = box_voting(top, alls, 0.5, scoring_method="AVG")
        assert out[0, 4] == pytest.approx(0.6)


class TestPostprocess:
    def _cfg(self, soft=False, vote=False):
        d = {"MODEL": {"NUM_CLASSES": 3}, "TEST": {"NMS": 0.5}}
        cfg = merge_cfg_from_dict(Config(), d)
        if soft:
            cfg = dataclasses.replace(
                cfg, TEST=dataclasses.replace(
                    cfg.TEST, SOFT_NMS=dataclasses.replace(
                        cfg.TEST.SOFT_NMS, ENABLED=True
                    )
                )
            )
        if vote:
            cfg = dataclasses.replace(
                cfg, TEST=dataclasses.replace(
                    cfg.TEST, BBOX_VOTE=dataclasses.replace(
                        cfg.TEST.BBOX_VOTE, ENABLED=True
                    )
                )
            )
        return cfg

    def test_hard_nms_path(self):
        cfg = self._cfg()
        boxes = np.asarray(
            [[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], np.float32
        )
        scores = np.asarray([0.9, 0.8, 0.7], np.float32)
        classes = np.asarray([1, 1, 2], np.int32)
        valid = np.ones(3, bool)
        b, s, c = postprocess_detections(cfg, boxes, scores, classes, valid, 3)
        assert len(s) == 2  # overlap suppressed within class 1
        assert set(c.tolist()) == {1, 2}

    def test_soft_nms_keeps_but_downweights(self):
        cfg = self._cfg(soft=True)
        boxes = np.asarray([[0, 0, 10, 10], [1, 1, 11, 11]], np.float32)
        scores = np.asarray([0.9, 0.8], np.float32)
        classes = np.asarray([1, 1], np.int32)
        b, s, c = postprocess_detections(
            cfg, boxes, scores, classes, np.ones(2, bool), 3
        )
        assert len(s) == 2
        assert s.min() < 0.8  # rescored down, not removed


class TestTTA:
    def test_transform_enumeration(self):
        cfg = merge_cfg_from_dict(
            Config(),
            {
                "TEST": {
                    "SCALES": (600,),
                    "MAX_SIZE": 1000,
                    "BBOX_AUG": {
                        "ENABLED": True,
                        "H_FLIP": True,
                        "SCALES": (400, 800),
                        "SCALE_H_FLIP": True,
                        "ASPECT_RATIOS": (0.75,),
                        "ASPECT_RATIO_H_FLIP": False,
                    },
                }
            },
        )
        t = bbox_aug_transforms(cfg)
        # base + flip + 2 scales * 2 (flip) + 1 aspect = 7
        assert len(t) == 7
        assert sum(tt["hflip"] for tt in t) == 3

    def test_merge_unflips(self):
        per_aug = [
            {
                "boxes": np.asarray([[10, 5, 20, 15]], np.float32),
                "scores": np.asarray([0.9], np.float32),
                "classes": np.asarray([1], np.int32),
                "valid": np.asarray([True]),
            },
            {
                "boxes": np.asarray([[10, 5, 20, 15]], np.float32),
                "scores": np.asarray([0.8], np.float32),
                "classes": np.asarray([1], np.int32),
                "valid": np.asarray([True]),
            },
        ]
        merged = merge_aug_detections(per_aug, im_w=100, flipped_flags=[False, True])
        assert merged["boxes"].shape == (2, 4)
        np.testing.assert_allclose(merged["boxes"][0], [10, 5, 20, 15])
        np.testing.assert_allclose(merged["boxes"][1], [79, 5, 89, 15])


class TestVOCEval:
    def test_perfect_ap(self):
        gt = {
            "categories": [{"id": 1, "name": "a"}],
            "annotations": [
                {"image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 20]},
                {"image_id": 2, "category_id": 1, "bbox": [5, 5, 30, 30]},
            ],
        }
        dets = [
            {"image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 20], "score": 0.9},
            {"image_id": 2, "category_id": 1, "bbox": [5, 5, 30, 30], "score": 0.8},
        ]
        res = voc_eval_boxes(gt, dets)
        assert res["mAP"] == pytest.approx(1.0)
        res07 = voc_eval_boxes(gt, dets, use_07_metric=True)
        assert res07["mAP"] == pytest.approx(1.0)

    def test_duplicate_detection_is_fp(self):
        gt = {
            "categories": [{"id": 1, "name": "a"}],
            "annotations": [
                {"image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 20]}
            ],
        }
        # the duplicate outranks the best match: the second det of the same
        # gt counts as FP, halving precision at full recall
        dets = [
            {"image_id": 1, "category_id": 1, "bbox": [11, 11, 20, 20], "score": 0.9},
            {"image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 20], "score": 0.8},
        ]
        res = voc_eval_boxes(gt, dets)
        assert res["mAP"] == pytest.approx(1.0)  # first det still matches
        # now a true duplicate: both dets match the same gt
        res2 = voc_eval_boxes(
            gt,
            [
                {"image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 20], "score": 0.9},
                {"image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 20], "score": 0.95},
            ],
        )
        assert res2["mAP"] == pytest.approx(1.0)  # dup is FP but after recall=1
        # FP before the TP in score order drops AP below 1
        gt2 = {
            "categories": [{"id": 1, "name": "a"}],
            "annotations": [
                {"image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 20]},
                {"image_id": 2, "category_id": 1, "bbox": [10, 10, 20, 20]},
            ],
        }
        res3 = voc_eval_boxes(
            gt2,
            [
                {"image_id": 1, "category_id": 1, "bbox": [60, 60, 5, 5], "score": 0.99},
                {"image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 20], "score": 0.9},
                {"image_id": 2, "category_id": 1, "bbox": [10, 10, 20, 20], "score": 0.8},
            ],
        )
        assert res3["mAP"] < 1.0


class TestExpectedResults:
    def test_pass_and_fail(self):
        cfg = merge_cfg_from_dict(
            Config(),
            {"EXPECTED_RESULTS": [["coco_2017_val", "box", "AP", 0.365]]},
        )
        ok = {"coco_2017_val": {"box": {"AP": 0.3655}}}
        assert check_expected_results(cfg, ok) == []
        bad = {"coco_2017_val": {"box": {"AP": 0.20}}}
        with pytest.raises(ExpectedResultsError):
            check_expected_results(cfg, bad)
        fails = check_expected_results(cfg, bad, raise_on_failure=False)
        assert len(fails) == 1


class TestSegms:
    def test_polygon_rasterization(self):
        mask = segms.polys_to_mask([[2, 2, 8, 2, 8, 8, 2, 8]], 10, 10)
        assert mask[5, 5] == 1 and mask[0, 0] == 0
        assert 30 <= mask.sum() <= 55

    def test_mask_wrt_box(self):
        m = segms.polys_to_mask_wrt_box(
            [[0, 0, 20, 0, 20, 20, 0, 20]], np.asarray([0, 0, 20, 20]), 14
        )
        assert m.shape == (14, 14)
        assert m.sum() > 150  # nearly full

    def test_paste_mask(self):
        prob = np.ones((4, 4), np.float32)
        out = segms.paste_mask_into_image(
            prob, np.asarray([2, 3, 7, 9], np.float32), 20, 20
        )
        assert out.shape == (20, 20)
        assert out[5, 5] == 1 and out[0, 0] == 0

    def test_paste_mask_reference_semantics(self):
        """segm_results transcription: 1px zero-pad + (M+2)/M box expansion
        (no border top-hat), int32-truncated extents, strict > threshold."""
        m = 8
        # exactly-threshold probs are EXCLUDED (reference uses >)
        half = np.full((m, m), 0.5, np.float32)
        out = segms.paste_mask_into_image(
            half, np.asarray([4, 4, 12, 12], np.float32), 24, 24, thresh=0.5
        )
        assert out.sum() == 0
        # a full mask's pasted extent stays within the expanded box and the
        # zero-pad ring keeps the far border off
        ones = np.ones((m, m), np.float32)
        out = segms.paste_mask_into_image(
            ones, np.asarray([8.0, 8.0, 15.0, 15.0], np.float32), 24, 24
        )
        # expanded box: center 11.5, half 3.5*10/8=4.375 -> [7.125, 15.875]
        # -> int32 [7, 15]; interior filled, outside empty
        assert out[11, 11] == 1
        assert out[:6, :].sum() == 0 and out[18:, :].sum() == 0
        ys, xs = np.nonzero(out)
        assert ys.min() >= 7 and ys.max() <= 16 and xs.min() >= 7

    def test_flip_polys(self):
        flipped = segms.flip_polys([[0, 0, 10, 5]], width=100)
        np.testing.assert_allclose(flipped[0], [99, 0, 89, 5])


class TestAuxAugHelpers:
    def test_combine_soft_masks_heuristics(self):
        from sad_tpu.eval.test_augmentation import combine_soft_masks

        a = np.full((2, 3, 3, 1), 0.2, np.float32)
        b = np.full((2, 3, 3, 1), 0.6, np.float32)
        np.testing.assert_allclose(
            combine_soft_masks([a, b], "SOFT_AVG"), 0.4, rtol=1e-5
        )
        np.testing.assert_allclose(
            combine_soft_masks([a, b], "SOFT_MAX"), 0.6, rtol=1e-5
        )
        out = combine_soft_masks([a, b], "LOGIT_AVG")
        # logit mean of (0.2, 0.6) -> sigmoid((logit(.2)+logit(.6))/2)
        expect = 1 / (1 + np.exp(-(np.log(0.25) + np.log(1.5)) / 2))
        np.testing.assert_allclose(out, expect, rtol=1e-4)
        with pytest.raises(NotImplementedError):
            combine_soft_masks([a], "BOGUS")

    def test_combine_heatmaps(self):
        from sad_tpu.eval.test_augmentation import combine_heatmaps

        a = np.zeros((1, 2, 2, 3), np.float32)
        b = np.ones((1, 2, 2, 3), np.float32)
        np.testing.assert_allclose(combine_heatmaps([a, b], "HM_AVG"), 0.5)
        np.testing.assert_allclose(combine_heatmaps([a, b], "HM_MAX"), 1.0)

    def test_flip_heatmaps_swaps_channels_and_width(self):
        from sad_tpu.eval.test_augmentation import flip_heatmaps
        from sad_tpu.utils.keypoints import COCO_KEYPOINTS

        j = len(COCO_KEYPOINTS)
        hm = np.zeros((1, 1, 4, 4, j), np.float32)
        li = COCO_KEYPOINTS.index("left_eye")
        ri = COCO_KEYPOINTS.index("right_eye")
        hm[0, 0, 1, 0, li] = 1.0  # left_eye at x=0
        out = flip_heatmaps(hm)
        assert out[0, 0, 1, 3, ri] == 1.0  # right_eye at x=3
        assert out[0, 0, 1, 0, ri] == 0.0

    def test_flip_mask_probs(self):
        from sad_tpu.eval.test_augmentation import flip_mask_probs

        m = np.zeros((1, 1, 2, 3, 2), np.float32)
        m[0, 0, 0, 0, 1] = 1.0
        out = flip_mask_probs(m)
        assert out[0, 0, 0, 2, 1] == 1.0

    def test_aux_aug_transforms_enumeration(self):
        from sad_tpu.eval.test_augmentation import aux_aug_transforms

        cfg = merge_cfg_from_dict(
            Config(),
            {"TEST": {"SCALES": (100,), "MAX_SIZE": 200,
                      "MASK_AUG": {"ENABLED": True, "H_FLIP": True,
                                   "SCALES": (80,), "SCALE_H_FLIP": True}}},
        )
        t = aux_aug_transforms(cfg.TEST.MASK_AUG, cfg)
        assert len(t) == 3  # hflip, scale, scale+hflip
        assert t[0]["hflip"] and t[0]["scale"] == 100
        assert not t[1]["hflip"] and t[1]["scale"] == 80
        assert t[2]["hflip"] and t[2]["scale"] == 80
        cfg2 = merge_cfg_from_dict(
            Config(), {"TEST": {"MASK_AUG": {"ASPECT_RATIOS": (0.75,)}}}
        )
        with pytest.raises(NotImplementedError):
            aux_aug_transforms(cfg2.TEST.MASK_AUG, cfg2)


class TestEngineTTA:
    """run_inference_on_roidb with bbox + mask TTA enabled (ref: test.py
    im_detect_bbox_aug/im_detect_mask_aug wiring)."""

    def test_tta_end_to_end(self, tmp_path):
        import dataclasses as dc

        import jax
        import jax.numpy as jnp
        from PIL import Image

        from sad_tpu.eval.test_engine import run_inference_on_roidb
        from sad_tpu.models import create_model
        from sad_tpu.models.model_builder import init_model_params
        from tests.test_rcnn import rcnn_cfg

        cfg = rcnn_cfg(mask=True)
        cfg = dc.replace(
            cfg,
            RESNETS=dc.replace(cfg.RESNETS, CHANNEL_RATIO=0.0625),
            TEST=dc.replace(
                cfg.TEST,
                SCALES=(48,), MAX_SIZE=64, SCORE_THRESH=0.0,
                DETECTIONS_PER_IM=8,
                BBOX_AUG=dc.replace(cfg.TEST.BBOX_AUG, ENABLED=True,
                                    H_FLIP=True),
                MASK_AUG=dc.replace(cfg.TEST.MASK_AUG, ENABLED=True,
                                    H_FLIP=True, HEUR="SOFT_AVG"),
            ),
        )
        model = create_model(cfg)
        params = init_model_params(model, jax.random.PRNGKey(0), (1, 64, 64, 3))

        roidb = []
        rng = np.random.RandomState(0)
        for i in range(2):
            p = tmp_path / f"im{i}.png"
            Image.fromarray(
                rng.randint(0, 255, (50, 60, 3), np.uint8)
            ).save(p)
            roidb.append(
                {"id": i + 1, "image": str(p), "height": 50, "width": 60}
            )
        dets = run_inference_on_roidb(
            cfg, model, params, roidb, {i: i for i in range(10)},
            batch_size=2,
        )
        assert isinstance(dets, list)
        for d in dets:
            assert "segmentation" in d
            assert 0.0 <= d["score"] <= 1.0
            x, y, w, h = d["bbox"]
            assert w > 0 and h > 0


class TestCityscapesExport:
    def test_export_format(self, tmp_path):
        from sad_tpu.eval.cityscapes_eval import export_cityscapes_results
        from sad_tpu.utils.segms import mask_to_rle

        m = np.zeros((8, 8), np.uint8)
        m[2:6, 2:6] = 1
        roidb = [{"id": 1, "image": "/x/frankfurt_000000_000294.png"}]
        dets = [
            {"image_id": 1, "category_id": 1, "score": 0.9,
             "segmentation": mask_to_rle(m)},
            {"image_id": 1, "category_id": 99, "score": 0.5,  # unknown class
             "segmentation": mask_to_rle(m)},
        ]
        out = export_cityscapes_results(
            roidb, dets, {1: "car"}, str(tmp_path)
        )
        txt = (tmp_path / "frankfurt_000000_000294pred.txt").read_text()
        lines = txt.strip().splitlines()
        assert len(lines) == 1  # unknown class skipped
        png, label_id, score = lines[0].split()
        assert label_id == "26" and float(score) == pytest.approx(0.9)
        from PIL import Image

        arr = np.asarray(Image.open(tmp_path / png))
        assert arr.max() == 255 and (arr[2:6, 2:6] == 255).all()
        assert out == str(tmp_path)


class TestVIDEval:
    def test_vid_protocol_matches_coco_on_simple_case(self):
        from sad_tpu.eval.vid_eval import evaluate_vid_detections

        gt = {
            "images": [{"id": 1, "height": 100, "width": 100}],
            "categories": [{"id": 1, "name": "obj"}],
            "annotations": [
                {"id": 1, "image_id": 1, "category_id": 1,
                 "bbox": [10, 10, 20, 20], "area": 400, "iscrowd": 0}
            ],
        }
        dets = [{"image_id": 1, "category_id": 1, "score": 0.9,
                 "bbox": [10, 10, 20, 20]}]
        r = evaluate_vid_detections(gt, dets)
        assert r["AP"] == pytest.approx(1.0)
        assert r["AP50"] == pytest.approx(1.0)
        # miss -> 0
        r0 = evaluate_vid_detections(
            gt, [{"image_id": 1, "category_id": 1, "score": 0.9,
                  "bbox": [50, 50, 10, 10]}]
        )
        assert r0["AP"] == 0.0


class TestEngineKpsTTA:
    def test_kps_tta_combines_heatmaps(self, tmp_path):
        import dataclasses as dc

        import jax
        from PIL import Image

        from sad_tpu.eval.test_engine import run_inference_on_roidb
        from sad_tpu.models import create_model
        from sad_tpu.models.model_builder import init_model_params
        from tests.test_rcnn import rcnn_cfg

        cfg = rcnn_cfg(kps=True)
        cfg = dc.replace(
            cfg,
            RESNETS=dc.replace(cfg.RESNETS, CHANNEL_RATIO=0.0625),
            KRCNN=dc.replace(
                cfg.KRCNN, NUM_KEYPOINTS=17, CONV_HEAD_DIM=16,
                NUM_STACKED_CONVS=2,
            ),
            TEST=dc.replace(
                cfg.TEST,
                SCALES=(48,), MAX_SIZE=64, SCORE_THRESH=0.0,
                DETECTIONS_PER_IM=4,
                KPS_AUG=dc.replace(cfg.TEST.KPS_AUG, ENABLED=True,
                                   H_FLIP=True, HEUR="HM_MAX"),
            ),
        )
        model = create_model(cfg)
        params = init_model_params(model, jax.random.PRNGKey(0), (1, 64, 64, 3))
        p = tmp_path / "im.png"
        Image.fromarray(
            np.random.RandomState(0).randint(0, 255, (50, 60, 3), np.uint8)
        ).save(p)
        roidb = [{"id": 1, "image": str(p), "height": 50, "width": 60}]
        vis_dir = str(tmp_path / "vis")
        dets = run_inference_on_roidb(
            cfg, model, params, roidb, {i: i for i in range(10)},
            batch_size=1, vis_dir=vis_dir,
        )
        for d in dets:
            assert "keypoints" in d
            assert len(d["keypoints"]) == 17 * 3
        # the vis path renders with the per-det keypoint rows threaded in
        assert os.path.exists(os.path.join(vis_dir, "im.png"))

    def test_combine_heatmaps_size_dep_unit(self):
        """Small objects drop downscaled passes, large drop upscaled
        (test.py combine_heatmaps_size_dep:726-751)."""
        from sad_tpu.eval.test_augmentation import combine_heatmaps_size_dep

        b, r, s, k = 1, 2, 2, 1
        ident = np.full((b, r, s, s, k), 1.0, np.float32)
        down = np.full((b, r, s, s, k), 10.0, np.float32)
        up = np.full((b, r, s, s, k), 100.0, np.float32)
        boxes = np.asarray(
            [[[0, 0, 9, 9],         # area 100 < th -> small
              [0, 0, 299, 299]]],   # area 90000 >= th -> large
            np.float32,
        )
        out = combine_heatmaps_size_dep(
            [ident, down, up], [False, True, False], [False, False, True],
            boxes, "HM_AVG", area_th=180.0 ** 2,
        )
        # small: avg(ident, up) = 50.5; large: avg(ident, down) = 5.5
        assert out[0, 0, 0, 0, 0] == pytest.approx(50.5)
        assert out[0, 1, 0, 0, 0] == pytest.approx(5.5)

    def test_kps_tta_size_dep_runs(self, tmp_path):
        """KPS_AUG.SCALE_SIZE_DEP=True end-to-end (the reference's
        test_time_aug keypoint config sets it)."""
        import dataclasses as dc

        import jax
        from PIL import Image

        from sad_tpu.eval.test_engine import run_inference_on_roidb
        from sad_tpu.models import create_model
        from sad_tpu.models.model_builder import init_model_params
        from tests.test_rcnn import rcnn_cfg

        cfg = rcnn_cfg(kps=True)
        cfg = dc.replace(
            cfg,
            RESNETS=dc.replace(cfg.RESNETS, CHANNEL_RATIO=0.0625),
            KRCNN=dc.replace(
                cfg.KRCNN, NUM_KEYPOINTS=17, CONV_HEAD_DIM=16,
                NUM_STACKED_CONVS=2,
            ),
            TEST=dc.replace(
                cfg.TEST,
                SCALES=(48,), MAX_SIZE=64, SCORE_THRESH=0.0,
                DETECTIONS_PER_IM=4,
                KPS_AUG=dc.replace(
                    cfg.TEST.KPS_AUG, ENABLED=True, H_FLIP=True,
                    SCALES=(32, 56), MAX_SIZE=64, SCALE_SIZE_DEP=True,
                    AREA_TH=100.0,
                ),
            ),
        )
        model = create_model(cfg)
        params = init_model_params(model, jax.random.PRNGKey(0), (1, 64, 64, 3))
        p = tmp_path / "im.png"
        Image.fromarray(
            np.random.RandomState(0).randint(0, 255, (50, 60, 3), np.uint8)
        ).save(p)
        roidb = [{"id": 1, "image": str(p), "height": 50, "width": 60}]
        dets = run_inference_on_roidb(
            cfg, model, params, roidb, {i: i for i in range(10)},
            batch_size=1,
        )
        for d in dets:
            assert len(d["keypoints"]) == 17 * 3

    def test_nms_oks_and_keypoint_confidence(self, tmp_path):
        """KRCNN.NMS_OKS prunes near-duplicate keypoint sets and
        KEYPOINT_CONFIDENCE='logit' rescores results from the heatmaps
        (test.py keypoint_results + json_dataset_evaluator:376-409)."""
        import dataclasses as dc

        import jax
        from PIL import Image

        from sad_tpu.eval.test_engine import run_inference_on_roidb
        from sad_tpu.models import create_model
        from sad_tpu.models.model_builder import init_model_params
        from tests.test_rcnn import rcnn_cfg

        cfg = rcnn_cfg(kps=True)
        cfg = dc.replace(
            cfg,
            RESNETS=dc.replace(cfg.RESNETS, CHANNEL_RATIO=0.0625),
            KRCNN=dc.replace(
                cfg.KRCNN, NUM_KEYPOINTS=17, CONV_HEAD_DIM=16,
                NUM_STACKED_CONVS=2, NMS_OKS=True,
                KEYPOINT_CONFIDENCE="logit",
            ),
            TEST=dc.replace(
                cfg.TEST,
                SCALES=(48,), MAX_SIZE=64, SCORE_THRESH=0.0,
                DETECTIONS_PER_IM=4,
            ),
        )
        model = create_model(cfg)
        params = init_model_params(model, jax.random.PRNGKey(0), (1, 64, 64, 3))
        p = tmp_path / "im.png"
        Image.fromarray(
            np.random.RandomState(0).randint(0, 255, (50, 60, 3), np.uint8)
        ).save(p)
        roidb = [{"id": 1, "image": str(p), "height": 50, "width": 60}]
        dets = run_inference_on_roidb(
            cfg, model, params, roidb, {i: i for i in range(10)},
            batch_size=1,
        )
        base = run_inference_on_roidb(
            dc.replace(
                cfg, KRCNN=dc.replace(
                    cfg.KRCNN, NMS_OKS=False, KEYPOINT_CONFIDENCE="bbox"
                )
            ),
            model, params, roidb, {i: i for i in range(10)}, batch_size=1,
        )
        # OKS-NMS can only prune
        assert len(dets) <= len(base)
        # the keypoint-task score is kept SEPARATE: det['score'] stays the
        # box score (bbox/segm eval use it), det['kps_score'] carries the
        # logit-mean rescoring (random weights: near-uniform heatmaps ->
        # logit mean differs from the box softmax score)
        for d in dets:
            assert "keypoints" in d
            assert d["kps_score"] != pytest.approx(d["score"])
        for d in base:
            assert d["kps_score"] == pytest.approx(d["score"])  # 'bbox' mode


class TestMeshInference:
    def test_batch_sharded_over_data_axis(self, tmp_path):
        """batch_size divisible by device count -> the engine runs the jitted
        decode over an 8-way 'data' mesh (replacing the reference's
        subprocess sharding)."""
        import dataclasses as dc

        import jax
        from PIL import Image

        from sad_tpu.eval.test_engine import run_inference_on_roidb
        from sad_tpu.models import create_model
        from sad_tpu.models.model_builder import init_model_params
        from tests.test_rcnn import rcnn_cfg

        cfg = rcnn_cfg()
        cfg = dc.replace(
            cfg,
            RESNETS=dc.replace(cfg.RESNETS, CHANNEL_RATIO=0.0625),
            TEST=dc.replace(
                cfg.TEST, SCALES=(48,), MAX_SIZE=64, DETECTIONS_PER_IM=4,
            ),
        )
        model = create_model(cfg)
        params = init_model_params(model, jax.random.PRNGKey(0), (1, 64, 64, 3))
        rng = np.random.RandomState(0)
        roidb = []
        for i in range(8):
            p = tmp_path / f"im{i}.png"
            Image.fromarray(
                rng.randint(0, 255, (50, 60, 3), np.uint8)
            ).save(p)
            roidb.append(
                {"id": i + 1, "image": str(p), "height": 50, "width": 60}
            )
        assert jax.device_count() == 8
        dets = run_inference_on_roidb(
            cfg, model, params, roidb, {i: i for i in range(10)},
            batch_size=8,
        )
        assert isinstance(dets, list)
        ids = {d["image_id"] for d in dets}
        assert ids.issubset(set(range(1, 9)))


class TestProposalRecall:
    def test_perfect_and_missed_proposals(self):
        from sad_tpu.eval.rpn_generator import evaluate_box_proposals

        gt_roidb = [{
            "id": 1,
            "boxes": np.asarray([[10, 10, 40, 40], [50, 50, 90, 80]],
                                np.float32),
            "gt_classes": np.asarray([1, 2], np.int32),
            "is_crowd": np.zeros(2, bool),
        }]
        perfect = {"ids": [1], "scores": [np.ones(2, np.float32)],
                   "boxes": [np.asarray([[10, 10, 40, 40], [50, 50, 90, 80]],
                                        np.float32)]}
        rec = evaluate_box_proposals(perfect, gt_roidb)
        assert rec["ar"] == pytest.approx(1.0)
        assert rec["num_pos"] == 2
        half = {"ids": [1], "scores": [np.ones(1, np.float32)],
                "boxes": [np.asarray([[10, 10, 40, 40]], np.float32)]}
        rec2 = evaluate_box_proposals(half, gt_roidb)
        assert rec2["ar"] == pytest.approx(0.5)
        # limit=0 means no proposals survive
        rec3 = evaluate_box_proposals(perfect, gt_roidb, limit=1)
        assert rec3["ar"] == pytest.approx(0.5)
