"""COCO evaluator + NMS + decode tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sad_tpu.eval.coco_eval import COCOEvaluator
from sad_tpu.ops.nms import batched_nms, nms_fixed


def _gt_dataset():
    images = [{"id": 1, "height": 100, "width": 100},
              {"id": 2, "height": 100, "width": 100}]
    cats = [{"id": 1, "name": "a"}, {"id": 3, "name": "b"}]
    anns = [
        {"id": 1, "image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 20],
         "area": 400, "iscrowd": 0},
        {"id": 2, "image_id": 1, "category_id": 3, "bbox": [50, 50, 30, 30],
         "area": 900, "iscrowd": 0},
        {"id": 3, "image_id": 2, "category_id": 1, "bbox": [5, 5, 40, 40],
         "area": 1600, "iscrowd": 0},
    ]
    return {"images": images, "categories": cats, "annotations": anns}


class TestCOCOEvaluator:
    def test_perfect_detections_ap_1(self):
        gt = _gt_dataset()
        dets = [
            {"image_id": a["image_id"], "category_id": a["category_id"],
             "bbox": a["bbox"], "score": 0.9}
            for a in gt["annotations"]
        ]
        res = COCOEvaluator(gt).evaluate(dets)
        assert res["AP"] == pytest.approx(1.0)
        assert res["AP50"] == pytest.approx(1.0)
        assert res["AR100"] == pytest.approx(1.0)

    def test_missing_detection_halves_recall(self):
        gt = _gt_dataset()
        dets = [
            {"image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 20], "score": 0.9},
            {"image_id": 1, "category_id": 3, "bbox": [50, 50, 30, 30], "score": 0.9},
            # image 2's cat-1 gt is missed
        ]
        res = COCOEvaluator(gt).evaluate(dets)
        # cat 1: 1 of 2 recalled -> AP ~ 0.5 (101-pt); cat 3 perfect
        assert 0.7 < res["AP"] < 0.8

    def test_false_positive_lowers_precision(self):
        gt = _gt_dataset()
        dets = [
            {"image_id": a["image_id"], "category_id": a["category_id"],
             "bbox": a["bbox"], "score": 0.9}
            for a in gt["annotations"]
        ]
        # a high-scoring FP for cat 1 in image 2
        dets.append(
            {"image_id": 2, "category_id": 1, "bbox": [70, 70, 10, 10], "score": 0.95}
        )
        res = COCOEvaluator(gt).evaluate(dets)
        assert res["AP"] < 1.0
        assert res["AR100"] == pytest.approx(1.0)  # recall unaffected

    def test_crowd_matches_are_not_fp(self):
        gt = _gt_dataset()
        gt["annotations"].append(
            {"id": 4, "image_id": 2, "category_id": 3,
             "bbox": [60, 60, 30, 30], "area": 900, "iscrowd": 1}
        )
        dets = [
            {"image_id": a["image_id"], "category_id": a["category_id"],
             "bbox": a["bbox"], "score": 0.9}
            for a in gt["annotations"] if not a["iscrowd"]
        ]
        # det fully inside the crowd region: should be ignored, not FP
        dets.append(
            {"image_id": 2, "category_id": 3, "bbox": [62, 62, 20, 20], "score": 0.99}
        )
        res = COCOEvaluator(gt).evaluate(dets)
        assert res["AP"] == pytest.approx(1.0)

    def test_localization_quality_graded_by_iou(self):
        gt = _gt_dataset()
        # shifted boxes: IoU ~0.6 -> count at IoU<=0.6 thresholds only
        dets = []
        for a in gt["annotations"]:
            x, y, w, h = a["bbox"]
            dets.append(
                {"image_id": a["image_id"], "category_id": a["category_id"],
                 "bbox": [x + 0.25 * w, y, w, h], "score": 0.9}
            )
        res = COCOEvaluator(gt).evaluate(dets)
        assert res["AP50"] == pytest.approx(1.0)
        assert res["AP75"] == pytest.approx(0.0)
        assert 0.2 < res["AP"] < 0.5


class TestNMS:
    def test_greedy_nms_matches_numpy_reference(self):
        rng = np.random.RandomState(0)
        n = 200
        xy = rng.uniform(0, 80, (n, 2))
        wh = rng.uniform(5, 40, (n, 2))
        boxes = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
        scores = rng.uniform(0.1, 1.0, n).astype(np.float32)

        # plain numpy greedy NMS oracle (legacy +1 convention)
        def np_nms(b, s, th):
            order = np.argsort(-s)
            keep = []
            sup = np.zeros(n, bool)
            for i in order:
                if sup[i]:
                    continue
                keep.append(i)
                iw = (np.minimum(b[i, 2], b[:, 2]) - np.maximum(b[i, 0], b[:, 0]) + 1).clip(0)
                ih = (np.minimum(b[i, 3], b[:, 3]) - np.maximum(b[i, 1], b[:, 1]) + 1).clip(0)
                inter = iw * ih
                a1 = (b[i, 2] - b[i, 0] + 1) * (b[i, 3] - b[i, 1] + 1)
                a2 = (b[:, 2] - b[:, 0] + 1) * (b[:, 3] - b[:, 1] + 1)
                iou = inter / (a1 + a2 - inter)
                sup |= iou > th
            return keep

        ref = np_nms(boxes, scores, 0.5)
        idx, valid = jax.jit(lambda b, s: nms_fixed(b, s, 0.5, 100))(boxes, scores)
        got = [int(i) for i, v in zip(np.asarray(idx), np.asarray(valid)) if v]
        assert got == ref[:100]

    def test_batched_nms_separates_classes(self):
        boxes = jnp.asarray(
            [[0, 0, 10, 10], [1, 1, 11, 11], [0, 0, 10, 10]], jnp.float32
        )
        scores = jnp.asarray([0.9, 0.8, 0.7], jnp.float32)
        classes = jnp.asarray([0, 0, 1], jnp.int32)
        valid = jnp.asarray([True, True, True])
        idx, v = batched_nms(boxes, scores, classes, valid, 0.5, 3)
        kept = [int(i) for i, vv in zip(np.asarray(idx), np.asarray(v)) if vv]
        # box 1 suppressed by box 0 (same class, IoU>0.5); box 2 survives
        assert kept == [0, 2]


class TestSegmEval:
    def test_perfect_masks_ap_1(self):
        from sad_tpu.utils.segms import mask_to_rle
        import numpy as np

        def box_mask(x, y, w, h, H=50, W=50):
            m = np.zeros((H, W), np.uint8)
            m[y:y + h, x:x + w] = 1
            return m

        gt = {
            "images": [{"id": 1, "height": 50, "width": 50}],
            "categories": [{"id": 1, "name": "a"}],
            "annotations": [
                {"id": 1, "image_id": 1, "category_id": 1,
                 "bbox": [10, 10, 20, 20], "area": 400, "iscrowd": 0,
                 "segmentation": mask_to_rle(box_mask(10, 10, 20, 20))},
            ],
        }
        dets = [
            {"image_id": 1, "category_id": 1, "score": 0.9,
             "bbox": [10, 10, 20, 20],
             "segmentation": mask_to_rle(box_mask(10, 10, 20, 20))}
        ]
        from sad_tpu.eval.coco_eval import COCOEvaluator

        res = COCOEvaluator(gt, iou_type="segm").evaluate(dets)
        assert res["AP"] == pytest.approx(1.0)
        # a shifted mask has IoU ~0.5 -> only low thresholds count
        dets2 = [
            {"image_id": 1, "category_id": 1, "score": 0.9,
             "bbox": [16, 10, 20, 20],
             "segmentation": mask_to_rle(box_mask(16, 10, 20, 20))}
        ]
        res2 = COCOEvaluator(gt, iou_type="segm").evaluate(dets2)
        assert res2["AP50"] == pytest.approx(1.0)
        assert res2["AP75"] == pytest.approx(0.0)


class TestKeypointEval:
    def test_oks_perfect_and_shifted(self):
        gt = {
            "images": [{"id": 1, "height": 100, "width": 100}],
            "categories": [{"id": 1, "name": "person"}],
            "annotations": [
                {"id": 1, "image_id": 1, "category_id": 1,
                 "bbox": [10, 10, 40, 40], "area": 1600, "iscrowd": 0,
                 "keypoints": [20, 20, 2, 30, 30, 2, 40, 40, 2]},
            ],
        }
        perfect = [{"image_id": 1, "category_id": 1, "score": 0.9,
                    "bbox": [10, 10, 40, 40],
                    "keypoints": [20, 20, 2, 30, 30, 2, 40, 40, 2]}]
        ev = COCOEvaluator(gt, iou_type="keypoints")
        # keypoint-task protocol params (pycocotools): maxDets [20],
        # all/medium/large areas only
        assert ev.max_dets == (20,)
        assert "small" not in ev.area_rngs
        res = ev.evaluate(perfect)
        assert res["AP"] == pytest.approx(1.0)
        # Keypoint summarize emits the pycocotools keypoint stat set:
        # everything at maxDets=20 (AR, AR50, AR75), never AR1/AR10/AR100
        # silently computed at a different maxDets.
        assert set(res) == {"AP", "AP50", "AP75", "APm", "APl",
                            "AR", "AR50", "AR75", "ARm", "ARl"}
        assert res["AR"] == pytest.approx(1.0)
        far = [{"image_id": 1, "category_id": 1, "score": 0.9,
                "bbox": [10, 10, 40, 40],
                "keypoints": [80, 80, 2, 90, 90, 2, 95, 95, 2]}]
        res2 = COCOEvaluator(gt, iou_type="keypoints").evaluate(far)
        assert res2["AP"] == pytest.approx(0.0)


def test_uint8_device_normalize_matches_host_f32():
    """Shipping uint8 canvases + normalizing on device (content-extent
    masked) must be bit-identical to the host-normalized f32 path."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from tests.test_model_and_train import tiny_arch, tiny_cfg
    from sad_tpu.data.minibatch import normalize_image
    from sad_tpu.eval.inference import make_inference_fn
    from sad_tpu.models import RetinaNet
    from sad_tpu.models.model_builder import init_model_params

    cfg = dataclasses.replace(
        tiny_cfg(),
        PIXEL_MEANS=(20.0, 30.0, 40.0),
        PIXEL_DIV=2.0,
        PIXEL_STD=(3.0, 4.0, 5.0),
    )
    model = RetinaNet(tiny_arch())
    H = W = 128
    params = init_model_params(model, jax.random.PRNGKey(0), (1, H, W, 3))
    rng = np.random.RandomState(0)

    # two images with different content extents on the canvas
    u8 = np.zeros((2, H, W, 3), np.uint8)
    content = np.asarray([[96, 128], [128, 80]], np.float32)
    for i, (h, w) in enumerate(content.astype(int)):
        u8[i, :h, :w] = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
    f32 = np.zeros((2, H, W, 3), np.float32)
    for i, (h, w) in enumerate(content.astype(int)):
        f32[i, :h, :w] = normalize_image(
            u8[i, :h, :w], cfg.PIXEL_MEANS, cfg.PIXEL_DIV, cfg.PIXEL_STD
        )

    im_hw = jnp.asarray(content)  # treat content as the original size
    im_scale = jnp.ones((2,), jnp.float32)
    infer = make_inference_fn(cfg, model)
    out_f32 = infer(params, jnp.asarray(f32), im_hw, im_scale)
    out_u8 = infer(
        params, jnp.asarray(u8), im_hw, im_scale, jnp.asarray(content)
    )
    for k in ("boxes", "scores", "classes", "valid"):
        np.testing.assert_array_equal(
            np.asarray(out_f32[k]), np.asarray(out_u8[k]), err_msg=k
        )
