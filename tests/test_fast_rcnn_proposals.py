"""Pure Fast R-CNN (MODEL.FASTER_RCNN False): training and inference from
precomputed proposals — the reference's selective-search / two-stage-RPN
workflow (roi_data/fast_rcnn.py sampling on entry['boxes'] proposals,
test.py im_detect_bbox with a `boxes` input, TRAIN/TEST.PROPOSAL_FILES)."""

import dataclasses
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_rcnn import rcnn_cfg


def _fast_cfg():
    cfg = rcnn_cfg()
    cfg = dataclasses.replace(
        cfg,
        MODEL=dataclasses.replace(cfg.MODEL, FASTER_RCNN=False),
        RESNETS=dataclasses.replace(cfg.RESNETS, CHANNEL_RATIO=0.0625),
        TRAIN=dataclasses.replace(
            cfg.TRAIN,
            SCALES=(64,), MAX_SIZE=128,
            BATCH_SIZE_PER_IM=8, IMS_PER_BATCH=2,
        ),
    )
    return cfg


def _entries(with_props=True):
    rng = np.random.RandomState(0)
    entries = []
    for i in range(2):
        boxes = np.asarray([[8, 8, 40, 40], [20, 20, 60, 56]], np.float32)
        e = {
            "id": i + 1, "width": 100, "height": 80, "flipped": False,
            "boxes": boxes,
            "gt_classes": np.asarray([1, 3], np.int32),
            "is_crowd": np.zeros(2, bool),
            "segms": [None, None],
        }
        if with_props:
            p = rng.uniform(0, 60, (30, 2))
            wh = rng.uniform(8, 30, (30, 2))
            e["proposal_boxes"] = np.concatenate(
                [p, np.minimum(p + wh, [99, 79])], axis=1
            ).astype(np.float32)
        entries.append(e)
    return entries


def _build_batch(cfg):
    from sad_tpu.data.rpn_minibatch import RCNNMinibatchBuilder

    import os
    import tempfile

    from PIL import Image

    builder = RCNNMinibatchBuilder(cfg, max_gt=8, max_proposals=40)
    d = tempfile.mkdtemp(prefix="fastrcnn_")
    rng = np.random.RandomState(1)
    entries = _entries()
    for i, e in enumerate(entries):
        p = os.path.join(d, f"{i}.png")
        Image.fromarray(rng.randint(0, 255, (80, 100, 3), np.uint8)).save(p)
        e["image"] = p
    return builder.build(entries, seed=0), entries


class TestBuilder:
    def test_proposals_in_batch_no_rpn_targets(self):
        cfg = _fast_cfg()
        batch, entries = _build_batch(cfg)
        assert "rpn_labels" not in batch
        assert batch["proposal_boxes"].shape == (2, 40, 4)
        assert batch["proposal_valid"][:, :30].all()
        assert not batch["proposal_valid"][:, 30:].any()
        # proposals scaled like gt (shortest side 80 -> 64: x0.8)
        np.testing.assert_allclose(
            batch["proposal_boxes"][0, 0],
            entries[0]["proposal_boxes"][0] * 0.8,
            rtol=1e-5,
        )


class TestTrainStep:
    def test_step_without_rpn(self):
        cfg = _fast_cfg()
        from sad_tpu.models import create_model
        from sad_tpu.models.model_builder import init_model_params
        from sad_tpu.train import TrainState, init_momentum_state
        from sad_tpu.train.rcnn_train import make_rcnn_train_step

        batch, _ = _build_batch(cfg)
        batch = jax.tree_util.tree_map(jnp.asarray, batch)
        _, ch, cw, _ = batch["data"].shape
        model = create_model(cfg)
        params = init_model_params(model, jax.random.PRNGKey(0), (1, ch, cw, 3))
        step = jax.jit(make_rcnn_train_step(cfg, model, n_groups=1))
        state = TrainState(params, init_momentum_state(params).velocity)
        new_state, metrics = step(
            state, batch, jnp.float32(1e-4), jax.random.PRNGKey(1)
        )
        assert np.isfinite(float(metrics["loss"]))
        assert "loss_cls" in metrics and "loss_bbox" in metrics
        assert not any(k.startswith("loss_rpn") for k in metrics)
        # box head moved; RPN head must NOT move (no gradient path)
        moved_box = np.any(
            np.asarray(params["box_head"]["fc6"]["kernel"])
            != np.asarray(new_state.params["box_head"]["fc6"]["kernel"])
        )
        assert moved_box
        # the unused RPN head receives no gradient: its update reduces to
        # the pure weight-decay/momentum term, i.e. a uniform rescale of
        # the kernel (lr*wd is tiny, so allow only a multiplicative change)
        k_old = np.asarray(params["rpn"]["conv_rpn_fpn2"]["kernel"])
        k_new = np.asarray(new_state.params["rpn"]["conv_rpn_fpn2"]["kernel"])
        nz = np.abs(k_old) > 1e-6
        ratios = k_new[nz] / k_old[nz]
        assert np.allclose(ratios, ratios.flat[0], atol=1e-5)


class TestInference:
    def test_infer_on_proposals(self):
        cfg = _fast_cfg()
        from sad_tpu.eval.rcnn_inference import make_rcnn_inference_fn
        from sad_tpu.models import create_model
        from sad_tpu.models.model_builder import init_model_params

        model = create_model(cfg)
        params = init_model_params(model, jax.random.PRNGKey(0), (1, 64, 64, 3))
        infer = make_rcnn_inference_fn(cfg, model)
        rng = np.random.RandomState(0)
        images = jnp.asarray(rng.randn(2, 64, 64, 3), jnp.float32)
        im_hw = jnp.asarray([[64, 64], [60, 50]], jnp.float32)
        scale = jnp.asarray([1.0, 1.0], jnp.float32)
        p = rng.uniform(0, 40, (2, 20, 2))
        wh = rng.uniform(4, 20, (2, 20, 2))
        props = jnp.asarray(
            np.concatenate([p, np.minimum(p + wh, 63)], axis=2), jnp.float32
        )
        valid = jnp.ones((2, 20), bool)
        out = infer(params, images, im_hw, scale, None, props, valid)
        k = cfg.TEST.DETECTIONS_PER_IM
        assert out["boxes"].shape == (2, k, 4)
        assert out["scores"].shape == (2, k)


class TestEngineAndLoop:
    def test_test_net_with_proposal_file(self, tmp_path):
        """test_net_on_dataset consumes TEST.PROPOSAL_FILES end-to-end."""
        import json as _json

        from PIL import Image

        from sad_tpu.config import register_dataset
        from sad_tpu.config.config import merge_cfg_from_dict

        img_dir = tmp_path / "images"
        img_dir.mkdir()
        rng = np.random.RandomState(0)
        images, anns = [], []
        ids = []
        for i in range(1, 3):
            arr = rng.randint(0, 255, (64, 96, 3), dtype=np.uint8)
            Image.fromarray(arr).save(img_dir / f"{i:06d}.jpg")
            images.append(
                {"id": i, "file_name": f"{i:06d}.jpg", "height": 64, "width": 96}
            )
            anns.append(
                {"id": i, "image_id": i, "category_id": 1,
                 "bbox": [8, 10, 32, 20], "area": 640, "iscrowd": 0}
            )
            ids.append(i)
        ann_file = tmp_path / "instances.json"
        with open(ann_file, "w") as f:
            _json.dump(
                {"images": images, "annotations": anns,
                 "categories": [{"id": 1, "name": "red"}]}, f,
            )
        register_dataset(
            "fast_prop_synth", str(img_dir), str(ann_file), allow_override=True
        )
        register_dataset(
            "fast_prop_other", str(img_dir), str(ann_file), allow_override=True
        )
        # selective-search style proposal file {'ids','boxes','scores'}
        boxes = [
            np.asarray(
                [[5, 5, 50, 40], [10, 12, 44, 33], [20, 20, 80, 55]],
                np.float32,
            )
            for _ in ids
        ]
        prop_file = tmp_path / "props.pkl"
        with open(prop_file, "wb") as f:
            pickle.dump(
                {"ids": ids, "boxes": boxes,
                 "scores": [np.ones(3, np.float32) for _ in ids]}, f,
            )

        cfg = _fast_cfg()
        cfg = merge_cfg_from_dict(
            cfg,
            {
                "MODEL": {"NUM_CLASSES": 2},
                "TEST": {
                    "SCALES": (64,), "MAX_SIZE": 128,
                    "DATASETS": ("fast_prop_synth",),
                    "PROPOSAL_FILES": (str(prop_file),),
                    "PROPOSAL_LIMIT": 8,
                },
                "COMPUTE_DTYPE": "float32",
            },
        )
        from sad_tpu.eval.test_engine import test_net_on_dataset
        from sad_tpu.models import create_model
        from sad_tpu.models.model_builder import init_model_params

        model = create_model(cfg)
        params = init_model_params(model, jax.random.PRNGKey(0), (1, 64, 128, 3))
        results = test_net_on_dataset(cfg, model, params, batch_size=2)
        assert "AP" in results  # random weights: AP 0.0 is fine

        # --range slicing (ref test_net.py --range): evaluate image [0, 1)
        r1 = test_net_on_dataset(
            cfg, model, params, batch_size=2, im_range=(0, 1)
        )
        assert "AP" in r1

        # evaluating a dataset with no matching TEST.DATASETS entry must
        # refuse (a wrong proposal file silently yields zero proposals)
        with pytest.raises(ValueError, match="not in"):
            test_net_on_dataset(
                cfg, model, params, dataset_name="fast_prop_other",
                batch_size=2,
            )

        # TTA passes must thread (flipped) proposals through too — this
        # crashed before proposals were wired into the bbox-aug pass
        cfg_aug = merge_cfg_from_dict(
            cfg, {"TEST": {"BBOX_AUG": {"ENABLED": True, "H_FLIP": True}}}
        )
        results_aug = test_net_on_dataset(cfg_aug, model, params, batch_size=2)
        assert "AP" in results_aug


class TestAddProposals:
    def test_clip_dedup_minsize_crowd(self, tmp_path):
        """add_proposals_to_roidb mirrors _add_proposals_from_file: clip to
        image, dedup, min-size filter, crowd exclusion (json_dataset.py)."""
        from sad_tpu.eval.rpn_generator import add_proposals_to_roidb

        boxes = np.asarray(
            [
                [10, 10, 40, 40],     # kept
                [10, 10, 40, 40],     # duplicate -> dropped
                [-5, -5, 200, 300],   # clipped to (0,0,99,59)
                [5, 5, 6, 5],         # 2x1 after +1 extents -> too small
                [52, 22, 76, 46],     # inside the crowd region -> dropped
            ],
            np.float32,
        )
        pf = tmp_path / "p.pkl"
        with open(pf, "wb") as f:
            pickle.dump({"ids": [7], "boxes": [boxes]}, f)
        entry = {
            "id": 7, "width": 100, "height": 60,
            "boxes": np.asarray(
                [[10, 10, 40, 40], [50, 20, 80, 50]], np.float32
            ),
            "gt_classes": np.asarray([1, 1], np.int32),
            "is_crowd": np.asarray([False, True]),
        }
        add_proposals_to_roidb([entry], str(pf), crowd_thresh=0.7)
        got = entry["proposal_boxes"]
        assert got.shape == (2, 4)
        np.testing.assert_allclose(got[0], [10, 10, 40, 40])
        np.testing.assert_allclose(got[1], [0, 0, 99, 59])

        # crowd_thresh=0 (eval semantics) keeps the crowd-inside proposal
        entry2 = dict(entry)
        add_proposals_to_roidb([entry2], str(pf))
        assert entry2["proposal_boxes"].shape == (3, 4)


class TestVOCDispatch:
    def test_voc_dataset_routes_to_voc_protocol(self, tmp_path, monkeypatch):
        """voc_* datasets use the VOC evaluator unless
        TEST.FORCE_JSON_DATASET_EVAL (ref task_evaluation.py:253)."""
        import json as _json

        from PIL import Image

        from sad_tpu.config import register_dataset
        from sad_tpu.config.config import merge_cfg_from_dict
        from sad_tpu.eval.test_engine import test_net_on_dataset

        img_dir = tmp_path / "img"
        img_dir.mkdir()
        Image.fromarray(
            np.random.RandomState(0).randint(0, 255, (64, 96, 3), np.uint8)
        ).save(img_dir / "000001.jpg")
        ann = {
            "images": [{"id": 1, "file_name": "000001.jpg",
                        "height": 64, "width": 96}],
            "annotations": [{"id": 1, "image_id": 1, "category_id": 1,
                             "bbox": [8, 10, 32, 20], "area": 640,
                             "iscrowd": 0}],
            "categories": [{"id": 1, "name": "red"}],
        }
        af = tmp_path / "voc.json"
        af.write_text(_json.dumps(ann))
        register_dataset(
            "voc_2007_synthtest", str(img_dir), str(af), allow_override=True
        )
        cfg = _fast_cfg()
        cfg = merge_cfg_from_dict(
            cfg,
            {"MODEL": {"NUM_CLASSES": 2, "FASTER_RCNN": True},
             "TEST": {"SCALES": (64,), "MAX_SIZE": 128,
                      "DATASETS": ("voc_2007_synthtest",)},
             "COMPUTE_DTYPE": "float32"},
        )
        from sad_tpu.models import create_model
        from sad_tpu.models.model_builder import init_model_params

        model = create_model(cfg)
        params = init_model_params(
            model, jax.random.PRNGKey(0), (1, 64, 128, 3)
        )
        res = test_net_on_dataset(cfg, model, params, batch_size=1)
        # the VOC protocol reports mAP (per-class AP mean), not COCO AP50/75
        assert "mAP" in res or "AP" in res
        assert "AP75" not in res


class TestPadProposals:
    def test_hflip_mirrors_on_raw_width(self):
        from sad_tpu.data.rpn_minibatch import pad_proposals

        entries = [{
            "width": 100, "height": 60,
            "proposal_boxes": np.asarray([[10, 5, 29, 25]], np.float32),
        }]
        props, valid = pad_proposals(entries, 4, [2.0], hflip=True)
        # x1' = w - x2 - 1 = 70, x2' = w - x1 - 1 = 89, then x im_scale
        np.testing.assert_allclose(props[0, 0], [140.0, 10.0, 178.0, 50.0])
        assert valid[0].tolist() == [True, False, False, False]
        # double flip = identity
        back, _ = pad_proposals(
            [dict(entries[0], proposal_boxes=props[0, :1] / 2.0)],
            4, [1.0], hflip=True,
        )
        np.testing.assert_allclose(back[0, 0], entries[0]["proposal_boxes"][0])
