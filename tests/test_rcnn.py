"""R-CNN family: proposal ops, multilevel RoIAlign, and the GeneralizedRCNN
forward on a tiny trunk."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sad_tpu.config import Config
from sad_tpu.config.config import merge_cfg_from_dict
from sad_tpu.ops.proposals import (
    collect_and_distribute_fpn_proposals,
    generate_proposals,
    map_rois_to_fpn_levels,
    multilevel_roi_align,
    sample_proposal_labels,
)


def rcnn_cfg(mask=False, kps=False):
    return merge_cfg_from_dict(
        Config(),
        {
            "MODEL": {
                "TYPE": "generalized_rcnn",
                "CONV_BODY": "FPN.add_fpn_ResNet50_conv5_body",
                "NUM_CLASSES": 5,
                "FASTER_RCNN": True,
                "MASK_ON": mask,
                "KEYPOINTS_ON": kps,
            },
            "FPN": {
                "FPN_ON": True,
                "MULTILEVEL_RPN": True,
                "MULTILEVEL_ROIS": True,
                "RPN_MIN_LEVEL": 2,
                "RPN_MAX_LEVEL": 6,
                "ROI_MIN_LEVEL": 2,
                "ROI_MAX_LEVEL": 5,
                "COARSEST_STRIDE": 64,
            },
            "FAST_RCNN": {"MLP_HEAD_DIM": 32, "ROI_XFORM_RESOLUTION": 7},
            "TEST": {
                "RPN_PRE_NMS_TOP_N": 50,
                "RPN_POST_NMS_TOP_N": 20,
                "RPN_NMS_THRESH": 0.7,
            },
            "COMPUTE_DTYPE": "float32",
        },
    )


class TestGenerateProposals:
    def test_decode_topk_nms(self):
        rng = np.random.RandomState(0)
        h = w = 8
        a = 3
        from sad_tpu.data.anchors import field_of_anchors, retinanet_cell_anchors

        cell = retinanet_cell_anchors(3, 4.0, (0.5, 1.0, 2.0), 1)
        anchors = jnp.asarray(field_of_anchors(cell, 8.0, h, w))
        scores = jnp.asarray(rng.uniform(0, 1, (h, w, a)), jnp.float32)
        deltas = jnp.asarray(rng.randn(h, w, a, 4) * 0.1, jnp.float32)
        boxes, sc, valid = jax.jit(
            lambda s, d, an: generate_proposals(
                s, d, an, jnp.asarray([64.0, 64.0]), 40, 10, 0.7
            )
        )(scores, deltas, anchors)
        assert boxes.shape == (10, 4) and valid.any()
        b = np.asarray(boxes)[np.asarray(valid)]
        assert (b[:, 0] >= 0).all() and (b[:, 2] <= 63).all()
        s = np.asarray(sc)[np.asarray(valid)]
        assert (np.diff(s) <= 1e-6).all()  # NMS picks in score order

    def test_min_size_filter(self):
        anchors = jnp.asarray(
            [[[[0, 0, 1.5, 1.5], [10, 10, 40, 40]]]], jnp.float32
        )  # (1,1,2,4)
        scores = jnp.asarray([[[0.9, 0.8]]], jnp.float32)
        deltas = jnp.zeros((1, 1, 2, 4), jnp.float32)
        boxes, sc, valid = generate_proposals(
            scores, deltas, anchors, jnp.asarray([64.0, 64.0]), 2, 2, 0.7,
            min_size=5.0,
        )
        kept = np.asarray(valid)
        # the tiny 1.5px box is filtered despite higher score
        assert kept.sum() == 1
        np.testing.assert_allclose(np.asarray(boxes)[kept][0], [10, 10, 40, 40])


class TestFPNDistribute:
    def test_level_mapping(self):
        boxes = jnp.asarray(
            [
                [0, 0, 55, 55],      # ~56px  -> level 2
                [0, 0, 111, 111],    # ~112px -> level 3
                [0, 0, 223, 223],    # ~224px -> level 4
                [0, 0, 447, 447],    # ~448px -> level 5
                [0, 0, 2000, 2000],  # clipped to 5
            ],
            jnp.float32,
        )
        lvls = map_rois_to_fpn_levels(boxes, 2, 5)
        assert lvls.tolist() == [2, 3, 4, 5, 5]

    def test_collect_takes_global_topk(self):
        lb = {2: jnp.asarray([[0, 0, 10, 10], [0, 0, 20, 20]], jnp.float32),
              3: jnp.asarray([[0, 0, 100, 100], [0, 0, 200, 200]], jnp.float32)}
        ls = {2: jnp.asarray([0.9, 0.1]), 3: jnp.asarray([0.8, 0.5])}
        lv = {2: jnp.asarray([True, True]), 3: jnp.asarray([True, False])}
        boxes, scores, valid, lvls = collect_and_distribute_fpn_proposals(
            lb, ls, lv, 3, 2, 5
        )
        assert scores[0] == pytest.approx(0.9)
        assert scores[1] == pytest.approx(0.8)
        assert valid.tolist() == [True, True, True]
        assert scores[2] == pytest.approx(0.1)  # the invalid 0.5 was dropped


class TestMultilevelRoIAlign:
    def test_selects_per_roi_level(self):
        feats = {
            2: jnp.ones((1, 16, 16, 2)) * 2.0,
            3: jnp.ones((1, 8, 8, 2)) * 3.0,
        }
        rois = jnp.asarray(
            [[0, 0, 0, 31, 31], [0, 0, 0, 31, 31]], jnp.float32
        )
        lvls = jnp.asarray([2, 3], jnp.int32)
        valid = jnp.asarray([True, True])
        out = multilevel_roi_align(feats, rois, lvls, valid, 2, 2)
        np.testing.assert_allclose(np.asarray(out)[0], 2.0)
        np.testing.assert_allclose(np.asarray(out)[1], 3.0)


class TestSampleProposalLabels:
    def test_fg_bg_sampling(self):
        rng = jax.random.PRNGKey(0)
        gt = jnp.asarray([[10, 10, 50, 50], [60, 60, 90, 90], [0, 0, 0, 0]],
                         jnp.float32)
        gt_cls = jnp.asarray([1, 3, 0], jnp.int32)
        props = jnp.asarray(
            [
                [12, 12, 48, 48],   # fg (high IoU with gt0)
                [58, 58, 92, 92],   # fg (gt1)
                [200, 200, 240, 240],  # bg
                [0, 0, 5, 5],       # bg
            ],
            jnp.float32,
        )
        valid = jnp.asarray([True, True, True, True])
        out = sample_proposal_labels(
            rng, props, valid, gt, gt_cls,
            batch_size_per_im=6, fg_fraction=0.5,
            fg_thresh=0.5, bg_thresh_hi=0.5, bg_thresh_lo=0.0,
            num_classes=5,
        )
        labels = np.asarray(out["labels"])
        isfg = np.asarray(out["is_fg"])
        # gt boxes were appended and are themselves fg candidates
        assert isfg.sum() >= 2
        fg_labels = labels[isfg]
        assert set(fg_labels.tolist()) <= {1, 3}
        # fg slots carry nonzero class-specific bbox weights
        w = np.asarray(out["bbox_inside_weights"])
        assert (w[isfg].sum(axis=1) == 4).all()
        assert (w[~isfg] == 0).all()

    def test_fg_slots_are_a_prefix(self):
        """The mask/keypoint branches slice the leading fg_cap slots
        (train/rcnn_train.py); that is only sound while every fg slot
        sorts ahead of every non-fg slot. Pin the invariant over random
        problems."""
        for seed in range(6):
            rng = jax.random.PRNGKey(seed)
            nprng = np.random.RandomState(seed)
            g = 4
            gt = np.zeros((g, 4), np.float32)
            gt[:, :2] = nprng.uniform(0, 150, (g, 2))
            gt[:, 2:] = gt[:, :2] + nprng.uniform(20, 60, (g, 2))
            gt_cls = nprng.randint(1, 5, g).astype(np.int32)
            gt_cls[-1] = 0  # one pad slot
            p = 64
            props = np.zeros((p, 4), np.float32)
            props[:, :2] = nprng.uniform(0, 180, (p, 2))
            props[:, 2:] = props[:, :2] + nprng.uniform(5, 80, (p, 2))
            # overlap some proposals with gt to get real fg
            props[:g] = gt + nprng.uniform(-3, 3, (g, 4)).astype(np.float32)
            valid = nprng.uniform(size=p) < 0.9
            bs, fg_frac = 32, 0.25
            out = sample_proposal_labels(
                rng, jnp.asarray(props), jnp.asarray(valid),
                jnp.asarray(gt), jnp.asarray(gt_cls),
                batch_size_per_im=bs, fg_fraction=fg_frac,
                fg_thresh=0.5, bg_thresh_hi=0.5, bg_thresh_lo=0.0,
                num_classes=5,
            )
            isfg = np.asarray(out["is_fg"])
            n_fg = int(isfg.sum())
            fg_cap = int(round(fg_frac * bs))
            assert n_fg <= fg_cap
            # every fg slot lives in the leading n_fg (hence fg_cap) slots
            assert isfg[:n_fg].all() and not isfg[n_fg:].any()


class TestGeneralizedRCNN:
    def test_forward_shapes(self):
        cfg = rcnn_cfg(mask=True, kps=True)
        # tiny trunk via arch channel ratio
        cfg = dataclasses.replace(
            cfg, RESNETS=dataclasses.replace(cfg.RESNETS, CHANNEL_RATIO=0.0625)
        )
        from sad_tpu.models import create_model

        model = create_model(cfg)
        images = jnp.zeros((2, 64, 64, 3), jnp.float32)
        im_hw = jnp.asarray([[64, 64], [60, 50]], jnp.float32)
        params = model.init(jax.random.PRNGKey(0), images, im_hw)["params"]
        out = model.apply({"params": params}, images, im_hw)
        r = cfg.TEST.RPN_POST_NMS_TOP_N
        assert out["rois"].shape == (2, r, 4)
        assert out["cls_prob"].shape == (2, r, 5)
        assert out["bbox_pred"].shape == (2, r, 20)
        np.testing.assert_allclose(
            np.asarray(out["cls_prob"]).sum(-1), 1.0, rtol=1e-4
        )
