"""On-device mask/keypoint target extraction + losses (train/mask_keypoint)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sad_tpu.config import Config
from sad_tpu.config.config import merge_cfg_from_dict
from sad_tpu.train.mask_keypoint import (
    keypoint_loss,
    keypoint_targets_on_device,
    mask_loss,
    mask_targets_on_device,
)


class TestMaskTargets:
    def test_crop_matches_raster(self):
        # gt raster: a filled square at stride 4
        g, hm, wm = 2, 32, 32
        rasters = np.zeros((g, hm, wm), np.float32)
        rasters[0, 4:12, 4:12] = 1.0  # gt 0: box (16..47) at stride 4
        rasters[1, 20:28, 20:28] = 1.0
        rois = jnp.asarray([[16, 16, 47, 47], [80, 80, 111, 111]], jnp.float32)
        matched = jnp.asarray([0, 1], jnp.int32)
        t = mask_targets_on_device(
            jnp.asarray(rasters), rois, matched, resolution=8, mask_stride=4.0
        )
        assert t.shape == (2, 8, 8)
        # roi 0 exactly covers gt 0's square -> nearly full target
        assert float(t[0].mean()) > 0.8
        assert float(t[1].mean()) > 0.8
        # mismatched roi/gt -> empty
        t2 = mask_targets_on_device(
            jnp.asarray(rasters), rois, jnp.asarray([1, 0], jnp.int32), 8, 4.0
        )
        assert float(t2[0].sum()) == 0.0

    def test_mask_loss_perfect_prediction_is_small(self):
        cfg = merge_cfg_from_dict(Config(), {"MODEL": {"NUM_CLASSES": 3}})
        r, m = 4, 8
        targets = jnp.asarray(
            (np.random.RandomState(0).uniform(size=(r, m, m)) < 0.5), jnp.float32
        )
        logits = (targets * 2 - 1)[..., None] * 20.0  # confident per class 0
        logits = jnp.broadcast_to(logits, (r, m, m, 3))
        labels = jnp.asarray([1, 2, 1, 2], jnp.int32)
        is_fg = jnp.asarray([True, True, True, False])
        loss_good = mask_loss(cfg, logits, targets, labels, is_fg, 1)
        loss_bad = mask_loss(cfg, -logits, targets, labels, is_fg, 1)
        assert float(loss_good) < 1e-3
        assert float(loss_bad) > 1.0


class TestKeypointTargets:
    def test_heatmap_label_indices(self):
        kp = np.zeros((2, 3, 3), np.float32)
        kp[0, 0] = [20, 30, 2]   # visible
        kp[0, 1] = [0, 0, 0]     # invisible
        kp[0, 2] = [500, 500, 2]  # outside roi
        rois = jnp.asarray([[10, 10, 90, 90]], jnp.float32)
        labels, valid = keypoint_targets_on_device(
            jnp.asarray(kp), rois, jnp.asarray([0], jnp.int32), heatmap_size=8
        )
        assert valid[0].tolist() == [True, False, False]
        # x=20 -> (20-10)*8/80 = 1; y=30 -> 2 -> index 2*8+1
        assert int(labels[0, 0]) == 17

    def test_keypoint_loss_prefers_correct_peak(self):
        cfg = merge_cfg_from_dict(
            Config(),
            {"MODEL": {"NUM_CLASSES": 2},
             # 2 visible kps in this toy batch; disable the validity gate
             "KRCNN": {"MIN_KEYPOINT_COUNT_FOR_VALID_MINIBATCH": 0}},
        )
        r, s, k = 1, 4, 2
        labels = jnp.asarray([[5, 9]], jnp.int32)
        valid = jnp.asarray([[True, True]])
        is_fg = jnp.asarray([True])
        logits = np.zeros((r, s, s, k), np.float32)
        logits[0, 1, 1, 0] = 10.0  # index 5 for kp 0
        logits[0, 2, 1, 1] = 10.0  # index 9 for kp 1
        good = keypoint_loss(cfg, jnp.asarray(logits), labels, valid, is_fg, 1)
        bad = keypoint_loss(cfg, jnp.asarray(-logits), labels, valid, is_fg, 1)
        assert float(good) < 0.01
        assert float(bad) > 1.0


class TestKeypointLossNormalization:
    def test_fixed_denominator_matches_reference_formula(self):
        """NORMALIZE_BY_VISIBLE off: loss = sum(nll*w) / (IMS*BS*FG_FRAC*K)
        (ref: keypoint_rcnn.py:105-110 normalizer x visible-mean loss)."""
        import dataclasses

        import jax
        import jax.numpy as jnp

        from sad_tpu.config import Config
        from sad_tpu.train.mask_keypoint import keypoint_loss

        cfg = Config()
        # the fixed-denominator path is the NON-default
        # NORMALIZE_BY_VISIBLE_KEYPOINTS=False branch (ref config.py:866)
        cfg = dataclasses.replace(
            cfg, KRCNN=dataclasses.replace(
                cfg.KRCNN, NORMALIZE_BY_VISIBLE_KEYPOINTS=False
            )
        )
        r, s, k = 8, 4, cfg.KRCNN.NUM_KEYPOINTS
        rng = np.random.RandomState(0)
        logits = jnp.asarray(rng.randn(r, s, s, k), jnp.float32)
        labels = jnp.asarray(rng.randint(0, s * s, (r, k)), jnp.int32)
        valid = jnp.asarray(rng.rand(r, k) > 0.5)
        is_fg = jnp.asarray([True] * 4 + [False] * 4)

        # the fixed denominator is per-IMAGE (IMS*BATCH_SIZE_PER_IM*FG*K),
        # independent of how many roi rows reach the head
        n_images = 2
        loss = float(
            keypoint_loss(cfg, logits, labels, valid, is_fg, 1, n_images)
        )

        flat = np.asarray(logits).reshape(r, s * s, k).transpose(0, 2, 1)
        logp = np.asarray(jax.nn.log_softmax(jnp.asarray(flat), axis=-1))
        nll = -np.take_along_axis(
            logp, np.asarray(labels)[..., None], axis=-1
        )[..., 0]
        w = np.asarray(valid) & np.asarray(is_fg)[:, None]
        expect = (
            cfg.KRCNN.LOSS_WEIGHT * (nll * w).sum()
            / (n_images * cfg.TRAIN.BATCH_SIZE_PER_IM
               * cfg.TRAIN.FG_FRACTION * k)
        )
        assert loss == pytest.approx(expect, rel=1e-5)

        # omitting n_images on this branch is an error, not a silent guess
        with pytest.raises(ValueError):
            keypoint_loss(cfg, logits, labels, valid, is_fg, 1)

        # visible-normalized variant (the default) divides by visible count
        cfg_v = Config()
        loss_v = float(keypoint_loss(cfg_v, logits, labels, valid, is_fg, 1))
        assert loss_v == pytest.approx(
            cfg.KRCNN.LOSS_WEIGHT * (nll * w).sum() / max(w.sum(), 1),
            rel=1e-5,
        )

    def test_group_semantics_average_per_group_means(self):
        """n_groups>1 reproduces the reference's allreduce-sum of per-GPU
        1/G-scaled losses: the average of per-group values."""
        cfg = Config()
        rng = np.random.RandomState(2)
        r, s, k = 8, 4, cfg.KRCNN.NUM_KEYPOINTS
        logits = jnp.asarray(rng.randn(r, s, s, k), jnp.float32)
        labels = jnp.asarray(rng.randint(0, s * s, (r, k)), jnp.int32)
        # unequal visible counts per group — the case a global mean gets wrong
        valid = jnp.asarray(rng.rand(r, k) > np.linspace(0.1, 0.9, r)[:, None])
        is_fg = jnp.ones(r, bool)
        whole = float(keypoint_loss(cfg, logits, labels, valid, is_fg, 2))
        halves = [
            float(keypoint_loss(
                cfg, logits[i:i + 4], labels[i:i + 4], valid[i:i + 4],
                is_fg[i:i + 4], 1,
            ))
            for i in (0, 4)
        ]
        assert whole == pytest.approx(sum(halves) / 2, rel=1e-5)

    def test_mask_loss_group_semantics(self):
        from sad_tpu.train.mask_keypoint import mask_loss

        cfg = merge_cfg_from_dict(Config(), {"MODEL": {"NUM_CLASSES": 3}})
        rng = np.random.RandomState(3)
        r, m = 8, 8
        logits = jnp.asarray(rng.randn(r, m, m, 3), jnp.float32)
        targets = jnp.asarray(rng.rand(r, m, m) < 0.5, jnp.float32)
        labels = jnp.asarray(rng.randint(1, 3, r), jnp.int32)
        # unequal fg counts per group
        is_fg = jnp.asarray([True] * 4 + [True, False, False, False])
        whole = float(mask_loss(cfg, logits, targets, labels, is_fg, 2))
        halves = [
            float(mask_loss(
                cfg, logits[i:i + 4], targets[i:i + 4], labels[i:i + 4],
                is_fg[i:i + 4], 1,
            ))
            for i in (0, 4)
        ]
        assert whole == pytest.approx(sum(halves) / 2, rel=1e-5)


class TestKeypointMinibatchGate:
    def test_too_few_visible_keypoints_zeroes_loss(self):
        """ref: keypoint_rcnn.py:94-103 finalize_keypoint_minibatch."""
        from sad_tpu.config import Config
        from sad_tpu.train.mask_keypoint import keypoint_loss

        cfg = Config()  # gate at 20 visible keypoints
        r, s, k = 2, 4, 17
        rng = np.random.RandomState(1)
        logits = jnp.asarray(rng.randn(r, s, s, k), jnp.float32)
        labels = jnp.asarray(rng.randint(0, s * s, (r, k)), jnp.int32)
        is_fg = jnp.asarray([True, True])
        few = jnp.asarray(np.arange(r * k).reshape(r, k) < 10)  # 10 visible
        many = jnp.ones((r, k), bool)  # 34 visible
        assert float(keypoint_loss(cfg, logits, labels, few, is_fg, 1)) == 0.0
        assert float(keypoint_loss(cfg, logits, labels, many, is_fg, 1)) > 0.0
