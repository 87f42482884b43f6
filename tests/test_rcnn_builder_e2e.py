"""End-to-end RCNNMinibatchBuilder -> train step with mask + keypoint targets.

RCNNMinibatchBuilder is the real train loop's batch source for the R-CNN
family (train/train_loop.py) but was previously exercised only by the chip
drives; this covers the full host path — image file on disk -> prep/scale ->
RPN targets + padded gt + mask rasters + scaled keypoints -> one finite
jitted training step producing loss_mask/loss_kps.

Reference semantics being pinned: roi_data/minibatch.py (image prep),
roi_data/mask_rcnn.py:38-52 (fg-only mask targets),
roi_data/keypoint_rcnn.py (keypoint heatmap targets).
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sad_tpu.config.config import merge_cfg_from_dict
from tests.test_rcnn import rcnn_cfg

pytestmark = pytest.mark.e2e  # heavyweight: excluded from the default run (pytest.ini)


@pytest.fixture(scope="module")
def kp_mask_setup(tmp_path_factory):
    cfg = rcnn_cfg(mask=True, kps=True)
    cfg = merge_cfg_from_dict(
        cfg,
        {
            "MODEL": {"NUM_CLASSES": 2},
            "RESNETS": {"CHANNEL_RATIO": 0.0625},
            "TRAIN": {
                "SCALES": (64,),
                "MAX_SIZE": 128,
                "RPN_PRE_NMS_TOP_N": 40,
                "RPN_POST_NMS_TOP_N": 16,
                "BATCH_SIZE_PER_IM": 8,
                "IMS_PER_BATCH": 2,
            },
            "MRCNN": {"DIM_REDUCED": 16},
            "KRCNN": {
                "NUM_KEYPOINTS": 5,
                "NUM_STACKED_CONVS": 2,
                "CONV_HEAD_DIM": 32,
                "MIN_KEYPOINT_COUNT_FOR_VALID_MINIBATCH": 0,
            },
        },
    )

    from PIL import Image

    d = tmp_path_factory.mktemp("rcnn_builder")
    rng = np.random.RandomState(0)
    entries = []
    for i in range(2):
        p = os.path.join(str(d), f"{i}.png")
        Image.fromarray(rng.randint(0, 255, (80, 100, 3), np.uint8)).save(p)
        boxes = np.asarray([[10, 10, 50, 60], [40, 20, 90, 70]], np.float32)
        nk = cfg.KRCNN.NUM_KEYPOINTS
        kp = np.zeros((2, nk, 3), np.float32)
        kp[..., 0] = rng.uniform(boxes[:, 0:1], boxes[:, 2:3], (2, nk))
        kp[..., 1] = rng.uniform(boxes[:, 1:2], boxes[:, 3:4], (2, nk))
        kp[..., 2] = 2.0
        entries.append(
            {
                "id": i + 1,
                "image": p,
                "width": 100,
                "height": 80,
                "flipped": False,
                "boxes": boxes,
                "gt_classes": np.ones(2, np.int32),
                "is_crowd": np.zeros(2, bool),
                "segms": [
                    [[float(b[0]), float(b[1]), float(b[2]), float(b[1]),
                      float(b[2]), float(b[3]), float(b[0]), float(b[3])]]
                    for b in boxes
                ],
                "gt_keypoints": kp,
            }
        )
    return cfg, entries


class TestBuilderOutputs:
    def test_geometry_and_targets(self, kp_mask_setup):
        cfg, entries = kp_mask_setup
        from sad_tpu.data.rpn_minibatch import RCNNMinibatchBuilder

        builder = RCNNMinibatchBuilder(cfg, max_gt=8)
        batch = builder.build(entries, seed=0)

        n, ch, cw, _ = batch["data"].shape
        assert n == 2
        assert ch % cfg.FPN.COARSEST_STRIDE == 0
        assert cw % cfg.FPN.COARSEST_STRIDE == 0
        # 80x100 image, shortest side -> 64: scale 0.8, content 64x80
        np.testing.assert_allclose(batch["im_hw"][0], [64, 80])

        # gt boxes scaled by 0.8 and padded to max_gt
        assert batch["gt_boxes"].shape == (2, 8, 4)
        np.testing.assert_allclose(
            batch["gt_boxes"][0, 0], np.asarray([10, 10, 50, 60]) * 0.8, atol=1e-4
        )
        assert (batch["gt_classes"][:, 2:] == 0).all()

        # mask rasters: box-polygon gt rasterizes to a filled region at the
        # mask stride, zero in padding slots
        rasters = batch["gt_mask_rasters"]
        assert rasters.shape[:2] == (2, 8)
        assert rasters[0, 0].sum() > 0 and rasters[0, 1].sum() > 0
        assert rasters[:, 2:].sum() == 0
        s = batch["gt_mask_stride"]
        ys, xs = np.nonzero(rasters[0, 0])
        b0 = batch["gt_boxes"][0, 0] / s
        assert xs.min() >= np.floor(b0[0]) - 1 and xs.max() <= np.ceil(b0[2]) + 1
        assert ys.min() >= np.floor(b0[1]) - 1 and ys.max() <= np.ceil(b0[3]) + 1

        # keypoints scaled into canvas coords, visibility preserved
        kps = batch["gt_keypoints"]
        assert kps.shape == (2, 8, cfg.KRCNN.NUM_KEYPOINTS, 3)
        np.testing.assert_allclose(
            kps[0, 0, :, :2], entries[0]["gt_keypoints"][0, :, :2] * 0.8, atol=1e-4
        )
        assert (kps[0, :2, :, 2] == 2.0).all()
        assert kps[:, 2:].sum() == 0


class TestRLERaster:
    def test_rle_instance_rasterizes(self, kp_mask_setup):
        """An RLE-dict segmentation produces a non-empty, correctly-placed
        mask raster on the stride grid (reference keeps RLE instances,
        json_dataset.py:197)."""
        cfg, entries = kp_mask_setup
        from sad_tpu.data.rpn_minibatch import RCNNMinibatchBuilder
        from sad_tpu.utils.segms import mask_to_rle

        e = dict(entries[0])
        m = np.zeros((e["height"], e["width"]), np.uint8)
        b0 = e["boxes"][0].astype(int)
        m[b0[1]:b0[3], b0[0]:b0[2]] = 1
        e["segms"] = [mask_to_rle(m)] + list(e["segms"][1:])

        builder = RCNNMinibatchBuilder(cfg, max_gt=8)
        batch = builder.build([e, entries[1]], seed=0)
        r = batch["gt_mask_rasters"][0, 0]
        assert r.sum() > 0
        s = batch["gt_mask_stride"]
        ys, xs = np.nonzero(r)
        scale = 64.0 / e["height"]  # shortest side -> 64
        np.testing.assert_allclose(
            [xs.min(), xs.max()],
            [np.floor(b0[0] * scale / s), np.ceil((b0[2] - 1) * scale / s)],
            atol=1.5,
        )


class TestFullTrainStep:
    def test_mask_and_keypoint_losses_flow(self, kp_mask_setup):
        cfg, entries = kp_mask_setup
        from sad_tpu.data.rpn_minibatch import RCNNMinibatchBuilder
        from sad_tpu.models import create_model
        from sad_tpu.models.model_builder import init_model_params
        from sad_tpu.train import TrainState, init_momentum_state
        from sad_tpu.train.rcnn_train import make_rcnn_train_step

        builder = RCNNMinibatchBuilder(cfg, max_gt=8)
        batch = jax.tree_util.tree_map(
            jnp.asarray, builder.build(entries, seed=0)
        )
        _, ch, cw, _ = batch["data"].shape
        model = create_model(cfg)
        params = init_model_params(model, jax.random.PRNGKey(0), (1, ch, cw, 3))
        step = jax.jit(make_rcnn_train_step(cfg, model, n_groups=1))
        state = TrainState(params, init_momentum_state(params).velocity)
        new_state, metrics = step(
            state, batch, jnp.float32(1e-4), jax.random.PRNGKey(1)
        )
        for k in ("loss", "loss_cls", "loss_bbox", "loss_mask", "loss_kps"):
            assert k in metrics, sorted(metrics)
            assert np.isfinite(float(metrics[k])), k
        # params must move (grads flow through all three branches)
        moved = jax.tree_util.tree_reduce(
            lambda acc, x: acc or bool(np.any(x)),
            jax.tree_util.tree_map(
                lambda a, b2: np.asarray(a) != np.asarray(b2),
                params,
                new_state.params,
            ),
            False,
        )
        assert moved
        # keypoint-head params specifically must receive gradient
        flat_old = jax.tree_util.tree_flatten_with_path(params)[0]
        flat_new = dict(jax.tree_util.tree_flatten_with_path(new_state.params)[0])
        kps_moved = any(
            np.any(np.asarray(v) != np.asarray(flat_new[kpath]))
            for kpath, v in flat_old
            if "kps" in jax.tree_util.keystr(kpath).lower()
            or "pose" in jax.tree_util.keystr(kpath).lower()
        )
        assert kps_moved

    def test_keypoint_and_mask_losses_learn(self, kp_mask_setup):
        """Overfit one fixed batch: the (group-exact, per-image-denominator)
        keypoint and mask losses must DECREASE under SGD — a sign/magnitude
        regression test for the loss normalization."""
        cfg, entries = kp_mask_setup
        from sad_tpu.data.rpn_minibatch import RCNNMinibatchBuilder
        from sad_tpu.models import create_model
        from sad_tpu.models.model_builder import init_model_params
        from sad_tpu.train import TrainState, init_momentum_state
        from sad_tpu.train.rcnn_train import make_rcnn_train_step

        # random init needs unit-scale inputs (Caffe mean-only normalization
        # leaves std~60 pixels that blow up an unpretrained trunk)
        cfg = dataclasses.replace(cfg, PIXEL_STD=(57.375, 57.12, 58.395))
        builder = RCNNMinibatchBuilder(cfg, max_gt=8)
        batch = jax.tree_util.tree_map(
            jnp.asarray, builder.build(entries, seed=0)
        )
        _, ch, cw, _ = batch["data"].shape
        model = create_model(cfg)
        params = init_model_params(model, jax.random.PRNGKey(0), (1, ch, cw, 3))
        step = jax.jit(make_rcnn_train_step(cfg, model, n_groups=1))
        state = TrainState(params, init_momentum_state(params).velocity)
        first = None
        rng = jax.random.PRNGKey(2)
        for i in range(60):
            # fixed sampling rng: the same rois every step (pure overfit)
            state, metrics = step(state, batch, jnp.float32(5e-3), rng)
            if first is None:
                first = {
                    k: float(metrics[k]) for k in ("loss_kps", "loss_mask")
                }
        last = {k: float(metrics[k]) for k in ("loss_kps", "loss_mask")}
        assert np.isfinite(last["loss_kps"]) and np.isfinite(last["loss_mask"])
        # the kps output deconv inits at gauss 0.001 so its descent is slow
        # to start (measured trajectory: 5.278 -> 4.91 by step 60, -> 4.04
        # by 120); the mask branch moves faster
        assert last["loss_kps"] < 0.95 * first["loss_kps"], (first, last)
        # the mask loss oscillates at this LR (0.69 -> ~0.55 at step 60,
        # dipping to 0.40 along the way); assert clear descent, not the dip
        assert last["loss_mask"] < 0.85 * first["loss_mask"], (first, last)
