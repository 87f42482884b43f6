"""VGG/C4/R-FCN single-scale model family tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sad_tpu.config import Config
from sad_tpu.config.config import merge_cfg_from_dict


def ss_cfg(model_type="generalized_rcnn", body="VGG_CNN_M_1024.add_..."):
    return merge_cfg_from_dict(
        Config(),
        {
            "MODEL": {"TYPE": model_type, "CONV_BODY": body, "NUM_CLASSES": 4,
                      "FASTER_RCNN": True},
            "RPN": {"RPN_ON": True, "SIZES": (32, 64), "STRIDE": 16,
                    "ASPECT_RATIOS": (0.5, 1.0, 2.0)},
            "FAST_RCNN": {"ROI_XFORM_RESOLUTION": 3},
            "TEST": {"RPN_PRE_NMS_TOP_N": 30, "RPN_POST_NMS_TOP_N": 8},
            "COMPUTE_DTYPE": "float32",
        },
    )


class TestVGGFasterRCNN:
    def test_vgg_m_forward(self):
        cfg = ss_cfg(body="VGG_CNN_M_1024.add_VGG_CNN_M_1024_conv5_body")
        from sad_tpu.models import create_model
        from sad_tpu.models.single_scale import SingleScaleRCNN

        model = create_model(cfg)
        assert isinstance(model, SingleScaleRCNN)
        images = jnp.zeros((1, 64, 64, 3), jnp.float32)
        im_hw = jnp.asarray([[64, 64]], jnp.float32)
        params = model.init(jax.random.PRNGKey(0), images, im_hw)["params"]
        out = model.apply({"params": params}, images, im_hw)
        assert out["rois"].shape == (1, 8, 4)
        assert out["cls_prob"].shape == (1, 8, 4)
        assert out["bbox_pred"].shape == (1, 8, 16)
        np.testing.assert_allclose(
            np.asarray(out["cls_prob"]).sum(-1), 1.0, rtol=1e-4
        )


class TestRFCN:
    def test_rfcn_forward(self):
        cfg = ss_cfg(model_type="rfcn",
                     body="VGG_CNN_M_1024.add_VGG_CNN_M_1024_conv5_body")
        from sad_tpu.models import create_model

        model = create_model(cfg)
        images = jnp.zeros((1, 64, 64, 3), jnp.float32)
        im_hw = jnp.asarray([[64, 64]], jnp.float32)
        params = model.init(jax.random.PRNGKey(0), images, im_hw)["params"]
        out = model.apply({"params": params}, images, im_hw)
        assert out["cls_prob"].shape == (1, 8, 4)
        assert out["bbox_pred"].shape == (1, 8, 8)  # cls-agnostic 2x4


class TestVGG16:
    def test_vgg16_feature_stride(self):
        from sad_tpu.models.vgg import VGG16Body

        body = VGG16Body()
        x = jnp.zeros((1, 64, 64, 3))
        params = body.init(jax.random.PRNGKey(0), x)["params"]
        f = body.apply({"params": params}, x)
        assert f.shape == (1, 4, 4, 512)  # stride 16
        assert "conv5_3" in params and "conv1_1" in params


class TestC4ResNetHead:
    def test_conv4_body_plus_res5_head(self):
        import dataclasses
        cfg = ss_cfg(body="ResNet.add_ResNet50_conv4_body")
        cfg = dataclasses.replace(
            cfg,
            RESNETS=dataclasses.replace(cfg.RESNETS, CHANNEL_RATIO=0.0625),
            FAST_RCNN=dataclasses.replace(
                cfg.FAST_RCNN,
                ROI_BOX_HEAD="ResNet.add_ResNet_roi_conv5_head",
                ROI_XFORM_RESOLUTION=14,
            ),
        )
        from sad_tpu.models import create_model
        model = create_model(cfg)
        images = jnp.zeros((1, 64, 64, 3), jnp.float32)
        im_hw = jnp.asarray([[64, 64]], jnp.float32)
        params = model.init(jax.random.PRNGKey(0), images, im_hw)["params"]
        # conv4 body: no trunk res5; the head owns res5_*
        def all_paths(tree, prefix=""):
            if isinstance(tree, dict):
                for k, v in tree.items():
                    yield from all_paths(v, prefix + "/" + k)
            else:
                yield prefix

        body_paths = list(all_paths(params["body"]))
        head_paths = list(all_paths(params["res5_head"]))
        assert not any("res5_" in p for p in body_paths)
        assert any("res5_0_branch2a" in p for p in head_paths)
        out = model.apply({"params": params}, images, im_hw)
        assert out["cls_prob"].shape == (1, 8, 4)


class TestSingleScaleTraining:
    @pytest.mark.parametrize("mtype", ["generalized_rcnn", "rfcn"])
    def test_one_train_step(self, mtype):
        import dataclasses
        import numpy as onp

        cfg = ss_cfg(model_type=mtype,
                     body="VGG_CNN_M_1024.add_VGG_CNN_M_1024_conv5_body")
        cfg = dataclasses.replace(
            cfg,
            TRAIN=dataclasses.replace(
                cfg.TRAIN,
                SCALES=(64,), MAX_SIZE=128, IMS_PER_BATCH=2,
                RPN_PRE_NMS_TOP_N=30, RPN_POST_NMS_TOP_N=8,
                BATCH_SIZE_PER_IM=8,
            ),
            FPN=dataclasses.replace(cfg.FPN, COARSEST_STRIDE=64),
        )
        from sad_tpu.models import create_model
        from sad_tpu.train import TrainState, init_momentum_state
        from sad_tpu.train.rcnn_train import make_rcnn_train_step
        from sad_tpu.data.rpn_minibatch import add_rpn_blobs_to_batch

        model = create_model(cfg)
        images = jnp.zeros((2, 64, 64, 3), jnp.float32)
        im_hw = jnp.asarray([[64, 64], [64, 64]], jnp.float32)
        params = model.init(jax.random.PRNGKey(0), images, im_hw)["params"]

        rng = onp.random.RandomState(0)
        batch = {
            "data": rng.randn(2, 64, 64, 3).astype(onp.float32),
            "im_hw": onp.asarray([[64, 64], [64, 64]], onp.float32),
        }
        entries = [
            {"boxes": onp.asarray([[8, 8, 40, 40]], onp.float32),
             "gt_classes": onp.asarray([1], onp.int32),
             "is_crowd": onp.zeros(1, bool)}
            for _ in range(2)
        ]
        add_rpn_blobs_to_batch(cfg, batch, entries, (64, 64), onp.ones(2))
        # pad gt like the builder does
        batch = jax.tree_util.tree_map(jnp.asarray, batch)

        step = jax.jit(make_rcnn_train_step(cfg, model, n_groups=1))
        state = TrainState(params, init_momentum_state(params).velocity)
        new_state, metrics = step(
            state, batch, jnp.float32(1e-4), jax.random.PRNGKey(1)
        )
        assert np.isfinite(float(metrics["loss"]))
        assert "loss_rpn_cls_fpn4" in metrics  # stride 16 -> level 4
        assert np.isfinite(float(metrics["loss_cls"]))


def _c4_mask_cfg(head="mask_rcnn_fcn_head_v0upshare"):
    import dataclasses

    cfg = ss_cfg(body="ResNet.add_ResNet50_conv4_body")
    return dataclasses.replace(
        cfg,
        MODEL=dataclasses.replace(cfg.MODEL, MASK_ON=True),
        RESNETS=dataclasses.replace(cfg.RESNETS, CHANNEL_RATIO=0.0625),
        FAST_RCNN=dataclasses.replace(
            cfg.FAST_RCNN,
            ROI_BOX_HEAD="ResNet.add_ResNet_roi_conv5_head",
            ROI_XFORM_RESOLUTION=14,
        ),
        MRCNN=dataclasses.replace(
            cfg.MRCNN,
            ROI_MASK_HEAD=head,
            ROI_XFORM_RESOLUTION=14,
            RESOLUTION=14,
            DIM_REDUCED=16,
        ),
        TRAIN=dataclasses.replace(
            cfg.TRAIN,
            SCALES=(64,), MAX_SIZE=128, IMS_PER_BATCH=2,
            RPN_PRE_NMS_TOP_N=30, RPN_POST_NMS_TOP_N=8,
            BATCH_SIZE_PER_IM=8,
        ),
        FPN=dataclasses.replace(cfg.FPN, COARSEST_STRIDE=64),
    )


class TestC4MaskHeads:
    """v0upshare/v0up mask heads (ref: mask_rcnn_heads.py:173-240)."""

    def _init(self, cfg):
        from sad_tpu.models import create_model

        model = create_model(cfg)
        images = jnp.zeros((2, 64, 64, 3), jnp.float32)
        im_hw = jnp.asarray([[64, 64], [64, 64]], jnp.float32)
        params = model.init(
            jax.random.PRNGKey(0), images, im_hw, method="init_all"
        )["params"]
        return model, params

    def test_v0upshare_shares_res5_params(self):
        model, params = self._init(_c4_mask_cfg("mask_rcnn_fcn_head_v0upshare"))
        assert "mask_out" in params
        assert "mask_res5" not in params  # shared with the box head

    def test_v0up_owns_res5_params(self):
        model, params = self._init(_c4_mask_cfg("mask_rcnn_fcn_head_v0up"))
        assert "mask_out" in params
        assert "mask_res5" in params

    @pytest.mark.parametrize(
        "head", ["mask_rcnn_fcn_head_v0upshare", "mask_rcnn_fcn_head_v0up"]
    )
    def test_train_step_with_mask_loss(self, head):
        import dataclasses
        import numpy as onp

        from sad_tpu.data.rpn_minibatch import add_rpn_blobs_to_batch
        from sad_tpu.train import TrainState, init_momentum_state
        from sad_tpu.train.rcnn_train import make_rcnn_train_step

        cfg = _c4_mask_cfg(head)
        model, params = self._init(cfg)

        rng = onp.random.RandomState(0)
        batch = {
            "data": rng.randn(2, 64, 64, 3).astype(onp.float32),
            "im_hw": onp.asarray([[64, 64], [64, 64]], onp.float32),
        }
        entries = [
            {"boxes": onp.asarray([[8, 8, 40, 40]], onp.float32),
             "gt_classes": onp.asarray([1], onp.int32),
             "is_crowd": onp.zeros(1, bool)}
            for _ in range(2)
        ]
        add_rpn_blobs_to_batch(cfg, batch, entries, (64, 64), onp.ones(2))
        g = batch["gt_boxes"].shape[1]
        rasters = onp.zeros((2, g, 16, 16), onp.float32)
        rasters[:, 0, 2:10, 2:10] = 1.0  # box [8,8,40,40] at stride 4
        batch["gt_mask_rasters"] = rasters
        batch["gt_mask_stride"] = 4.0
        batch = jax.tree_util.tree_map(jnp.asarray, batch)

        step = jax.jit(make_rcnn_train_step(cfg, model, n_groups=1))
        state = TrainState(params, init_momentum_state(params).velocity)
        new_state, metrics = step(
            state, batch, jnp.float32(1e-4), jax.random.PRNGKey(1)
        )
        assert np.isfinite(float(metrics["loss"]))
        assert np.isfinite(float(metrics["loss_mask"]))
        # the mask output stack must receive gradient
        before = jax.tree_util.tree_leaves(params["mask_out"])
        after = jax.tree_util.tree_leaves(new_state.params["mask_out"])
        assert any(
            bool(np.any(np.asarray(a) != np.asarray(b)))
            for a, b in zip(before, after)
        )

    def test_cascaded_mask_inference(self):
        from sad_tpu.eval.rcnn_inference import make_rcnn_inference_fn

        cfg = _c4_mask_cfg("mask_rcnn_fcn_head_v0upshare")
        model, params = self._init(cfg)
        infer = make_rcnn_inference_fn(cfg, model)
        images = jnp.asarray(
            np.random.RandomState(0).randn(2, 64, 64, 3), jnp.float32
        )
        im_hw = jnp.asarray([[64, 64], [64, 64]], jnp.float32)
        scale = jnp.asarray([1.0, 1.0], jnp.float32)
        out = infer(params, images, im_hw, scale)
        k = cfg.TEST.DETECTIONS_PER_IM
        # res5 stride-2 on 14x14 -> 7x7, deconv 2x -> 14x14 masks
        assert out["mask_prob"].shape == (2, k, 14, 14, cfg.MODEL.NUM_CLASSES)
        assert np.isfinite(np.asarray(out["mask_prob"])).all()


class TestOHEMTraining:
    """TRAIN.OHEM wired into the box-head losses (ref:
    fast_rcnn_heads.py:70-109 BoxAnnotatorOHEM path)."""

    def test_rfcn_ohem_step(self):
        import dataclasses
        import numpy as onp

        from sad_tpu.data.rpn_minibatch import add_rpn_blobs_to_batch
        from sad_tpu.train import TrainState, init_momentum_state
        from sad_tpu.train.rcnn_train import make_rcnn_train_step

        cfg = ss_cfg(model_type="rfcn",
                     body="VGG_CNN_M_1024.add_VGG_CNN_M_1024_conv5_body")
        cfg = dataclasses.replace(
            cfg,
            TRAIN=dataclasses.replace(
                cfg.TRAIN,
                SCALES=(64,), MAX_SIZE=128, IMS_PER_BATCH=2,
                RPN_PRE_NMS_TOP_N=30, RPN_POST_NMS_TOP_N=8,
                BATCH_SIZE_PER_IM=8,
                OHEM=True, OHEM_ROI_PER_IMG=4,
            ),
            FPN=dataclasses.replace(cfg.FPN, COARSEST_STRIDE=64),
        )
        from sad_tpu.models import create_model

        model = create_model(cfg)
        images = jnp.zeros((2, 64, 64, 3), jnp.float32)
        im_hw = jnp.asarray([[64, 64], [64, 64]], jnp.float32)
        params = model.init(jax.random.PRNGKey(0), images, im_hw)["params"]

        rng = onp.random.RandomState(0)
        batch = {
            "data": rng.randn(2, 64, 64, 3).astype(onp.float32),
            "im_hw": onp.asarray([[64, 64], [64, 64]], onp.float32),
        }
        entries = [
            {"boxes": onp.asarray([[8, 8, 40, 40]], onp.float32),
             "gt_classes": onp.asarray([1], onp.int32),
             "is_crowd": onp.zeros(1, bool)}
            for _ in range(2)
        ]
        add_rpn_blobs_to_batch(cfg, batch, entries, (64, 64), onp.ones(2))
        batch = jax.tree_util.tree_map(jnp.asarray, batch)

        step = jax.jit(make_rcnn_train_step(cfg, model, n_groups=1))
        state = TrainState(params, init_momentum_state(params).velocity)
        new_state, metrics = step(
            state, batch, jnp.float32(1e-4), jax.random.PRNGKey(1)
        )
        assert np.isfinite(float(metrics["loss"]))
        assert np.isfinite(float(metrics["loss_cls"]))

    def test_ohem_selects_hardest(self):
        """With k=2 of 4 RoIs per image, only the two hardest contribute."""
        from sad_tpu.config import Config
        from sad_tpu.config.config import merge_cfg_from_dict
        from sad_tpu.train.rcnn_train import fast_rcnn_losses

        cfg = merge_cfg_from_dict(
            Config(), {"TRAIN": {"OHEM": True, "OHEM_ROI_PER_IMG": 2}}
        )
        # 1 image, 4 rois, 3 classes; rois 0/1 confidently correct (easy),
        # rois 2/3 confidently wrong (hard)
        big = 10.0
        cls = jnp.asarray(
            [[big, 0, 0], [big, 0, 0], [big, 0, 0], [big, 0, 0]], jnp.float32
        )
        labels = jnp.asarray([0, 0, 1, 2], jnp.int32)
        zeros = jnp.zeros((4, 12), jnp.float32)
        valid = jnp.ones((4,), bool)
        total, m = fast_rcnn_losses(
            cfg, cls, labels, zeros, zeros, zeros, zeros, valid, 1, n_images=1
        )
        # hardest two both have nll ~= big; mean over kept ~= big
        assert float(m["loss_cls"]) == pytest.approx(10.0, rel=0.01)

        cfg_off = merge_cfg_from_dict(Config(), {"TRAIN": {"OHEM": False}})
        _, m_off = fast_rcnn_losses(
            cfg_off, cls, labels, zeros, zeros, zeros, zeros, valid, 1,
            n_images=1,
        )
        # without OHEM the two easy rois dilute the mean to ~half
        assert float(m_off["loss_cls"]) == pytest.approx(5.0, rel=0.01)

    def test_fast_rcnn_losses_group_semantics(self):
        """n_groups>1 = average of per-group losses (the reference's
        allreduce-sum of per-GPU 1/G-scaled means), with no extra 1/G."""
        from sad_tpu.config import Config
        from sad_tpu.train.rcnn_train import fast_rcnn_losses

        cfg = Config()
        rng = np.random.RandomState(0)
        r, c = 8, 3
        cls = jnp.asarray(rng.randn(r, c), jnp.float32)
        labels = jnp.asarray(rng.randint(0, c, r), jnp.int32)
        pred = jnp.asarray(rng.randn(r, 4 * c), jnp.float32)
        tgt = jnp.asarray(rng.randn(r, 4 * c), jnp.float32)
        w = jnp.asarray(rng.rand(r, 4 * c) < 0.5, jnp.float32)
        # unequal live counts per group
        valid = jnp.asarray([True] * 4 + [True, True, False, False])
        whole, _ = fast_rcnn_losses(
            cfg, cls, labels, pred, tgt, w, w, valid, 2
        )
        halves = [
            fast_rcnn_losses(
                cfg, cls[i:i + 4], labels[i:i + 4], pred[i:i + 4],
                tgt[i:i + 4], w[i:i + 4], w[i:i + 4], valid[i:i + 4], 1,
            )[0]
            for i in (0, 4)
        ]
        # bbox normalizes by static dim0 (4 per half vs 8 whole): halves
        # normalize by 4, whole by 8 — average of halves matches exactly
        assert float(whole) == pytest.approx(
            (float(halves[0]) + float(halves[1])) / 2, rel=1e-5
        )
