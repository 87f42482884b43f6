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
