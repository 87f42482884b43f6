"""Model creation dispatch + parameter-role masks.

Replaces detectron/lib/modeling/model_builder.py (string dispatch into graph
builders) and the trainable-parameter bookkeeping of
DetectionModelHelper.TrainableParams (detector.py:70-81). In the functional
design there is no graph surgery: 'distillation' is simply *two* RetinaNet
models (teacher arch + student arch) whose joint train step lives in
sad_tpu.train.train_step; the frozen teacher is a param pytree outside the
optimizer (and the distill loss passes it no gradient anyway).
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp

from sad_tpu.config import Config

from .arch import arch_from_config
from .retinanet import RetinaNet


def create_model(cfg: Config) -> RetinaNet:
    """Build the model for cfg.MODEL.TYPE (ref: model_builder.py:74-112).

    'retinanet' and 'distillation' both yield a RetinaNet module — for
    distillation, call this once with the teacher cfg and once with the
    student cfg (the reference's NameScope('teacher') trick,
    model_builder.py:373-411, is unnecessary with explicit param pytrees).
    """
    from sad_tpu.config.config import _TYPE_ALIASES

    # deprecated type spellings normalize at assert_and_infer_cfg; accept
    # them here too for configs assembled without load_cfg
    mtype = _TYPE_ALIASES.get(cfg.MODEL.TYPE, cfg.MODEL.TYPE)
    if mtype in ("retinanet", "distillation"):
        return RetinaNet(arch_from_config(cfg))
    if mtype in ("generalized_rcnn", "rpn"):
        if cfg.FPN.FPN_ON:
            from .rcnn import GeneralizedRCNN

            _check_head_strings_fpn(cfg)
            return GeneralizedRCNN(cfg)
        from .single_scale import SingleScaleRCNN

        _check_head_strings_c4(cfg)
        return SingleScaleRCNN(cfg)
    if mtype == "rfcn":
        from .single_scale import SingleScaleRCNN

        return SingleScaleRCNN(cfg)
    raise NotImplementedError(f"MODEL.TYPE={mtype!r} not implemented in sad_tpu")


def _check_head_strings_fpn(cfg: Config) -> None:
    """Strict head-string dispatch (the reference resolves these via get_func
    import, model_builder.py:160; an unknown string must fail, not silently
    build the default head). head_builder.* is the reference configs' legacy
    alias for fast_rcnn_heads.add_roi_2mlp_head (12_2017_baselines)."""
    if cfg.FAST_RCNN.ROI_BOX_HEAD not in (
        "fast_rcnn_heads.add_roi_2mlp_head",
        "head_builder.add_roi_2mlp_head",
    ):
        raise NotImplementedError(
            f"FPN box head {cfg.FAST_RCNN.ROI_BOX_HEAD!r} "
            "(C4 heads go through SingleScaleRCNN)"
        )
    if cfg.MODEL.MASK_ON and "v1up" not in cfg.MRCNN.ROI_MASK_HEAD:
        raise NotImplementedError(
            f"FPN mask head {cfg.MRCNN.ROI_MASK_HEAD!r} "
            "(v0up/v0upshare are C4 heads)"
        )
    if cfg.MODEL.KEYPOINTS_ON and "v1convX" not in cfg.KRCNN.ROI_KEYPOINTS_HEAD:
        raise NotImplementedError(
            f"keypoint head {cfg.KRCNN.ROI_KEYPOINTS_HEAD!r}"
        )


def _check_head_strings_c4(cfg: Config) -> None:
    if not (
        "ResNet" in cfg.FAST_RCNN.ROI_BOX_HEAD
        or "resnet" in cfg.FAST_RCNN.ROI_BOX_HEAD
        or "VGG16" in (cfg.MODEL.CONV_BODY or "")
        or "VGG_CNN" in (cfg.MODEL.CONV_BODY or "")
        or "2mlp" in cfg.FAST_RCNN.ROI_BOX_HEAD
    ):
        raise NotImplementedError(
            f"C4 box head {cfg.FAST_RCNN.ROI_BOX_HEAD!r}"
        )
    if cfg.MODEL.MASK_ON and not (
        "v0up" in cfg.MRCNN.ROI_MASK_HEAD or "v1up" in cfg.MRCNN.ROI_MASK_HEAD
    ):
        raise NotImplementedError(f"C4 mask head {cfg.MRCNN.ROI_MASK_HEAD!r}")


def init_model_params(model, rng: jax.Array, image_shape) -> Any:
    """Initialize a param pytree for a (N, H, W, 3) input shape, touching
    every head (R-CNN aux heads included)."""
    dummy = jnp.zeros(image_shape, jnp.float32)
    from .rcnn import GeneralizedRCNN
    from .single_scale import SingleScaleRCNN

    im_hw = jnp.asarray(
        [[image_shape[1], image_shape[2]]] * image_shape[0], jnp.float32
    )
    if isinstance(model, GeneralizedRCNN):
        return model.init(rng, dummy, im_hw, method="init_all")["params"]
    if isinstance(model, SingleScaleRCNN):
        return model.init(rng, dummy, im_hw, method="init_all")["params"]
    return model.init(rng, dummy)["params"]


# --------------------------------------------------------------------------- #
# Parameter role masks
# --------------------------------------------------------------------------- #


def _mask_tree(params: Any, fn: Callable[[Tuple[str, ...]], bool]) -> Any:
    flat = jax.tree_util.tree_flatten_with_path(params)
    leaves, treedef = flat

    def path_names(path) -> Tuple[str, ...]:
        names = []
        for p in path:
            if hasattr(p, "key"):
                names.append(str(p.key))
            elif hasattr(p, "name"):
                names.append(str(p.name))
            else:
                names.append(str(p))
        return tuple(names)

    mask_leaves = [fn(path_names(path)) for path, _ in leaves]
    return jax.tree_util.tree_unflatten(treedef, mask_leaves)


def _is_affine_channel(path: Tuple[str, ...]) -> bool:
    return len(path) >= 2 and path[-2].endswith("_bn") and path[-1] in ("s", "b")


def _is_frozen_stage(path: Tuple[str, ...], freeze_at: int) -> bool:
    """conv1 + res2..res<freeze_at> are frozen when freeze_at >= 2
    (ref: ResNet.py StopGradient after stage freeze_at)."""
    if freeze_at < 2:
        return False
    frozen_prefixes = ["conv1", "res_conv1_bn"] + [
        f"res{s}_" for s in range(2, freeze_at + 1)
    ]
    return any(
        name.startswith(pfx) for name in path for pfx in frozen_prefixes
    )


def trainable_mask(
    params: Any, freeze_at: int = 2, freeze_conv_body: bool = False
) -> Any:
    """True where a param is trainable.

    Frozen: AffineChannel scale/bias everywhere (affine_channel_op.cc:70-80 —
    gradient flows only to X) and the FREEZE_AT backbone stages. With
    freeze_conv_body (TRAIN.FREEZE_CONV_BODY / the deprecated
    *_frozen_features model types), the whole conv body incl. FPN is frozen —
    the reference StopGradients every blob_conv output
    (model_builder.py:200-207)."""
    body_names = ("fpn", "body")

    def ok(p: Tuple[str, ...]) -> bool:
        if _is_affine_channel(p) or _is_frozen_stage(p, freeze_at):
            return False
        if freeze_conv_body and p and p[0] in body_names:
            return False
        return True

    return _mask_tree(params, ok)


def bias_mask(params: Any) -> Any:
    """True for conv bias params — they get 2x LR and no weight decay
    (ref: optimizer.py:115-124)."""
    return _mask_tree(params, lambda p: p[-1] == "bias")


def param_count(params: Any) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
