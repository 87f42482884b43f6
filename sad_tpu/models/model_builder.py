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
    mtype = cfg.MODEL.TYPE
    if mtype in ("retinanet", "distillation"):
        return RetinaNet(arch_from_config(cfg))
    if mtype in ("generalized_rcnn", "rpn"):
        if cfg.FPN.FPN_ON:
            from .rcnn import GeneralizedRCNN

            return GeneralizedRCNN(cfg)
        from .single_scale import SingleScaleRCNN

        return SingleScaleRCNN(cfg)
    if mtype == "rfcn":
        from .single_scale import SingleScaleRCNN

        return SingleScaleRCNN(cfg)
    raise NotImplementedError(f"MODEL.TYPE={mtype!r} not implemented in sad_tpu")


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


def trainable_mask(params: Any, freeze_at: int = 2) -> Any:
    """True where a param is trainable.

    Frozen: AffineChannel scale/bias everywhere (affine_channel_op.cc:70-80 —
    gradient flows only to X) and the FREEZE_AT backbone stages."""
    return _mask_tree(
        params,
        lambda p: not _is_affine_channel(p) and not _is_frozen_stage(p, freeze_at),
    )


def bias_mask(params: Any) -> Any:
    """True for conv bias params — they get 2x LR and no weight decay
    (ref: optimizer.py:115-124)."""
    return _mask_tree(params, lambda p: p[-1] == "bias")


def param_count(params: Any) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
