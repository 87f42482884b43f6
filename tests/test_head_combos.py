"""Every head/body combination used by any loadable reference YAML must
resolve through create_model and trace through parameter init (which runs
every head's forward wiring, R-CNN aux heads included, via init_all).

The reference resolves head strings with get_func (model_builder.py:160);
our builder validates them in _check_head_strings_{fpn,c4}. This test closes
the 'R-CNN head-variant tail' — any get_func-resolvable combination a
loadable YAML names has to build, not just the flagship ones.

Tracing uses jax.eval_shape (abstract shapes, no compile), so full-depth
R-101/X-101 bodies stay cheap on the 1-core CPU runner.
"""

import glob
import os

import jax
import pytest

from sad_tpu.config import load_cfg
from sad_tpu.config.config import ConfigError, merge_cfg_from_dict
from sad_tpu.models import create_model
from sad_tpu.models.model_builder import init_model_params

REF_CONFIGS = "/root/reference/detectron/configs"


def _combo_key(cfg):
    return (
        cfg.MODEL.TYPE,
        cfg.MODEL.CONV_BODY,
        cfg.FAST_RCNN.ROI_BOX_HEAD,
        cfg.MRCNN.ROI_MASK_HEAD if cfg.MODEL.MASK_ON else "",
        cfg.KRCNN.ROI_KEYPOINTS_HEAD if cfg.MODEL.KEYPOINTS_ON else "",
        cfg.FPN.FPN_ON,
        cfg.MODEL.MASK_ON,
        cfg.MODEL.KEYPOINTS_ON,
        cfg.RETINANET.RETINANET_ON,
    )


def _loadable_combos():
    combos = {}
    for path in sorted(
        glob.glob(os.path.join(REF_CONFIGS, "**", "*.yaml"), recursive=True)
    ):
        try:
            cfg = load_cfg(path)
        except ConfigError:
            continue  # the 16 dead model_comp files (test_config_surface)
        combos.setdefault(_combo_key(cfg), (os.path.relpath(path, REF_CONFIGS), cfg))
    return sorted(combos.values())


@pytest.mark.skipif(
    not os.path.isdir(REF_CONFIGS), reason="reference configs not on disk"
)
def test_every_loadable_combo_builds_and_traces():
    combos = _loadable_combos()
    assert len(combos) >= 10  # the surface is real, not one family
    failures = []
    for relpath, cfg in combos:
        # shrink width only — depth/wiring is what is under test
        cfg = merge_cfg_from_dict(
            cfg,
            {"RESNETS": {"CHANNEL_RATIO": 0.125}, "COMPUTE_DTYPE": "float32"},
        )
        try:
            model = create_model(cfg)
            shapes = jax.eval_shape(
                lambda m=model: init_model_params(
                    m, jax.random.PRNGKey(0), (1, 128, 128, 3)
                )
            )
            n_params = len(jax.tree_util.tree_leaves(shapes))
            assert n_params > 10, f"{relpath}: suspiciously few params"
        except Exception as e:  # noqa: BLE001 — collect all failures
            failures.append(f"{relpath}: {type(e).__name__}: {e}")
    assert not failures, "\n".join(failures)
