"""Config-surface regression: every reference YAML must keep loading.

The reference ships 110 configs; 94 are loadable by the reference itself and
16 (all under model_comp/) reference config keys that never existed in the
released lib/core/config.py — the reference's own merge raises
KeyError('Non-existent config key: {}') on them (config.py:1146-1151).
sad_tpu must match both sets exactly: a regression in a dataclass default
would silently shrink the YAML surface.
"""

import glob
import os

import pytest

from sad_tpu.config import load_cfg
from sad_tpu.config.config import ConfigError

REF_CONFIGS = "/root/reference/detectron/configs"

# YAML -> first non-existent key the merge hits (matches the reference's own
# KeyError; see lib/core/config.py:1146-1151). Everything else must load.
EXPECTED_BAD_KEYS = {
    "model_comp/ResNet-50.yaml": "CLS",
    "model_comp/retinanet_R-101-FPN_1x.yaml": "DISTILLATION.WEIGHTS",
    "model_comp/retinanet_R-50-FPN_1x.yaml": "DISTILLATION.HARD_WEIGHTS",
    "model_comp/retinanet_R-50-FPN_1x_L2.yaml": "RETINANET.ONE_HOT_TARGET",
    "model_comp/retinanet_R-50-FPN_1x_half.yaml": "DISTILLATION.WEIGHTS",
    "model_comp/retinanet_R-50-FPN_1x_test.yaml": "DISTILLATION.HARD_WEIGHTS",
    "model_comp/retinanet_R-50-FPN_deconv.yaml": "RETINANET.DECONV",
    "model_comp/retinanet_R-50-FPN_deconv_unlabel.yaml": "RETINANET.DECONV",
    "model_comp/retinanet_R-50-FPN_distillation.yaml": "DISTILLATION.WEIGHTS",
    "model_comp/retinanet_R-50-FPN_distillation_bbox_thresh.yaml": "RETINANET.DECONV",
    "model_comp/retinanet_R-50-FPN_distillation_half.yaml": "DISTILLATION.WEIGHTS",
    "model_comp/retinanet_R-50-FPN_distillation_self.yaml": "DISTILLATION.WEIGHTS",
    "model_comp/retinanet_R-50-FPN_distillation_soft_t.yaml": "DISTILLATION.WEIGHTS",
    "model_comp/retinanet_R-50-FPN_distillation_test.yaml": "RETINANET.DECONV",
    "model_comp/retinanet_R-50-FPN_mutual.yaml": "DISTILLATION.WEIGHTS",
    "model_comp/retinanet_X-101-64x4d-FPN_1x.yaml": "DISTILLATION.WEIGHTS",
}


def _all_yamls():
    return sorted(
        glob.glob(os.path.join(REF_CONFIGS, "**", "*.yaml"), recursive=True)
    )


@pytest.mark.skipif(
    not os.path.isdir(REF_CONFIGS), reason="reference configs not on disk"
)
class TestReferenceYamlSurface:
    def test_inventory_complete(self):
        assert len(_all_yamls()) == 110

    def test_all_valid_yamls_load(self):
        failures = []
        for y in _all_yamls():
            rel = os.path.relpath(y, REF_CONFIGS)
            if rel in EXPECTED_BAD_KEYS:
                continue
            try:
                cfg = load_cfg(y)
            except Exception as e:  # noqa: BLE001
                failures.append(f"{rel}: {type(e).__name__}: {e}")
                continue
            assert cfg.MODEL.TYPE, rel
        assert not failures, "\n".join(failures)

    def test_dead_model_comp_yamls_fail_on_same_keys(self):
        for rel, key in EXPECTED_BAD_KEYS.items():
            with pytest.raises(ConfigError, match="Non-existent config key"):
                try:
                    load_cfg(os.path.join(REF_CONFIGS, rel))
                except ConfigError as e:
                    assert key in str(e), (rel, str(e))
                    raise
