"""TEST.NMS_CAND_TOPK: the pre-NMS candidate cut of the final class-wise
NMS in the R-CNN box decode (eval/rcnn_inference.py).

Identity property pinned here: invalid candidates (below SCORE_THRESH or
invalid roi slots) carry -inf scores into the NMS, so whenever the number
of VALID candidates is <= NMS_CAND_TOPK the exact top-k cut retains every
candidate the full NMS could ever pick — outputs are bit-identical. The
serving speed effect (the cut re-enables the sublane-batched Pallas NMS
kernel at R=1000) is measured on chip (tools_drives/rcnn_infer_stage_drive
/ rcnn_infer_drive; results/rcnn_inference.json).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from sad_tpu.config import Config
from sad_tpu.config.config import merge_cfg_from_dict
from sad_tpu.eval.rcnn_inference import decode_rcnn_detections


def _cfg(cand_topk=0, num_classes=5):
    return merge_cfg_from_dict(
        Config(),
        {
            "MODEL": {
                "TYPE": "generalized_rcnn",
                "NUM_CLASSES": num_classes,
                "FASTER_RCNN": True,
            },
            "TEST": {
                "SCORE_THRESH": 0.05,
                "NMS": 0.5,
                "DETECTIONS_PER_IM": 10,
                "NMS_CAND_TOPK": cand_topk,
            },
        },
    )


def _inputs(b=2, r=32, c=5, n_strong=12, seed=0):
    """Candidates where exactly n_strong (roi, class) pairs per image clear
    SCORE_THRESH by a wide margin and the rest sit far below it."""
    rng = np.random.RandomState(seed)
    x0 = rng.uniform(0, 200, (b, r))
    y0 = rng.uniform(0, 120, (b, r))
    rois = np.stack(
        [x0, y0, x0 + rng.uniform(20, 80, (b, r)),
         y0 + rng.uniform(20, 60, (b, r))], axis=-1
    ).astype(np.float32)
    roi_valid = np.ones((b, r), bool)
    roi_valid[:, -4:] = False
    # probs: background-heavy rows, then n_strong strong foreground hits
    prob = rng.uniform(0.0, 0.01, (b, r, c)).astype(np.float32)
    prob[:, :, 0] = 0.9
    fg = c - 1
    for i in range(b):
        flat = rng.choice(r * fg, size=n_strong, replace=False)
        for f in flat:
            ri, ci = divmod(int(f), fg)
            prob[i, ri, ci + 1] = rng.uniform(0.3, 0.95)
    deltas = rng.uniform(-0.2, 0.2, (b, r, 4 * c)).astype(np.float32)
    im_hw = np.tile(np.float32([240.0, 320.0]), (b, 1))
    im_scale = np.ones((b,), np.float32)
    return tuple(
        jnp.asarray(v) for v in (rois, roi_valid, prob, deltas, im_hw, im_scale)
    )


def _run(cfg, inputs):
    return jax.jit(lambda *a: decode_rcnn_detections(cfg, *a))(*inputs)


class TestNmsCandTopk:
    def test_bit_identical_when_cut_covers_valid_candidates(self):
        inputs = _inputs(n_strong=12)
        full = _run(_cfg(0), inputs)
        # 12 strong candidates/image << cand_k=16 -> provably identical
        cut = _run(_cfg(16), inputs)
        for k in ("boxes", "scores", "classes", "valid"):
            np.testing.assert_array_equal(
                np.asarray(full[k]), np.asarray(cut[k]), err_msg=k
            )

    def test_cut_at_or_above_total_is_noop(self):
        inputs = _inputs()
        full = _run(_cfg(0), inputs)
        r, c = inputs[0].shape[1], inputs[2].shape[2]
        for cand_k in (r * (c - 1), r * (c - 1) + 100):
            same = _run(_cfg(cand_k), inputs)
            for k in ("boxes", "scores", "classes", "valid"):
                np.testing.assert_array_equal(
                    np.asarray(full[k]), np.asarray(same[k]), err_msg=k
                )

    def test_small_cut_keeps_top_scorers(self):
        # Stress the approximation direction: cand_k smaller than the
        # valid-candidate count must still return the highest-scoring
        # detections (greedy NMS picks in score order from the kept pool).
        inputs = _inputs(n_strong=24, seed=3)
        full = _run(_cfg(0), inputs)
        cut = _run(_cfg(8), inputs)
        fs = np.asarray(full["scores"])
        cs = np.asarray(cut["scores"])
        fv = np.asarray(full["valid"])
        cv = np.asarray(cut["valid"])
        for i in range(fs.shape[0]):
            kept_full = set(np.round(fs[i][fv[i]], 6))
            kept_cut = sorted(cs[i][cv[i]], reverse=True)
            # every detection the cut run keeps is one the full run kept
            for s in np.round(kept_cut, 6):
                assert s in kept_full
            # and the single best detection survives the cut
            assert np.isclose(max(kept_cut), fs[i].max())

    def test_config_default_is_off(self):
        assert Config().TEST.NMS_CAND_TOPK == 0
        assert dataclasses.asdict(Config())["TEST"]["NMS_CAND_TOPK"] == 0
