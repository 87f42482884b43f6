"""Bit-identical resume: interrupted-and-resumed == uninterrupted.

The reference's AUTO_RESUME (train_net.py:208-233) restarts from the latest
model_iter*.pkl, but its loader restarts the batch stream from scratch, so a
resumed run diverges from the uninterrupted one. Here resume is exact:

- the loader fast-forwards its per-stream batch schedule (loader.skip_batches),
- the R-CNN step key is fold_in(base, iter) (not a sequential split chain),
- cur_lr initializes to lr(start_iter-1) so an LR boundary at start_iter
  still applies the momentum correction,

so params after (train k, kill, resume to N) equal params after (train N)
bit for bit. These tests drive train_model directly with a snapshot copied
into a fresh OUTPUT_DIR — the same files AUTO_RESUME scans; the SIGKILL
variant through the real CLI runs in the chip dress rehearsal
(tools_drives/dress_rehearsal_drive.py).
"""

import glob
import json
import os
import shutil

import numpy as np
import pytest

import jax

from sad_tpu.config import Config, register_dataset
from sad_tpu.config.config import merge_cfg_from_dict
from sad_tpu.train.train_loop import train_model


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    from sad_tpu.data.synth_coco import generate_synthetic_coco

    root = str(tmp_path_factory.mktemp("resume_ds"))
    img_dir, j = generate_synthetic_coco(
        root, "r", 12, seed=5, size_range=(64, 96),
        objects_per_image=(1, 3), small_frac=0.0, crowd_frac=0.0,
        ignore_frac=0.0,
    )
    register_dataset("resume_ds", img_dir, j, allow_override=True)
    return "resume_ds"


def _cfg(out_dir, dataset, extra=None):
    base = {
        "MODEL": {"TYPE": "retinanet", "NUM_CLASSES": 9,
                  "CONV_BODY": "FPN.add_fpn_ResNet50_conv5_body"},
        "NUM_GPUS": 1,
        "FPN": {"FPN_ON": True, "RPN_MIN_LEVEL": 3, "RPN_MAX_LEVEL": 7,
                "EXTRA_CONV_LEVELS": True, "COARSEST_STRIDE": 128},
        "RETINANET": {"RETINANET_ON": True, "ASPECT_RATIOS": (1.0,),
                      "SCALES_PER_OCTAVE": 1},
        "RESNETS": {"CHANNEL_RATIO": 0.25},
        "TRAIN": {"SCALES": (64,), "MAX_SIZE": 128, "IMS_PER_BATCH": 2,
                  "DATASETS": (dataset,), "SNAPSHOT_ITERS": 3,
                  "WEIGHTS": ""},
        "SOLVER": {"BASE_LR": 1e-3, "MAX_ITER": 6, "WARM_UP_ITERS": 0,
                   "GAMMA": 0.1, "STEPS": (0, 4)},
        "PIXEL_STD": (57.375, 57.12, 58.395),
        "COMPUTE_DTYPE": "float32",
        "OUTPUT_DIR": out_dir,
    }
    if extra:
        for k, v in extra.items():
            if isinstance(v, dict):
                base[k] = {**base.get(k, {}), **v}
            else:
                base[k] = v
    return merge_cfg_from_dict(Config(), base)


def _leaves(params):
    return jax.tree_util.tree_leaves(params)


def test_retinanet_resume_bit_identical(tmp_path, dataset):
    # run A: uninterrupted 6 iters (snapshot written at iter 3)
    cfg_a = _cfg(str(tmp_path / "a"), dataset)
    state_a = train_model(cfg_a)
    train_dir_a = os.path.join(str(tmp_path / "a"), "train", dataset)
    snaps = sorted(glob.glob(os.path.join(train_dir_a, "model_iter*.pkl")))
    assert snaps, "no mid-run snapshot written"

    # run B: fresh OUTPUT_DIR seeded with only the mid-run snapshot; the
    # AUTO_RESUME scan must pick it up and continue 3..5 identically
    out_b = tmp_path / "b" / "train" / dataset
    os.makedirs(out_b)
    shutil.copy(snaps[-1], out_b / os.path.basename(snaps[-1]))
    cfg_b = _cfg(str(tmp_path / "b"), dataset)
    state_b = train_model(cfg_b)

    stats_b = [
        json.loads(l)
        for l in open(os.path.join(out_b, "stats.jsonl"))
    ]
    assert stats_b[0]["iter"] >= 3, "run B did not resume mid-stream"

    la, lb = _leaves(state_a.params), _leaves(state_b.params)
    assert len(la) == len(lb)
    for xa, xb in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))
    for va, vb in zip(_leaves(state_a.velocity), _leaves(state_b.velocity)):
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))


@pytest.mark.e2e
def test_rcnn_resume_bit_identical(tmp_path, dataset):
    """Same proof for the R-CNN family (exercises the fold_in step keys)."""
    extra = {
        "MODEL": {"TYPE": "generalized_rcnn", "FASTER_RCNN": True,
                  "NUM_CLASSES": 9, "CONV_BODY":
                  "FPN.add_fpn_ResNet50_conv5_body"},
        "FPN": {"FPN_ON": True, "MULTILEVEL_RPN": True,
                "MULTILEVEL_ROIS": True, "RPN_MIN_LEVEL": 2,
                "RPN_MAX_LEVEL": 6, "ROI_MIN_LEVEL": 2, "ROI_MAX_LEVEL": 5,
                "COARSEST_STRIDE": 64},
        "TRAIN": {"SCALES": (64,), "MAX_SIZE": 64, "RPN_PRE_NMS_TOP_N": 32,
                  "RPN_POST_NMS_TOP_N": 16, "BATCH_SIZE_PER_IM": 16,
                  "IMS_PER_BATCH": 2, "SNAPSHOT_ITERS": 3, "DATASETS":
                  (dataset,), "WEIGHTS": ""},
        "FAST_RCNN": {"ROI_XFORM_RESOLUTION": 7, "MLP_HEAD_DIM": 32},
    }
    cfg_a = _cfg(str(tmp_path / "a"), dataset, extra)
    state_a = train_model(cfg_a)
    train_dir_a = os.path.join(str(tmp_path / "a"), "train", dataset)
    snaps = sorted(glob.glob(os.path.join(train_dir_a, "model_iter*.pkl")))
    assert snaps

    out_b = tmp_path / "b" / "train" / dataset
    os.makedirs(out_b)
    shutil.copy(snaps[-1], out_b / os.path.basename(snaps[-1]))
    cfg_b = _cfg(str(tmp_path / "b"), dataset, extra)
    state_b = train_model(cfg_b)

    for xa, xb in zip(_leaves(state_a.params), _leaves(state_b.params)):
        np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))


def test_orbax_backend_trains_and_resumes(tmp_path, dataset):
    """TRAIN.CHECKPOINT_BACKEND='orbax' through the real train_model:
    run B trains 3 iters (orbax final at step 3), reruns with MAX_ITER 6 —
    AUTO_RESUME must restore step 3 from the orbax manager and continue —
    and the result must be bit-identical to an uninterrupted pickle-backend
    run A (the backend changes storage, never numerics)."""
    cfg_a = _cfg(str(tmp_path / "a"), dataset)
    state_a = train_model(cfg_a)

    orbax = {"TRAIN": {"CHECKPOINT_BACKEND": "orbax"}}
    cfg_b3 = _cfg(str(tmp_path / "b"), dataset, extra=orbax)
    cfg_b3 = merge_cfg_from_dict(cfg_b3, {"SOLVER": {"MAX_ITER": 3}})
    train_model(cfg_b3)
    ckdir = os.path.join(
        str(tmp_path / "b"), "train", dataset, "checkpoints"
    )
    assert os.path.isdir(ckdir), "orbax manager dir missing"

    cfg_b = _cfg(str(tmp_path / "b"), dataset, extra=orbax)
    state_b = train_model(cfg_b)
    # stats.jsonl: run B's dir already has iters 0-2 from the 3-iter run;
    # a true resume APPENDS exactly 3..5 (one continuous series), while a
    # silent from-scratch restart would duplicate 0-2
    stats_b = [
        json.loads(l)
        for l in open(
            os.path.join(str(tmp_path / "b"), "train", dataset, "stats.jsonl")
        )
    ]
    # stats log at log_period boundaries + each run's final iter, so the
    # 3-iter run leaves [0, 2] and the resumed run appends its final 5;
    # a from-scratch restart would truncate (start_iter==0) and lose the 2
    iters = [s["iter"] for s in stats_b]
    assert iters == sorted(set(iters)), f"duplicated iters (no resume): {iters}"
    assert max(iters) == 5, f"resumed run did not reach iter 5: {iters}"
    assert 2 in iters, f"first run's stats truncated -> not a resume: {iters}"

    for xa, xb in zip(_leaves(state_a.params), _leaves(state_b.params)):
        np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))
    for va, vb in zip(_leaves(state_a.velocity), _leaves(state_b.velocity)):
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))

    # resume no-op: a third invocation finds step 6 == MAX_ITER and skips
    state_c = train_model(_cfg(str(tmp_path / "b"), dataset, extra=orbax))
    for xb, xc in zip(_leaves(state_b.params), _leaves(state_c.params)):
        np.testing.assert_array_equal(np.asarray(xb), np.asarray(xc))

    # eval-side loading: an orbax run writes no model_final.pkl, so
    # load_reference_or_native dispatches on the run DIRECTORY (either the
    # OUTPUT_DIR train dir or its checkpoints/ subdir) and restores the
    # latest step — this is how test_net evaluates a soak run directly
    from sad_tpu.train.train_loop import load_reference_or_native

    run_dir = os.path.join(str(tmp_path / "b"), "train", dataset)
    assert not os.path.exists(os.path.join(run_dir, "model_final.pkl"))
    for path in (run_dir, os.path.join(run_dir, "checkpoints")):
        loaded = load_reference_or_native(path, state_b.params)
        for xb, xl in zip(_leaves(state_b.params), _leaves(loaded)):
            np.testing.assert_array_equal(np.asarray(xb), np.asarray(xl))


def test_checkpoint_backend_rejects_unknown(tmp_path, dataset):
    cfg = _cfg(str(tmp_path / "x"), dataset,
               extra={"TRAIN": {"CHECKPOINT_BACKEND": "s3"}})
    with pytest.raises(ValueError, match="CHECKPOINT_BACKEND"):
        train_model(cfg)
