"""Anchor generation + RetinaNet label assignment tests."""

import numpy as np
import pytest

from sad_tpu.data import anchors as A

# The canonical py-faster-rcnn anchor matrix for base 16, scales (8, 16, 32)
# (= sizes 128/256/512), ratios (0.5, 1, 2) — a public golden constant. (The
# MATLAB variant quoted in reference docstrings is +1 off due to 1-indexing.)
GOLDEN_16 = np.array(
    [
        [-84., -40., 99., 55.],
        [-176., -88., 191., 103.],
        [-360., -184., 375., 199.],
        [-56., -56., 71., 71.],
        [-120., -120., 135., 135.],
        [-248., -248., 263., 263.],
        [-36., -80., 51., 95.],
        [-80., -168., 95., 183.],
        [-168., -344., 183., 359.],
    ]
)


def test_cell_anchor_golden_matrix():
    got = A.generate_cell_anchors(16, (128, 256, 512), (0.5, 1, 2))
    # reference enumerates ratio-major with scales inner; ours matches
    np.testing.assert_array_equal(got, GOLDEN_16)


def test_retinanet_cell_anchor_ordering_and_shape():
    # octave-major, aspect-minor ordering (retinanet.py:144)
    ars = (1.0, 2.0, 0.5)
    ca = A.retinanet_cell_anchors(3, 4.0, ars, 3)
    assert ca.shape == (9, 4)
    # index a = octave * len(ars) + aspect
    for octave in range(3):
        size = 8.0 * (2.0 ** (octave / 3.0)) * 4.0
        for ai, ar in enumerate(ars):
            one = A.generate_cell_anchors(8.0, (size,), (ar,))[0]
            np.testing.assert_allclose(ca[octave * 3 + ai], one)


def test_field_of_anchors_positions():
    ca = np.array([[0.0, 0.0, 7.0, 7.0]])
    f = A.field_of_anchors(ca, 8.0, 3, 4)
    assert f.shape == (3, 4, 1, 4)
    np.testing.assert_allclose(f[0, 0, 0], [0, 0, 7, 7])
    np.testing.assert_allclose(f[2, 3, 0], [24, 16, 31, 23])  # x=3*8, y=2*8


def _tiny_grid():
    return A.all_field_anchors(
        levels=(3, 4),
        anchor_scale=4.0,
        aspect_ratios=(1.0,),
        scales_per_octave=1,
        canvas_h=64,
        canvas_w=64,
    )


class TestAssignment:
    def test_positive_and_negative_bands(self):
        grid = _tiny_grid()
        # one gt exactly equal to the anchor at P3 position (2, 2): IoU = 1
        anchor = grid.anchors[0][2, 2, 0]
        gt = anchor[None, :].astype(np.float64)
        labels, targets, masks, num_fg, num_bg = A.assign_retinanet_labels(
            grid, gt, np.array([7]), 64, 64
        )
        assert labels[0][2, 2, 0] == 7
        assert masks[0][2, 2, 0]
        np.testing.assert_allclose(targets[0][2, 2, 0], 0.0, atol=1e-6)
        assert num_fg >= 1
        # far-away anchors are background
        assert labels[0][7, 7, 0] == 0

    def test_tie_rule_marks_best_anchor_even_below_threshold(self):
        grid = _tiny_grid()
        # a tiny gt box overlapping nothing above 0.4: its best anchor is
        # foreground via the tie rule, but then stomped to bg by the
        # negative-band rule (reference quirk) — while num_fg still counts it.
        gt = np.array([[17.0, 17.0, 20.0, 20.0]])
        labels, targets, masks, num_fg, num_bg = A.assign_retinanet_labels(
            grid, gt, np.array([3]), 64, 64
        )
        # pre-stomp fg got counted:
        assert num_fg >= 1
        # but every label is now bg or ignore (nothing >= 1 survives the stomp)
        assert all((l < 1).all() for l in labels)
        # and the bbox mask follows post-stomp labels:
        assert not any(m.any() for m in masks)

    def test_crop_to_image_extent_ignores_labels_only(self):
        grid = _tiny_grid()
        anchor = grid.anchors[0][1, 1, 0]
        gt = anchor[None, :]
        # image content occupies only 24x24 of the 64x64 canvas
        labels, targets, masks, num_fg, _ = A.assign_retinanet_labels(
            grid, gt, np.array([1]), 24, 24
        )
        l3 = labels[0]
        h = int(24 / 8)
        assert (l3[h:, :, :] == -1).all()
        assert (l3[:, h:, :] == -1).all()
        assert l3[1, 1, 0] == 1

    def test_no_gt_all_background(self):
        grid = _tiny_grid()
        labels, targets, masks, num_fg, num_bg = A.assign_retinanet_labels(
            grid, np.zeros((0, 4)), np.zeros((0,), np.int32), 64, 64
        )
        assert num_fg == 0
        assert all((l == 0).all() for l in labels)

    def test_encode_matches_bbox_transform_roundtrip(self):
        from sad_tpu.ops.box_transforms import bbox_transform

        rng = np.random.RandomState(0)
        ex = rng.uniform(0, 50, (10, 2))
        ex = np.concatenate([ex, ex + rng.uniform(5, 30, (10, 2))], axis=1)
        gt = rng.uniform(0, 50, (10, 2))
        gt = np.concatenate([gt, gt + rng.uniform(5, 30, (10, 2))], axis=1)
        deltas = A._encode_boxes(ex, gt)
        back = np.asarray(bbox_transform(ex.astype(np.float32), deltas))
        np.testing.assert_allclose(back, gt, rtol=1e-4, atol=1e-3)
