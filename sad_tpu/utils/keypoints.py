"""Keypoint utilities (ref: detectron/lib/utils/keypoints.py).

COCO 17-keypoint metadata, horizontal-flip index mapping, and heatmap ->
keypoint decoding for inference (heatmaps_to_keypoints)."""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

COCO_KEYPOINTS = [
    "nose", "left_eye", "right_eye", "left_ear", "right_ear",
    "left_shoulder", "right_shoulder", "left_elbow", "right_elbow",
    "left_wrist", "right_wrist", "left_hip", "right_hip",
    "left_knee", "right_knee", "left_ankle", "right_ankle",
]


def get_keypoints() -> Tuple[List[str], dict]:
    """Names + flip map (ref: keypoints.py get_keypoints)."""
    flip_map = {}
    for name in COCO_KEYPOINTS:
        if name.startswith("left_"):
            flip_map[name] = "right_" + name[5:]
            flip_map["right_" + name[5:]] = name
    return COCO_KEYPOINTS, flip_map


def flip_idx_for_names(names: List[str]) -> np.ndarray:
    """Index permutation applying the left/right swap for an arbitrary
    keypoint-name list (pairs matched by left_/right_ prefix — the same
    correspondence the reference hard-codes for COCO in
    keypoints.py:53-62 and applies at roidb flip time via
    flip_keypoints, keypoints.py:71-86)."""
    idx = np.arange(len(names))
    lookup = {n: i for i, n in enumerate(names)}
    for i, n in enumerate(names):
        if n.startswith("left_") and ("right_" + n[5:]) in lookup:
            j = lookup["right_" + n[5:]]
            idx[i], idx[j] = j, i
    return idx


def flip_keypoint_channels() -> np.ndarray:
    """Index permutation applying the left/right swap (COCO 17)."""
    return flip_idx_for_names(COCO_KEYPOINTS)


def heatmaps_to_keypoints(
    heatmaps: np.ndarray,  # (R, S, S, K) logits or probs
    rois: np.ndarray,  # (R, 4) xyxy in image coords
) -> np.ndarray:
    """Decode per-roi heatmaps to keypoint (x, y, logit, prob) rows
    (ref: keypoints.py heatmaps_to_keypoints: argmax per channel, mapped back
    through the roi transform). Returns (R, 4, K)."""
    r, s, _, k = heatmaps.shape
    out = np.zeros((r, 4, k), np.float32)
    widths = np.maximum(rois[:, 2] - rois[:, 0], 1.0)
    heights = np.maximum(rois[:, 3] - rois[:, 1], 1.0)
    for i in range(r):
        hm = heatmaps[i]  # (S, S, K)
        flat = hm.reshape(-1, k)
        pos = flat.argmax(axis=0)
        py, px = np.divmod(pos, s)
        # +0.5: center of the heatmap cell (keypoints.py coordinate mapping)
        x = (px + 0.5) * widths[i] / s + rois[i, 0]
        y = (py + 0.5) * heights[i] / s + rois[i, 1]
        logit = flat[pos, np.arange(k)]
        e = np.exp(flat - flat.max(axis=0, keepdims=True))
        prob = (e / e.sum(axis=0, keepdims=True))[pos, np.arange(k)]
        out[i] = np.stack([x, y, logit, prob])
    return out


# COCO 17-keypoint OKS sigmas (ref: keypoints.py compute_oks)
_OKS_SIGMAS = np.array(
    [.26, .25, .25, .35, .35, .79, .79, .72, .72, .62, .62, 1.07, 1.07,
     .87, .87, .89, .89], np.float64
) / 10.0


def compute_oks(
    src_keypoints: np.ndarray,  # (4, K) decoded rows [x, y, logit, prob]
    src_roi: np.ndarray,  # (4,)
    dst_keypoints: np.ndarray,  # (N, 4, K)
    dst_roi: np.ndarray,  # (N, 4)
) -> np.ndarray:
    """OKS of each dst prediction wrt src (ref: keypoints.py compute_oks:
    src-roi area, all keypoints counted, mean of exp terms)."""
    k = src_keypoints.shape[1]
    sig = _OKS_SIGMAS if k == 17 else np.full(k, 0.05)
    vars_ = (sig * 2) ** 2
    src_area = (
        (src_roi[2] - src_roi[0] + 1) * (src_roi[3] - src_roi[1] + 1)
    )
    dx = dst_keypoints[:, 0, :] - src_keypoints[0, :]
    dy = dst_keypoints[:, 1, :] - src_keypoints[1, :]
    e = (dx ** 2 + dy ** 2) / vars_ / (src_area + np.spacing(1)) / 2
    return np.sum(np.exp(-e), axis=1) / e.shape[1]


def nms_oks(
    kp_predictions: np.ndarray,  # (N, 4, K) heatmaps_to_keypoints rows
    rois: np.ndarray,  # (N, 4)
    thresh: float,
) -> list:
    """Greedy NMS on keypoint predictions ranked by mean logit
    (ref: keypoints.py nms_oks; test.py keypoint_results applies it with
    thresh=0.3 when KRCNN.NMS_OKS)."""
    scores = np.mean(kp_predictions[:, 2, :], axis=1)
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(int(i))
        ovr = compute_oks(
            kp_predictions[i], rois[i], kp_predictions[order[1:]],
            rois[order[1:]],
        )
        inds = np.where(ovr <= thresh)[0]
        order = order[inds + 1]
    return keep
