"""ctypes bindings for the native host kernels, with numpy fallback.

Replaces the reference's Cython build (detectron/lib/setup.py + Makefile) with
an on-demand g++ compile of host_kernels.cpp into a cached .so. If no
compiler is available the pure-numpy fallbacks keep everything working.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "host_kernels.cpp")
_SO = os.path.join(_HERE, "_host_kernels.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> Optional[ctypes.CDLL]:
    global _build_failed
    try:
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-ffp-contract=off", "-shared", "-fPIC",
                 "-o", _SO + ".tmp", _SRC],
                check=True, capture_output=True,
            )
            os.replace(_SO + ".tmp", _SO)
        lib = ctypes.CDLL(_SO)
        lib.sad_bbox_overlaps.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.sad_nms.restype = ctypes.c_int64
        lib.sad_nms.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_float,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.sad_soft_nms.restype = ctypes.c_int64
        lib.sad_soft_nms.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_float,
            ctypes.c_float, ctypes.c_float, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.sad_assign_overlaps.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint8),
        ]
        return lib
    except Exception:
        _build_failed = True
        return None


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is None and not _build_failed:
        with _lock:
            if _lib is None and not _build_failed:
                _lib = _build()
    return _lib


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def bbox_overlaps(boxes: np.ndarray, query: np.ndarray) -> np.ndarray:
    """(N, K) IoU matrix, legacy +1 convention (ref: cython_bbox.pyx)."""
    boxes = np.ascontiguousarray(boxes, np.float32)
    query = np.ascontiguousarray(query, np.float32)
    n, k = len(boxes), len(query)
    lib = _get_lib()
    if lib is None:
        from sad_tpu.data.anchors import _iou_matrix

        return _iou_matrix(boxes.astype(np.float64), query.astype(np.float64)).astype(
            np.float32
        )
    out = np.empty((n, k), np.float32)
    lib.sad_bbox_overlaps(_fptr(boxes), n, _fptr(query), k, _fptr(out))
    return out


def assign_overlaps(anchors: np.ndarray, gt: np.ndarray):
    """Fused anchor->gt assignment (a2g_max, a2g_argmax, tie_mask) in one
    native pass — the loader-thread hot loop (ref: cython_bbox overlaps +
    numpy reductions in roi_data/retinanet.py:198-250). Returns None when
    no native lib is available (caller falls back to numpy)."""
    lib = _get_lib()
    if lib is None:
        return None
    anchors = np.ascontiguousarray(anchors, np.float32)
    gt = np.ascontiguousarray(gt, np.float32)
    n, k = len(anchors), len(gt)
    a2g_max = np.empty((n,), np.float32)
    a2g_argmax = np.empty((n,), np.int32)
    tie = np.empty((n,), np.uint8)
    lib.sad_assign_overlaps(
        _fptr(anchors), n, _fptr(gt), k, _fptr(a2g_max),
        a2g_argmax.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        tie.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return a2g_max, a2g_argmax.astype(np.int64), tie.astype(bool)


def nms(dets: np.ndarray, thresh: float) -> np.ndarray:
    """Greedy NMS keep indices (ref: cython_nms.pyx nms / boxes.py:314)."""
    dets = np.ascontiguousarray(dets, np.float32)
    n = len(dets)
    if n == 0:
        return np.zeros((0,), np.int64)
    lib = _get_lib()
    if lib is None:
        return _np_nms(dets, thresh)
    keep = np.empty((n,), np.int64)
    cnt = lib.sad_nms(_fptr(dets), n, ctypes.c_float(thresh), _iptr(keep))
    return keep[:cnt].copy()


def soft_nms(
    dets: np.ndarray,
    sigma: float = 0.5,
    overlap_thresh: float = 0.3,
    score_thresh: float = 0.001,
    method: str = "linear",
) -> Tuple[np.ndarray, np.ndarray]:
    """Soft-NMS; returns (rescored dets in pick order, keep indices)
    (ref: cython_nms.pyx soft_nms / boxes.py:321-331)."""
    methods = {"hard": 0, "linear": 1, "gaussian": 2}
    dets = np.ascontiguousarray(dets, np.float32).copy()
    n = len(dets)
    if n == 0:
        return dets, np.zeros((0,), np.int64)
    lib = _get_lib()
    if lib is None:
        return _np_soft_nms(dets, sigma, overlap_thresh, score_thresh, method)
    keep = np.empty((n,), np.int64)
    cnt = lib.sad_soft_nms(
        _fptr(dets), n, ctypes.c_float(sigma), ctypes.c_float(overlap_thresh),
        ctypes.c_float(score_thresh), ctypes.c_int32(methods[method]), _iptr(keep),
    )
    keep = keep[:cnt].copy()
    return dets[keep], keep


# ------------------------------------------------------------ numpy fallbacks


def _np_nms(dets: np.ndarray, thresh: float) -> np.ndarray:
    x1, y1, x2, y2, scores = dets.T
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = np.argsort(-scores, kind="stable")
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(int(i))
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        inter = w * h
        iou = inter / (areas[i] + areas[order[1:]] - inter)
        order = order[1:][iou <= thresh]
    return np.asarray(keep, np.int64)


def _np_soft_nms(dets, sigma, overlap_thresh, score_thresh, method):
    n = len(dets)
    used = np.zeros(n, bool)
    keep = []
    while True:
        cand = np.where(~used & (dets[:, 4] > score_thresh))[0]
        if len(cand) == 0:
            break
        i = cand[np.argmax(dets[cand, 4])]
        used[i] = True
        keep.append(int(i))
        others = np.where(~used)[0]
        if len(others) == 0:
            continue
        xx1 = np.maximum(dets[i, 0], dets[others, 0])
        yy1 = np.maximum(dets[i, 1], dets[others, 1])
        xx2 = np.minimum(dets[i, 2], dets[others, 2])
        yy2 = np.minimum(dets[i, 3], dets[others, 3])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        inter = w * h
        a1 = (dets[i, 2] - dets[i, 0] + 1) * (dets[i, 3] - dets[i, 1] + 1)
        a2 = (dets[others, 2] - dets[others, 0] + 1) * (
            dets[others, 3] - dets[others, 1] + 1
        )
        ov = inter / (a1 + a2 - inter)
        if method == "linear":
            weight = np.where(ov > overlap_thresh, 1.0 - ov, 1.0)
        elif method == "gaussian":
            weight = np.exp(-(ov * ov) / sigma)
        else:
            weight = np.where(ov > overlap_thresh, 0.0, 1.0)
        dets[others, 4] *= weight
    keep = np.asarray(keep, np.int64)
    return dets[keep], keep
