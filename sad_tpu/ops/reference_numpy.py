"""NumPy golden transcriptions of the reference's custom CUDA loss kernels.

These are the *test oracles*: element-for-element transcriptions (in NCHW
layout, like the CUDA kernels) of:

- SigmoidAdaptiveDistillLoss fwd/bwd
  (ref: caffe2/modules/detectron/sigmoid_adaptive_distillation_loss_op.cu:28-105)
- PowSum (ref: pow_sum_op.cu:26-43)
- SigmoidFocalLoss fwd/bwd (ref: sigmoid_focal_loss_op.cu:25-110)
- SelectSmoothL1Loss fwd/bwd (ref: select_smooth_l1_loss_op.cu:23-96)

They deliberately reproduce the reference's quirks (documented in SURVEY.md
Appendix A), e.g. the fwd/bwd asymmetry in how alpha enters the adaptive
distillation loss, and the unguarded ``pt*log(pt)`` entropy term that is only
finite because beta=0 in all shipped configs. Used only by tests — the
production implementations live in sad_tpu.ops.losses / sad_tpu.ops.pallas.
"""

from __future__ import annotations

import numpy as np

FLT_MIN = np.float32(np.finfo(np.float32).tiny)


def _stable_log1p_exp(x: np.ndarray) -> np.ndarray:
    """log(1 + exp(x - 2*x*[x>=0])) — the CUDA kernels' stable-BCE idiom."""
    ge = (x >= 0).astype(np.float32)
    return np.log(1.0 + np.exp(x - 2.0 * x * ge))


def _stable_log_one_minus_p(x: np.ndarray) -> np.ndarray:
    """-x*[x>=0] - log(1+exp(x-2x[x>=0])) == log(1 - sigmoid(x)), stably."""
    ge = (x >= 0).astype(np.float32)
    return -x * ge - _stable_log1p_exp(x)


def sigmoid_adaptive_distill_loss_fwd(
    logits: np.ndarray,  # (N, D, H, W) float32, D = A * num_classes
    targets: np.ndarray,  # (N, D, H, W) float32 teacher probabilities
    gt: np.ndarray,  # (N, A, H, W) int32 anchor labels
    weight_pos: float,  # scalar normalizer
    gamma: float,
    alpha: float,
    beta: float,
    num_classes: int,
    ignored_label: int,
    scale: float,
):
    """Returns (avg_loss_scalar, per_element_losses)."""
    logits = logits.astype(np.float32)
    targets = targets.astype(np.float32)
    N, D, H, W = logits.shape
    A = D // num_classes
    # t at (n, a, y, x) broadcast over the class sub-axis of D
    t = gt.reshape(N, A, 1, H, W).repeat(num_classes, axis=2).reshape(N, D, H, W)

    Np = max(float(weight_pos), 1.0)
    zn = (1.0 - alpha) / Np
    zp = alpha / Np

    pt = targets
    x = logits
    p = 1.0 / (1.0 + np.exp(-x))
    ge = (x >= 0).astype(np.float32)

    with np.errstate(divide="ignore", invalid="ignore"):
        entropy = pt * np.log(pt) + (1.0 - pt) * np.log(1.0 - pt)
    d_loss = (
        -x * (pt - ge)
        + np.log(np.maximum(FLT_MIN, 1.0 + np.exp(x - 2.0 * x * ge)))
        + beta * entropy
    )
    adaptive_target = 1.0 - np.exp(-d_loss)
    log_p = np.log(np.maximum(FLT_MIN, p))
    log_1mp = _stable_log_one_minus_p(x)
    mask = (t != ignored_label).astype(np.float32)
    losses = (
        -np.power(adaptive_target, gamma)
        * (pt * log_p * zp + (1.0 - pt) * log_1mp * zn)
        * mask
    )
    return np.float32(scale) * losses.sum(dtype=np.float64).astype(np.float32), losses


def sigmoid_adaptive_distill_loss_bwd(
    logits: np.ndarray,
    targets: np.ndarray,
    gt: np.ndarray,
    weight_pos: float,
    gamma: float,
    alpha: float,
    beta: float,
    num_classes: int,
    ignored_label: int,
    scale: float,
    d_avg_loss: float,
) -> np.ndarray:
    """Exact transcription of the backward kernel (NOT the true derivative of
    the forward — alpha enters `DLoss` differently; reproduce as written)."""
    logits = logits.astype(np.float32)
    targets = targets.astype(np.float32)
    N, D, H, W = logits.shape
    A = D // num_classes
    t = gt.reshape(N, A, 1, H, W).repeat(num_classes, axis=2).reshape(N, D, H, W)

    Np = max(float(weight_pos), 1.0)
    pt = targets
    x = logits
    p = 1.0 / (1.0 + np.exp(-x))
    ge = (x >= 0).astype(np.float32)

    with np.errstate(divide="ignore", invalid="ignore"):
        entropy = pt * np.log(pt) + (1.0 - pt) * np.log(1.0 - pt)
    # NB: the bwd kernel omits the FLT_MIN clamp inside the log (cu:92).
    DL = -x * (pt - ge) + _stable_log1p_exp(x) + beta * entropy
    expDL = np.exp(-DL)
    adaptive_target = 1.0 - expDL

    log_p = np.log(np.maximum(FLT_MIN, p))
    log_1mp = _stable_log_one_minus_p(x)
    DLoss = alpha * pt * log_p + (1.0 - alpha) * (1.0 - pt) * log_1mp

    mask = (t != ignored_label).astype(np.float32)
    dX = (
        -(
            -(pt - p) * gamma * np.power(adaptive_target, gamma - 1.0) * expDL * DLoss
            + np.power(adaptive_target, gamma)
            * (alpha * (pt - p) - (1.0 - 2.0 * alpha) * (1.0 - pt) * p)
        )
        * np.float32(d_avg_loss)
        * mask
    )
    dX = dX / Np
    return np.float32(scale) * dX


def pow_sum(inputs, power: float) -> np.float32:
    """Scalar sum over all inputs of elementwise x^power (pow_sum_op.cu:26-43)."""
    total = np.float32(0.0)
    for arr in inputs:
        total = total + np.power(arr.astype(np.float32), np.float32(power)).sum(
            dtype=np.float32
        )
    return np.float32(total)


def sigmoid_focal_loss_fwd(
    logits: np.ndarray,  # (N, D, H, W)
    targets: np.ndarray,  # (N, A, H, W) int labels: -1 ignore / 0 bg / 1..C fg
    weight_pos: float,
    gamma: float,
    alpha: float,
    num_classes: int,
    scale: float,
):
    logits = logits.astype(np.float32)
    N, D, H, W = logits.shape
    A = D // num_classes
    t = (
        targets.reshape(N, A, 1, H, W)
        .repeat(num_classes, axis=2)
        .reshape(N, D, H, W)
    )
    # class index per channel: c % num_classes
    d = (
        np.arange(D, dtype=np.int32).reshape(1, D, 1, 1) % num_classes
    ) * np.ones((N, 1, H, W), dtype=np.int32)

    c1 = (t == (d + 1)).astype(np.float32)
    c2 = ((t != -1) & (t != (d + 1))).astype(np.float32)

    Np = max(float(weight_pos), 1.0)
    zn = (1.0 - alpha) / Np
    zp = alpha / Np

    x = logits
    p = 1.0 / (1.0 + np.exp(-x))
    term1 = np.power(1.0 - p, gamma) * np.log(np.maximum(p, FLT_MIN))
    term2 = np.power(p, gamma) * _stable_log_one_minus_p(x)
    losses = -c1 * term1 * zp - c2 * term2 * zn
    return np.float32(scale) * losses.sum(dtype=np.float64).astype(np.float32), losses


def sigmoid_focal_loss_bwd(
    logits: np.ndarray,
    targets: np.ndarray,
    weight_pos: float,
    gamma: float,
    alpha: float,
    num_classes: int,
    scale: float,
    d_avg_loss: float,
) -> np.ndarray:
    logits = logits.astype(np.float32)
    N, D, H, W = logits.shape
    A = D // num_classes
    t = (
        targets.reshape(N, A, 1, H, W)
        .repeat(num_classes, axis=2)
        .reshape(N, D, H, W)
    )
    d = (
        np.arange(D, dtype=np.int32).reshape(1, D, 1, 1) % num_classes
    ) * np.ones((N, 1, H, W), dtype=np.int32)

    c1 = (t == (d + 1)).astype(np.float32)
    c2 = ((t != -1) & (t != (d + 1))).astype(np.float32)

    Np = max(float(weight_pos), 1.0)
    zn = (1.0 - alpha) / Np
    zp = alpha / Np

    x = logits
    p = 1.0 / (1.0 + np.exp(-x))
    term1 = np.power(1.0 - p, gamma) * (
        1.0 - p - p * gamma * np.log(np.maximum(p, FLT_MIN))
    )
    term2 = np.power(p, gamma) * (
        _stable_log_one_minus_p(x) * (1.0 - p) * gamma - p
    )
    dX = (-c1 * zp * term1 - c2 * zn * term2) * np.float32(d_avg_loss)
    return np.float32(scale) * dX


def select_smooth_l1_loss_fwd(
    bbox_pred: np.ndarray,  # (N, D, H, W), D = 4*A (or 4*A*C class-specific)
    targets: np.ndarray,  # (M, 4)
    locations: np.ndarray,  # (M, 4) float rows [n, c, y, x]; c pre-offset
    fg_num: float,
    beta: float,
    scale: float,
):
    bbox_pred = bbox_pred.astype(np.float32)
    N, D, H, W = bbox_pred.shape
    M = targets.shape[0]
    out = np.zeros_like(bbox_pred)
    if M == 0:
        return np.float32(0.0), out
    S = max(float(fg_num), 1.0)
    for i in range(M):
        n, c, y, x = (int(v) for v in locations[i])
        for j in range(4):
            y_hat = bbox_pred[n, c + j, y, x]
            val = y_hat - targets[i, j]
            abs_val = abs(val)
            if abs_val < beta:
                out[n, c + j, y, x] = (0.5 * val * val / beta) / S
            else:
                out[n, c + j, y, x] = (abs_val - 0.5 * beta) / S
    return np.float32(scale) * out.sum(dtype=np.float64).astype(np.float32), out


def select_smooth_l1_loss_bwd(
    bbox_pred: np.ndarray,
    targets: np.ndarray,
    locations: np.ndarray,
    fg_num: float,
    beta: float,
    scale: float,
    d_avg_loss: float,
) -> np.ndarray:
    bbox_pred = bbox_pred.astype(np.float32)
    dX = np.zeros_like(bbox_pred)
    M = targets.shape[0]
    if M == 0:
        return dX
    S = max(float(fg_num), 1.0)
    for i in range(M):
        n, c, y, x = (int(v) for v in locations[i])
        for j in range(4):
            val = bbox_pred[n, c + j, y, x] - targets[i, j]
            if abs(val) < beta:
                g = val / beta
            else:
                g = float(np.sign(val))
            dX[n, c + j, y, x] = scale * d_avg_loss * g / S
    return dX
