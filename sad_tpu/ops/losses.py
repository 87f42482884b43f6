"""Detection loss ops with reference-exact custom VJPs.

Each op reproduces, element for element, the math of the corresponding custom
CUDA op in the reference (``caffe2/modules/detectron/*.cu``) — including the
reference's *intentional* quirks (SURVEY.md Appendix A):

- ``sigmoid_adaptive_distill_loss`` — the SAD novel loss
  (sigmoid_adaptive_distillation_loss_op.cu:28-105). Its published backward is
  transcribed as PUBLISHED (alpha enters ``DLoss`` folded differently than
  the forward — algebraically the same function in the smooth region, but
  diverging where the forward's log(max(FLT_MIN, p)) clamp bites);
  we replicate the published backward via ``jax.custom_vjp`` rather than
  letting autodiff differentiate the forward.
- ``sigmoid_focal_loss`` (sigmoid_focal_loss_op.cu:25-110).
- ``select_smooth_l1_loss`` (select_smooth_l1_loss_op.cu:23-96) — re-designed
  densely for TPU: the reference gathers M sparse fg locations; on TPU the
  dense masked form (mask = label grid > 0) computes the same value with
  static shapes and no host-side gather.
- ``smooth_l1_loss`` (smooth_l1_loss_op.cu) — dense Fast R-CNN bbox loss.
- ``pow_sum`` (pow_sum_op.cu:26-43) — the adaptive distillation normalizer.

Layout: TPU-native NHWC-ish — logits/teacher probs are ``(..., A, C)``,
anchor labels are ``(..., A)`` int32 (-1 ignore band / 0 bg / 1..C fg). The
leading dims are typically (N, H, W). Gradients flow only to the student
logits, mirroring the reference gradient makers that pass GI(0) only
(sigmoid_adaptive_distillation_loss_op.cc:99-112) — the teacher gets nothing.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

FLT_MIN = float(np.finfo(np.float32).tiny)


def _f32(x):
    return jnp.asarray(x, jnp.float32)


def _stable_log1p_exp(x: jnp.ndarray) -> jnp.ndarray:
    """log(1 + exp(x - 2*x*[x>=0])) — the CUDA kernels' stable-BCE idiom."""
    ge = (x >= 0).astype(jnp.float32)
    return jnp.log(1.0 + jnp.exp(x - 2.0 * x * ge))


def _stable_log_one_minus_p(x: jnp.ndarray) -> jnp.ndarray:
    """log(1 - sigmoid(x)) computed stably as in the CUDA kernels."""
    ge = (x >= 0).astype(jnp.float32)
    return -x * ge - _stable_log1p_exp(x)


def _int_zero_cotangent(x):
    """float0 cotangent for integer (non-differentiable) primal inputs."""
    return np.zeros(x.shape, dtype=jax.dtypes.float0)


# --------------------------------------------------------------------------- #
# SigmoidFocalLoss
# --------------------------------------------------------------------------- #


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def sigmoid_focal_loss(
    logits: jnp.ndarray,  # (..., A, C) float
    labels: jnp.ndarray,  # (..., A) int32
    normalizer: jnp.ndarray,  # scalar: total fg count for this group
    gamma: float,
    alpha: float,
    scale: float,
) -> jnp.ndarray:
    """RetinaNet sigmoid focal loss, summed then scaled (scalar output).

    Ref: sigmoid_focal_loss_op.cu:25-66; wired at retinanet_heads.py:281-291.
    """
    loss, _ = _focal_fwd_impl(logits, labels, normalizer, gamma, alpha, scale)
    return loss


def _focal_terms(logits, labels):
    x = _f32(logits)
    num_classes = x.shape[-1]
    t = labels[..., None].astype(jnp.int32)  # (..., A, 1) broadcast over C
    d = jax.lax.broadcasted_iota(jnp.int32, x.shape, len(x.shape) - 1)
    c1 = (t == (d + 1)).astype(jnp.float32)
    c2 = ((t != -1) & (t != (d + 1))).astype(jnp.float32)
    p = jax.nn.sigmoid(x)
    return x, p, c1, c2, num_classes


def _focal_fwd_impl(logits, labels, normalizer, gamma, alpha, scale):
    x, p, c1, c2, _ = _focal_terms(logits, labels)
    Np = jnp.maximum(_f32(normalizer), 1.0)
    zn = (1.0 - alpha) / Np
    zp = alpha / Np
    term1 = jnp.power(1.0 - p, gamma) * jnp.log(jnp.maximum(p, FLT_MIN))
    term2 = jnp.power(p, gamma) * _stable_log_one_minus_p(x)
    losses = -c1 * term1 * zp - c2 * term2 * zn
    return jnp.float32(scale) * jnp.sum(losses, dtype=jnp.float32), None


def _focal_fwd(logits, labels, normalizer, gamma, alpha, scale):
    loss, _ = _focal_fwd_impl(logits, labels, normalizer, gamma, alpha, scale)
    return loss, (logits, labels, normalizer)


def _focal_bwd(gamma, alpha, scale, res, g):
    logits, labels, normalizer = res
    x, p, c1, c2, _ = _focal_terms(logits, labels)
    Np = jnp.maximum(_f32(normalizer), 1.0)
    zn = (1.0 - alpha) / Np
    zp = alpha / Np
    # Exact transcription of sigmoid_focal_loss_op.cu:94-107.
    term1 = jnp.power(1.0 - p, gamma) * (
        1.0 - p - p * gamma * jnp.log(jnp.maximum(p, FLT_MIN))
    )
    term2 = jnp.power(p, gamma) * (
        _stable_log_one_minus_p(x) * (1.0 - p) * gamma - p
    )
    dX = (-c1 * zp * term1 - c2 * zn * term2) * _f32(g)
    dX = jnp.float32(scale) * dX
    return (
        dX.astype(logits.dtype),
        _int_zero_cotangent(labels),
        jnp.zeros_like(_f32(normalizer)),
    )


sigmoid_focal_loss.defvjp(_focal_fwd, _focal_bwd)


# --------------------------------------------------------------------------- #
# SigmoidAdaptiveDistillLoss — the SAD novel loss
# --------------------------------------------------------------------------- #


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def sigmoid_adaptive_distill_loss(
    logits: jnp.ndarray,  # student logits (..., A, C)
    teacher_probs: jnp.ndarray,  # teacher sigmoid probs (..., A, C)
    labels: jnp.ndarray,  # GT anchor labels (..., A) int32
    normalizer: jnp.ndarray,  # scalar: PowSum normalizer (or fg count)
    gamma: float,
    alpha: float,
    beta: float,
    ignored_label: int,
    scale: float,
) -> jnp.ndarray:
    """Adaptive distillation loss (scalar).

    Per element: D = BCE(x, pt) + beta*(-H(pt)); q = 1 - exp(-D);
    loss = -q^gamma * (pt*log p * alpha/Np + (1-pt)*log(1-p) * (1-alpha)/Np),
    masked where the GT label == ignored_label; summed and scaled by
    ``scale`` (= loss_scale * T^2, retinanet_heads.py:342).

    Ref: sigmoid_adaptive_distillation_loss_op.cu:28-67 (fwd), :69-105 (bwd).
    Gradient flows to the student logits only (.cc:99-112).
    """
    loss, _ = _distill_fwd_impl(
        logits, teacher_probs, labels, normalizer, gamma, alpha, beta,
        ignored_label, scale,
    )
    return loss


def _distill_D(x, pt, beta):
    ge = (x >= 0).astype(jnp.float32)
    bce = -x * (pt - ge) + jnp.log(
        jnp.maximum(FLT_MIN, 1.0 + jnp.exp(x - 2.0 * x * ge))
    )
    if beta != 0.0:
        # The reference computes pt*log(pt) unguarded; it is only finite
        # because beta=0 in all shipped configs (SURVEY.md Appendix A). For
        # beta != 0 we clamp pt away from {0,1} to keep the entropy finite.
        pt_c = jnp.clip(pt, FLT_MIN, 1.0 - 1e-7)
        bce = bce + beta * (pt_c * jnp.log(pt_c) + (1.0 - pt_c) * jnp.log(1.0 - pt_c))
    return bce


def _distill_fwd_impl(
    logits, teacher_probs, labels, normalizer, gamma, alpha, beta,
    ignored_label, scale,
):
    x = _f32(logits)
    pt = _f32(teacher_probs)
    t = labels[..., None].astype(jnp.int32)  # broadcast over class dim
    mask = (t != ignored_label).astype(jnp.float32)

    Np = jnp.maximum(_f32(normalizer), 1.0)
    zn = (1.0 - alpha) / Np
    zp = alpha / Np

    p = jax.nn.sigmoid(x)
    D = _distill_D(x, pt, beta)
    q = 1.0 - jnp.exp(-D)
    losses = (
        -jnp.power(q, gamma)
        * (pt * jnp.log(jnp.maximum(FLT_MIN, p)) * zp
           + (1.0 - pt) * _stable_log_one_minus_p(x) * zn)
        * mask
    )
    return jnp.float32(scale) * jnp.sum(losses, dtype=jnp.float32), None


def _distill_fwd(
    logits, teacher_probs, labels, normalizer, gamma, alpha, beta,
    ignored_label, scale,
):
    loss, _ = _distill_fwd_impl(
        logits, teacher_probs, labels, normalizer, gamma, alpha, beta,
        ignored_label, scale,
    )
    return loss, (logits, teacher_probs, labels, normalizer)


def _distill_bwd(gamma, alpha, beta, ignored_label, scale, res, g):
    logits, teacher_probs, labels, normalizer = res
    x = _f32(logits)
    pt = _f32(teacher_probs)
    t = labels[..., None].astype(jnp.int32)
    mask = (t != ignored_label).astype(jnp.float32)
    Np = jnp.maximum(_f32(normalizer), 1.0)

    p = jax.nn.sigmoid(x)
    # Exact transcription of the published backward (.cu:92-102); note it is
    # published kernel's factoring: alpha folded inside DLoss (equals the
    # true derivative except in the forward's FLT_MIN clamp region —
    # tests/test_gradient_checks.py).
    DL = _distill_D(x, pt, beta)
    expDL = jnp.exp(-DL)
    q = 1.0 - expDL
    DLoss = alpha * pt * jnp.log(jnp.maximum(FLT_MIN, p)) + (1.0 - alpha) * (
        1.0 - pt
    ) * _stable_log_one_minus_p(x)
    dX = (
        -(
            -(pt - p) * gamma * jnp.power(q, gamma - 1.0) * expDL * DLoss
            + jnp.power(q, gamma) * (alpha * (pt - p) - (1.0 - 2.0 * alpha) * (1.0 - pt) * p)
        )
        * _f32(g)
        * mask
    ) / Np
    dX = jnp.float32(scale) * dX
    return (
        dX.astype(logits.dtype),
        jnp.zeros_like(teacher_probs),  # frozen teacher: no gradient
        _int_zero_cotangent(labels),
        jnp.zeros_like(_f32(normalizer)),
    )


sigmoid_adaptive_distill_loss.defvjp(_distill_fwd, _distill_bwd)


# --------------------------------------------------------------------------- #
# PowSum — adaptive normalizer
# --------------------------------------------------------------------------- #


def pow_sum(inputs: Sequence[jnp.ndarray], power: float) -> jnp.ndarray:
    """Scalar sum over all inputs of elementwise ``x ** power``.

    Ref: pow_sum_op.cu:26-43; wired over the per-level teacher prob maps with
    power = DISTILLATION.LOGITS_POWER at retinanet_heads.py:320-328. Gradient
    to the inputs is never used in the reference (teacher side); we expose the
    natural derivative anyway via jnp autodiff.
    """
    total = jnp.float32(0.0)
    for arr in inputs:
        total = total + jnp.sum(
            jnp.power(_f32(arr), jnp.float32(power)), dtype=jnp.float32
        )
    return total


# --------------------------------------------------------------------------- #
# SelectSmoothL1Loss — dense masked TPU form
# --------------------------------------------------------------------------- #


@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def select_smooth_l1_loss(
    bbox_pred: jnp.ndarray,  # (..., A, 4) float
    bbox_targets: jnp.ndarray,  # (..., A, 4) dense targets (0 off-fg)
    fg_mask: jnp.ndarray,  # (..., A) bool/float: label > 0
    fg_num: jnp.ndarray,  # scalar: total fg count for this group
    beta: float,
    scale: float,
) -> jnp.ndarray:
    """Smooth-L1 over fg anchor locations, normalized by total fg count.

    The reference gathers M sparse rows [n, c, y, x]
    (select_smooth_l1_loss_op.cu:23-48); on TPU we keep the dense grid and
    mask — identical total because every fg location appears exactly once.
    Empty-fg short-circuits to 0 exactly like .cu:103-107 (mask sums nothing).
    """
    loss, _ = _ssl1_fwd_impl(bbox_pred, bbox_targets, fg_mask, fg_num, beta, scale)
    return loss


def _huber(val, beta):
    abs_val = jnp.abs(val)
    return jnp.where(
        abs_val < beta, 0.5 * val * val / beta, abs_val - 0.5 * beta
    )


def _ssl1_fwd_impl(bbox_pred, bbox_targets, fg_mask, fg_num, beta, scale):
    pred = _f32(bbox_pred)
    tgt = _f32(bbox_targets)
    m = fg_mask.astype(jnp.float32)[..., None]  # broadcast over the 4 coords
    S = jnp.maximum(_f32(fg_num), 1.0)
    losses = _huber(pred - tgt, beta) / S * m
    return jnp.float32(scale) * jnp.sum(losses, dtype=jnp.float32), None


def _ssl1_fwd(bbox_pred, bbox_targets, fg_mask, fg_num, beta, scale):
    loss, _ = _ssl1_fwd_impl(bbox_pred, bbox_targets, fg_mask, fg_num, beta, scale)
    return loss, (bbox_pred, bbox_targets, fg_mask, fg_num)


def _ssl1_bwd(beta, scale, res, g):
    bbox_pred, bbox_targets, fg_mask, fg_num = res
    val = _f32(bbox_pred) - _f32(bbox_targets)
    m = fg_mask.astype(jnp.float32)[..., None]
    S = jnp.maximum(_f32(fg_num), 1.0)
    # f'(x) = x/beta if |x|<beta else sign(x)  (select_smooth_l1_loss_op.cu:63-84)
    dval = jnp.where(jnp.abs(val) < beta, val / beta, jnp.sign(val))
    dX = jnp.float32(scale) * _f32(g) * dval / S * m
    return (
        dX.astype(bbox_pred.dtype),
        jnp.zeros_like(bbox_targets),
        jnp.zeros_like(fg_mask, dtype=jnp.float32)
        if jnp.issubdtype(fg_mask.dtype, jnp.floating)
        else _int_zero_cotangent(fg_mask),
        jnp.zeros_like(_f32(fg_num)),
    )


select_smooth_l1_loss.defvjp(_ssl1_fwd, _ssl1_bwd)


# --------------------------------------------------------------------------- #
# SmoothL1Loss — dense Fast R-CNN bbox loss (inherited surface)
# --------------------------------------------------------------------------- #


def smooth_l1_loss(
    y_hat: jnp.ndarray,
    y: jnp.ndarray,
    inside_weights: jnp.ndarray,
    outside_weights: jnp.ndarray,
    beta: float = 1.0,
    scale: float = 1.0,
) -> jnp.ndarray:
    """scale/N * sum(out_w * huber(in_w * (y_hat - y), beta)).

    Ref: smooth_l1_loss_op.cu (norm = scale/N where N = batch dim). Uses
    jnp autodiff — the reference backward is the true derivative here.
    """
    n = y.shape[0]
    d = inside_weights * (_f32(y_hat) - _f32(y))
    losses = outside_weights * _huber(d, beta)
    return jnp.float32(scale / n) * jnp.sum(losses, dtype=jnp.float32)
