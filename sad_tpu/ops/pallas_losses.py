"""Fused Pallas TPU kernel for the RetinaNet classification losses.

Computes the sigmoid focal loss AND the sigmoid adaptive distillation loss
(SURVEY.md Appendix A) in ONE pass over the dense per-anchor grid — the
student logits and teacher probabilities are read from HBM once instead of
once per loss, and the backward emits the combined dX in one pass. This is
the TPU replacement for the reference's two separate CUDA kernel launches
(sigmoid_focal_loss_op.cu + sigmoid_adaptive_distillation_loss_op.cu) over
the same (N, A*80, H, W) tensors.

Layout: rows = flattened (batch, y, x, anchor), lanes = classes (C=80; the
VPU pads lanes to 128 in-register, but HBM traffic — the bottleneck of this
elementwise kernel — only moves the real 80). Per-row normalizers let one
kernel serve all device-groups (the reference normalizes per GPU).

Numerics are identical to sad_tpu.ops.losses (tested against the same NumPy
transcriptions of the CUDA kernels), including the reference's published
backward that is NOT the true derivative of its forward.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FLT_MIN = float(np.finfo(np.float32).tiny)
TILE_ROWS = 256


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _stable_log1p_exp(x):
    ge = (x >= 0).astype(jnp.float32)
    return jnp.log(1.0 + jnp.exp(x - 2.0 * x * ge))


def _log_one_minus_p(x):
    ge = (x >= 0).astype(jnp.float32)
    return -x * ge - _stable_log1p_exp(x)


def _common_terms(x, pt, t, gamma_d, alpha_d, beta_d, ignored_label, row_valid):
    """Shared subexpressions of both losses' fwd/bwd."""
    p = jax.nn.sigmoid(x)
    log_p = jnp.log(jnp.maximum(p, FLT_MIN))
    log_1mp = _log_one_minus_p(x)
    dmask = (t != ignored_label).astype(jnp.float32) * row_valid
    ge = (x >= 0).astype(jnp.float32)
    D = -x * (pt - ge) + jnp.log(
        jnp.maximum(FLT_MIN, 1.0 + jnp.exp(x - 2.0 * x * ge))
    )
    if beta_d != 0.0:
        pt_c = jnp.clip(pt, FLT_MIN, 1.0 - 1e-7)
        D = D + beta_d * (pt_c * jnp.log(pt_c) + (1.0 - pt_c) * jnp.log(1.0 - pt_c))
    q = 1.0 - jnp.exp(-D)
    return p, log_p, log_1mp, dmask, D, q


def _fwd_kernel(
    # scalar-prefetch
    nrows_ref,
    # tensor inputs
    x_ref, pt_ref, t_ref, fgn_ref, dn_ref,
    # outputs
    out_ref,
    *,
    num_classes: int,
    gamma_f: float, alpha_f: float,
    gamma_d: float, alpha_d: float, beta_d: float, ignored_label: int,
):
    i = pl.program_id(0)
    x = x_ref[:].astype(jnp.float32)
    pt = pt_ref[:].astype(jnp.float32)
    t = t_ref[:]  # (TILE_ROWS, 1) int32, broadcasts over lanes
    rows, lanes = x.shape

    row_idx = i * TILE_ROWS + jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    row_valid = (row_idx < nrows_ref[0]).astype(jnp.float32)

    d = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 1)
    lane_valid = (d < num_classes).astype(jnp.float32)
    valid = row_valid * lane_valid

    fg_np = jnp.maximum(fgn_ref[:], 1.0)  # (rows, 1)
    dn_np = jnp.maximum(dn_ref[:], 1.0)

    p, log_p, log_1mp, dmask, D, q = _common_terms(
        x, pt, t, gamma_d, alpha_d, beta_d, ignored_label, row_valid
    )

    # ---- focal (sigmoid_focal_loss_op.cu:25-66)
    c1 = (t == (d + 1)).astype(jnp.float32)
    c2 = ((t != -1) & (t != (d + 1))).astype(jnp.float32)
    zp_f = alpha_f / fg_np
    zn_f = (1.0 - alpha_f) / fg_np
    term1 = jnp.power(1.0 - p, gamma_f) * log_p
    term2 = jnp.power(p, gamma_f) * log_1mp
    focal = (-c1 * term1 * zp_f - c2 * term2 * zn_f) * valid

    # ---- adaptive distill (sigmoid_adaptive_distillation_loss_op.cu:28-67)
    zp_d = alpha_d / dn_np
    zn_d = (1.0 - alpha_d) / dn_np
    distill = (
        -jnp.power(q, gamma_d)
        * (pt * log_p * zp_d + (1.0 - pt) * log_1mp * zn_d)
        * dmask
        * lane_valid
    )

    @pl.when(i == 0)
    def _init():
        out_ref[0, 0] = jnp.float32(0.0)
        out_ref[0, 1] = jnp.float32(0.0)

    out_ref[0, 0] += jnp.sum(focal)
    out_ref[0, 1] += jnp.sum(distill)


def _bwd_kernel(
    nrows_ref,
    x_ref, pt_ref, t_ref, fgn_ref, dn_ref, g_ref,
    dx_ref,
    *,
    num_classes: int,
    gamma_f: float, alpha_f: float,
    gamma_d: float, alpha_d: float, beta_d: float, ignored_label: int,
):
    i = pl.program_id(0)
    x = x_ref[:].astype(jnp.float32)
    pt = pt_ref[:].astype(jnp.float32)
    t = t_ref[:]
    rows, lanes = x.shape

    row_idx = i * TILE_ROWS + jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    row_valid = (row_idx < nrows_ref[0]).astype(jnp.float32)
    d = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 1)

    fg_np = jnp.maximum(fgn_ref[:], 1.0)
    dn_np = jnp.maximum(dn_ref[:], 1.0)
    g_f = g_ref[0, 0]  # incoming cotangent of the focal sum
    g_d = g_ref[0, 1]  # incoming cotangent of the distill sum

    p, log_p, log_1mp, dmask, D, q = _common_terms(
        x, pt, t, gamma_d, alpha_d, beta_d, ignored_label, row_valid
    )

    # ---- focal backward (sigmoid_focal_loss_op.cu:94-107)
    c1 = (t == (d + 1)).astype(jnp.float32)
    c2 = ((t != -1) & (t != (d + 1))).astype(jnp.float32)
    zp_f = alpha_f / fg_np
    zn_f = (1.0 - alpha_f) / fg_np
    term1 = jnp.power(1.0 - p, gamma_f) * (1.0 - p - p * gamma_f * log_p)
    term2 = jnp.power(p, gamma_f) * (log_1mp * (1.0 - p) * gamma_f - p)
    dx_f = (-c1 * zp_f * term1 - c2 * zn_f * term2) * g_f * row_valid

    # ---- distill backward (sigmoid_adaptive_distillation_loss_op.cu:92-102)
    expDL = jnp.exp(-D)
    DLoss = alpha_d * pt * log_p + (1.0 - alpha_d) * (1.0 - pt) * log_1mp
    dx_d = (
        -(
            -(pt - p) * gamma_d * jnp.power(q, gamma_d - 1.0) * expDL * DLoss
            + jnp.power(q, gamma_d)
            * (alpha_d * (pt - p) - (1.0 - 2.0 * alpha_d) * (1.0 - pt) * p)
        )
        * g_d
        * dmask
        / dn_np
    )

    dx_ref[:] = dx_f + dx_d


def _flatten_inputs(logits, teacher_probs, labels, fg_norm, distill_norm):
    """(..., A, C) grids -> (Mpad, C) rows with per-row normalizers."""
    c = logits.shape[-1]
    x = logits.reshape(-1, c)
    pt = teacher_probs.reshape(-1, c)
    t = labels.reshape(-1, 1).astype(jnp.int32)
    m = x.shape[0]
    # normalizers: scalar, or any shape broadcastable to labels' shape
    # (e.g. per-group (G,1,1,1,1) -> per-row), reproducing the reference's
    # per-GPU Np without per-group kernel launches
    fg = jnp.broadcast_to(
        jnp.asarray(fg_norm, jnp.float32), labels.shape
    ).reshape(-1, 1)
    dn = jnp.broadcast_to(
        jnp.asarray(distill_norm, jnp.float32), labels.shape
    ).reshape(-1, 1)
    mpad = _ceil_to(m, TILE_ROWS)
    if mpad != m:
        pad = mpad - m
        x = jnp.pad(x, ((0, pad), (0, 0)))
        pt = jnp.pad(pt, ((0, pad), (0, 0)))
        t = jnp.pad(t, ((0, pad), (0, 0)))
        fg = jnp.pad(fg, ((0, pad), (0, 0)), constant_values=1.0)
        dn = jnp.pad(dn, ((0, pad), (0, 0)), constant_values=1.0)
    return x, pt, t, fg, dn, m, mpad


def _row_spec(width):
    # index_map receives the scalar-prefetch ref as an extra trailing arg
    return pl.BlockSpec(
        (TILE_ROWS, width), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
    )


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11, 12)
)
def fused_cls_losses(
    logits,  # (..., A, C) student logits
    teacher_probs,  # (..., A, C)
    labels,  # (..., A) int32
    fg_norm,  # scalar or per-row (...,A)-broadcastable focal normalizer
    distill_norm,  # scalar distill normalizer
    gamma_f: float,
    alpha_f: float,
    focal_scale: float,
    gamma_d: float,
    alpha_d: float,
    beta_d: float,
    ignored_label: int,
    distill_scale: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (focal_loss, distill_loss) scalars — both losses in one pass."""
    return _fused_fwd_impl(
        logits, teacher_probs, labels, fg_norm, distill_norm,
        gamma_f, alpha_f, focal_scale, gamma_d, alpha_d, beta_d,
        ignored_label, distill_scale,
    )[0]


def _pallas_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _fused_fwd_impl(
    logits, teacher_probs, labels, fg_norm, distill_norm,
    gamma_f, alpha_f, focal_scale, gamma_d, alpha_d, beta_d,
    ignored_label, distill_scale,
):
    x, pt, t, fg, dn, m, mpad = _flatten_inputs(
        logits, teacher_probs, labels, fg_norm, distill_norm
    )
    c = x.shape[-1]
    kernel = functools.partial(
        _fwd_kernel,
        num_classes=c, gamma_f=gamma_f, alpha_f=alpha_f,
        gamma_d=gamma_d, alpha_d=alpha_d, beta_d=beta_d,
        ignored_label=ignored_label,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(mpad // TILE_ROWS,),
        in_specs=[
            _row_spec(c), _row_spec(c), _row_spec(1), _row_spec(1), _row_spec(1),
        ],
        out_specs=pl.BlockSpec(
            (1, 2), lambda i, *_: (0, 0), memory_space=pltpu.SMEM
        ),
    )
    sums = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, 2), jnp.float32),
        interpret=_pallas_interpret(),
    )(jnp.asarray([m], jnp.int32), x, pt, t, fg, dn)
    focal = jnp.float32(focal_scale) * sums[0, 0]
    distill = jnp.float32(distill_scale) * sums[0, 1]
    return (focal, distill), (logits, teacher_probs, labels, fg_norm, distill_norm)


def _fused_fwd(
    logits, teacher_probs, labels, fg_norm, distill_norm,
    gamma_f, alpha_f, focal_scale, gamma_d, alpha_d, beta_d,
    ignored_label, distill_scale,
):
    out, res = _fused_fwd_impl(
        logits, teacher_probs, labels, fg_norm, distill_norm,
        gamma_f, alpha_f, focal_scale, gamma_d, alpha_d, beta_d,
        ignored_label, distill_scale,
    )
    return out, res


def _fused_bwd(
    gamma_f, alpha_f, focal_scale, gamma_d, alpha_d, beta_d,
    ignored_label, distill_scale, res, g,
):
    logits, teacher_probs, labels, fg_norm, distill_norm = res
    g_focal, g_distill = g
    x, pt, t, fg, dn, m, mpad = _flatten_inputs(
        logits, teacher_probs, labels, fg_norm, distill_norm
    )
    c = x.shape[-1]
    kernel = functools.partial(
        _bwd_kernel,
        num_classes=c, gamma_f=gamma_f, alpha_f=alpha_f,
        gamma_d=gamma_d, alpha_d=alpha_d, beta_d=beta_d,
        ignored_label=ignored_label,
    )
    # fold the static scales into the incoming cotangents
    g_arr = jnp.stack(
        [jnp.float32(focal_scale) * g_focal, jnp.float32(distill_scale) * g_distill]
    ).reshape(1, 2)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(mpad // TILE_ROWS,),
        in_specs=[
            _row_spec(c), _row_spec(c), _row_spec(1), _row_spec(1), _row_spec(1),
            pl.BlockSpec((1, 2), lambda i, *_: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=_row_spec(c),
    )
    dx = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((mpad, c), jnp.float32),
        interpret=_pallas_interpret(),
    )(jnp.asarray([m], jnp.int32), x, pt, t, fg, dn, g_arr)
    dx = dx[:m].reshape(logits.shape).astype(logits.dtype)
    return (
        dx,
        jnp.zeros_like(teacher_probs),
        np.zeros(labels.shape, dtype=jax.dtypes.float0),
        jnp.zeros_like(jnp.asarray(fg_norm, jnp.float32)),
        jnp.zeros_like(jnp.asarray(distill_norm, jnp.float32)),
    )


fused_cls_losses.defvjp(_fused_fwd, _fused_bwd)
