"""Fused Pallas TPU kernel for the RetinaNet classification losses.

STATUS: FROZEN — measured demonstration, no new features. Three designs
(masked, group-accumulating, aligned-tile) all measured ~3% BEHIND XLA's
multi-output fusion at the SAD-step shapes (BENCH_NOTES.md round-2: 103.3 vs
106.4 imgs/s at bs32): the loss pass is VPU-transcendental-bound near its HBM
floor, so there is nothing left for a hand kernel to win. USE_PALLAS_LOSSES
stays False. The kernel remains in-tree as the honest negative result and a
Pallas reference; tests/test_pallas_losses.py asserts jnp/Pallas numeric
lockstep, so any change to ops/losses.py that drifts the math fails the
suite rather than silently desynchronizing the two implementations. Do not
extend this kernel for new loss features — change ops/losses.py and let the
lockstep test flag whether this file must follow or be deleted.

ONE pass over the dense per-anchor grid computes, per device-group, the raw
(un-normalized) sums of

  * the sigmoid focal loss          (sigmoid_focal_loss_op.cu:25-66),
  * the adaptive distillation loss  (sigmoid_adaptive_distillation_loss_op.cu:28-67),
  * the PowSum normalizer           (pow_sum_op.cu:26-43),

replacing the reference's THREE separate CUDA kernel launches over the same
(N, A*80, H, W) tensors — and XLA's separate PowSum reduction pass — with a
single HBM read of the student logits + teacher probabilities.

The factoring that makes this possible: both losses (and their published
backward kernels) are *linear* in 1/Np, where Np = max(normalizer, 1). The
adaptive weight q = 1 - exp(-D) never involves Np. So the kernel emits raw
per-group sums with alpha folded in but 1/Np left out, and the caller applies
scale / max(norm, 1) on (G,) scalars afterwards — even though the adaptive
normalizer is itself one of the kernel's outputs (summed across FPN levels
before the divide). Backward cotangents arrive per-group with scale/Np
already folded in by autodiff of that scalar combine, so the backward kernel
is also a single pass.

Layout: the (..., A, C=80) grids are viewed as (M, 80) rows and packed
PACK=8 consecutive rows into 640 lanes (5 x 128 — full VPU lane / DMA-tile
utilization; 80 lanes would waste 37% of each (8,128) memory tile). Labels
(M,) become (M/8, 8) and are expanded to lanes inside the kernel with a tiny
0/1 MXU matmul. Row padding is never materialized: the grid over-covers with
a partial final tile and out-of-range rows are masked in-register.

Numerics are identical to sad_tpu.ops.losses (tested against the same NumPy
transcriptions of the CUDA kernels), including the reference's published
backward exactly as written (its alpha-folding is an algebraic refactoring
of the true derivative that diverges only in the forward's FLT_MIN clamp
region — tests/test_gradient_checks.py).

No gradient flows to the teacher probabilities or through PowSum: the
reference's gradient maker passes only GI(0)
(sigmoid_adaptive_distillation_loss_op.cc:99-112), and d(powsum)/d(logits)
is identically zero.
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
LOG_FLT_MIN = float(np.log(np.finfo(np.float32).tiny))
TILE_ROWS = 256
PACK = 8  # rows packed into the lane axis: 8 * 80 = 640 = 5 * 128 lanes


def _ipow_or_pow(x, gamma: float):
    """x**gamma with integer gammas specialized to multiplies (the shipped
    configs use gamma=2.0; exp/log transcendentals dominate the VPU cost)."""
    if float(gamma) == int(gamma) and 0 <= int(gamma) <= 4:
        g = int(gamma)
        if g == 0:
            return jnp.ones_like(x)
        out = x
        for _ in range(g - 1):
            out = out * x
        return out
    return jnp.power(x, jnp.float32(gamma))


def _expand_labels(t_block, lanes: int, pack: int):
    """(TILE, pack) int32 labels -> (TILE, lanes) f32, each label repeated
    over its 80 class lanes via a 0/1 matmul (labels are small ints, exact
    in f32)."""
    if pack == 1:
        return t_block.astype(jnp.float32)  # broadcasts over lanes
    c = lanes // pack
    j = jax.lax.broadcasted_iota(jnp.int32, (pack, lanes), 0)
    l = jax.lax.broadcasted_iota(jnp.int32, (pack, lanes), 1)
    expand = ((l // c) == j).astype(jnp.float32)
    return jax.lax.dot_general(
        t_block.astype(jnp.float32),
        expand,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _elementwise_terms(x, pt, gamma_d: float, beta_d: float):
    """Shared transcendental-minimal subexpressions of both losses.

    One exp (e) + one log (log1pe) + one exp (q) cover sigmoid, log p,
    log(1-p), D and q; log p is derived as x + log(1-p), clamped at
    log(FLT_MIN) to match the CUDA kernels' log(max(p, FLT_MIN)).
    """
    ge = (x >= 0).astype(jnp.float32)
    e = jnp.exp(x - 2.0 * x * ge)  # exp(-|x|)
    log1pe = jnp.log(1.0 + e)
    # sigmoid from e: ge=1 -> 1/(1+e^-x); ge=0 -> e^x/(1+e^x)
    p = (ge + (1.0 - ge) * e) / (1.0 + e)
    log_1mp = -x * ge - log1pe
    log_p = jnp.maximum(x + log_1mp, LOG_FLT_MIN)
    # D = BCE(x, pt); the CUDA max(FLT_MIN, 1+e) clamp is a no-op (1+e >= 1)
    d_loss = -x * (pt - ge) + log1pe
    if beta_d != 0.0:
        pt_c = jnp.clip(pt, FLT_MIN, 1.0 - 1e-7)
        d_loss = d_loss + beta_d * (
            pt_c * jnp.log(pt_c) + (1.0 - pt_c) * jnp.log(1.0 - pt_c)
        )
    exp_neg_d = jnp.exp(-d_loss)
    q = 1.0 - exp_neg_d
    return p, log_p, log_1mp, q, exp_neg_d


def _class_masks(t_f, grid_shape, lanes: int, pack: int, ignored_label: int):
    """c1/c2 focal masks + distill ignore mask from lane-expanded labels.
    The class-index iota spans the full (rows, lanes) grid; for pack=1 the
    (rows, 1) labels broadcast against it."""
    c = lanes // pack
    d = jax.lax.broadcasted_iota(jnp.int32, grid_shape, 1) % c
    d_f = d.astype(jnp.float32)
    c1 = (t_f == d_f + 1.0).astype(jnp.float32)
    c2 = ((t_f != -1.0) & (t_f != d_f + 1.0)).astype(jnp.float32)
    dmask = (t_f != float(ignored_label)).astype(jnp.float32)
    return c1, c2, dmask


def _group_scale_rows(row_group, scales_ref, idx: int, n_groups: int):
    """Per-row scalar from a (2, G) SMEM table, selected by group id
    (unrolled masked select; SMEM has no vector gather)."""
    out = jnp.zeros_like(row_group, dtype=jnp.float32)
    for g in range(n_groups):
        out = out + (row_group == g).astype(jnp.float32) * scales_ref[idx, g]
    return out


def _fwd_kernel(
    x_ref, pt_ref, t_ref,
    out_ref,
    *,
    pack: int, n_rows: int, rows_per_group: int, n_groups: int,
    gamma_f: float, alpha_f: float,
    gamma_d: float, alpha_d: float, beta_d: float, ignored_label: int,
    logits_power: float, want_powsum: bool,
):
    i = pl.program_id(0)
    x = x_ref[:].astype(jnp.float32)
    pt = pt_ref[:].astype(jnp.float32)
    rows, lanes = x.shape

    row_idx = i * TILE_ROWS + jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    row_ok = row_idx < n_rows
    row_valid = row_ok.astype(jnp.float32)
    row_group = row_idx // rows_per_group
    # the final partial tile reads past the array: zero those rows BEFORE any
    # math (garbage bits can be inf/NaN, and NaN * 0 stays NaN in the sums)
    x = jnp.where(row_ok, x, 0.0)
    pt = jnp.where(row_ok, pt, 0.0)

    t_f = _expand_labels(t_ref[:], lanes, pack)
    c1, c2, dmask = _class_masks(t_f, x.shape, lanes, pack, ignored_label)
    p, log_p, log_1mp, q, _ = _elementwise_terms(x, pt, gamma_d, beta_d)

    # focal, alpha folded, 1/Np deferred (sigmoid_focal_loss_op.cu:25-66)
    focal = (
        -c1 * alpha_f * _ipow_or_pow(1.0 - p, gamma_f) * log_p
        - c2 * (1.0 - alpha_f) * _ipow_or_pow(p, gamma_f) * log_1mp
    )
    # adaptive distill, 1/Np deferred (…adaptive_distillation_loss_op.cu:49-64)
    distill = (
        -_ipow_or_pow(q, gamma_d)
        * (alpha_d * pt * log_p + (1.0 - alpha_d) * (1.0 - pt) * log_1mp)
        * dmask
    )

    focal_rows = jnp.sum(focal, axis=1, keepdims=True) * row_valid
    distill_rows = jnp.sum(distill, axis=1, keepdims=True) * row_valid
    if want_powsum:
        pow_rows = (
            jnp.sum(jnp.power(pt, jnp.float32(logits_power)), axis=1, keepdims=True)
            * row_valid
        )

    @pl.when(i == 0)
    def _init():
        for g in range(n_groups):
            out_ref[g, 0] = jnp.float32(0.0)
            out_ref[g, 1] = jnp.float32(0.0)
            out_ref[g, 2] = jnp.float32(0.0)

    for g in range(n_groups):
        gm = (row_group == g).astype(jnp.float32)
        out_ref[g, 0] += jnp.sum(focal_rows * gm)
        out_ref[g, 1] += jnp.sum(distill_rows * gm)
        if want_powsum:
            out_ref[g, 2] += jnp.sum(pow_rows * gm)


def _bwd_kernel(
    x_ref, pt_ref, t_ref, g_ref,
    dx_ref,
    *,
    pack: int, n_rows: int, rows_per_group: int, n_groups: int,
    gamma_f: float, alpha_f: float,
    gamma_d: float, alpha_d: float, beta_d: float, ignored_label: int,
):
    i = pl.program_id(0)
    x = x_ref[:].astype(jnp.float32)
    pt = pt_ref[:].astype(jnp.float32)
    rows, lanes = x.shape

    row_idx = i * TILE_ROWS + jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    row_ok = row_idx < n_rows
    row_valid = row_ok.astype(jnp.float32)
    row_group = row_idx // rows_per_group
    x = jnp.where(row_ok, x, 0.0)
    pt = jnp.where(row_ok, pt, 0.0)
    g_f = _group_scale_rows(row_group, g_ref, 0, n_groups) * row_valid
    g_d = _group_scale_rows(row_group, g_ref, 1, n_groups) * row_valid

    t_f = _expand_labels(t_ref[:], lanes, pack)
    c1, c2, dmask = _class_masks(t_f, x.shape, lanes, pack, ignored_label)
    p, log_p, log_1mp, q, exp_neg_d = _elementwise_terms(x, pt, gamma_d, beta_d)

    # focal backward (sigmoid_focal_loss_op.cu:94-107), alpha folded, no 1/Np
    term1 = _ipow_or_pow(1.0 - p, gamma_f) * (1.0 - p - p * gamma_f * log_p)
    term2 = _ipow_or_pow(p, gamma_f) * (log_1mp * (1.0 - p) * gamma_f - p)
    dx_f = (-c1 * alpha_f * term1 - c2 * (1.0 - alpha_f) * term2) * g_f

    # distill backward (…op.cu:69-105): alpha folded differently than the
    # forward — transcribe the published kernel's factoring verbatim
    d_loss_term = alpha_d * pt * log_p + (1.0 - alpha_d) * (1.0 - pt) * log_1mp
    dx_d = (
        -(
            -(pt - p) * gamma_d * _ipow_or_pow(q, gamma_d - 1.0) * exp_neg_d
            * d_loss_term
            + _ipow_or_pow(q, gamma_d)
            * (alpha_d * (pt - p) - (1.0 - 2.0 * alpha_d) * (1.0 - pt) * p)
        )
        * dmask
        * g_d
    )

    dx_ref[:] = dx_f + dx_d


def _pack_factor(m: int, n_groups: int) -> int:
    if m % (n_groups * PACK) == 0:
        return PACK
    return 1


def _choose_tile(rows_per_group: int):
    """Largest divisor of rows_per_group in [8, 512] that is a multiple of 8.

    When such a tile exists, every grid tile lies inside ONE group and
    n_rows % TILE == 0, so the kernels drop ALL row masking (two full-tile
    selects) and the n_groups-way masked accumulation — each tile just
    writes its own partial sums (the group segment-sum happens outside).
    Returns None when no aligned tile exists (tiny grids, e.g. P7's 90
    rows/group) — those fall back to the masked TILE_ROWS path."""
    best = None
    for t in range(8, 513, 8):
        if rows_per_group % t == 0:
            best = t
    return best


def _fwd_kernel_aligned(
    x_ref, pt_ref, t_ref,
    out_ref,
    *,
    pack: int,
    gamma_f: float, alpha_f: float,
    gamma_d: float, alpha_d: float, beta_d: float, ignored_label: int,
    logits_power: float, want_powsum: bool,
):
    x = x_ref[:].astype(jnp.float32)
    pt = pt_ref[:].astype(jnp.float32)
    lanes = x.shape[1]
    t_f = _expand_labels(t_ref[:], lanes, pack)
    c1, c2, dmask = _class_masks(t_f, x.shape, lanes, pack, ignored_label)
    p, log_p, log_1mp, q, _ = _elementwise_terms(x, pt, gamma_d, beta_d)

    focal = (
        -c1 * alpha_f * _ipow_or_pow(1.0 - p, gamma_f) * log_p
        - c2 * (1.0 - alpha_f) * _ipow_or_pow(p, gamma_f) * log_1mp
    )
    distill = (
        -_ipow_or_pow(q, gamma_d)
        * (alpha_d * pt * log_p + (1.0 - alpha_d) * (1.0 - pt) * log_1mp)
        * dmask
    )
    # whole-array SMEM out ref (Mosaic requires SMEM blocks to equal the
    # array shape); each tile writes only its own row
    i = pl.program_id(0)
    out_ref[i, 0] = jnp.sum(focal)
    out_ref[i, 1] = jnp.sum(distill)
    if want_powsum:
        out_ref[i, 2] = jnp.sum(jnp.power(pt, jnp.float32(logits_power)))
    else:
        out_ref[i, 2] = jnp.float32(0.0)


def _bwd_kernel_aligned(
    x_ref, pt_ref, t_ref, g_ref,
    dx_ref,
    *,
    pack: int,
    gamma_f: float, alpha_f: float,
    gamma_d: float, alpha_d: float, beta_d: float, ignored_label: int,
):
    x = x_ref[:].astype(jnp.float32)
    pt = pt_ref[:].astype(jnp.float32)
    lanes = x.shape[1]
    i = pl.program_id(0)
    g_f = g_ref[0, i]  # this tile's group scales, expanded outside
    g_d = g_ref[1, i]

    t_f = _expand_labels(t_ref[:], lanes, pack)
    c1, c2, dmask = _class_masks(t_f, x.shape, lanes, pack, ignored_label)
    p, log_p, log_1mp, q, exp_neg_d = _elementwise_terms(x, pt, gamma_d, beta_d)

    term1 = _ipow_or_pow(1.0 - p, gamma_f) * (1.0 - p - p * gamma_f * log_p)
    term2 = _ipow_or_pow(p, gamma_f) * (log_1mp * (1.0 - p) * gamma_f - p)
    dx_f = (-c1 * alpha_f * term1 - c2 * (1.0 - alpha_f) * term2) * g_f

    d_loss_term = alpha_d * pt * log_p + (1.0 - alpha_d) * (1.0 - pt) * log_1mp
    dx_d = (
        -(
            -(pt - p) * gamma_d * _ipow_or_pow(q, gamma_d - 1.0) * exp_neg_d
            * d_loss_term
            + _ipow_or_pow(q, gamma_d)
            * (alpha_d * (pt - p) - (1.0 - 2.0 * alpha_d) * (1.0 - pt) * p)
        )
        * dmask
        * g_d
    )
    dx_ref[:] = dx_f + dx_d


def _pallas_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _row_spec(width):
    return _tile_spec(TILE_ROWS, width)


def _tile_spec(tile, width):
    return pl.BlockSpec(
        (tile, width), lambda i: (i, 0), memory_space=pltpu.VMEM
    )


def _views(logits, teacher_probs, labels, n_groups):
    """Contiguous (no-copy) packed row views + static geometry."""
    c = logits.shape[-1]
    m = labels.size
    if m % n_groups:
        raise ValueError(f"rows {m} not divisible by n_groups {n_groups}")
    pack = _pack_factor(m, n_groups)
    r = m // pack
    x = logits.reshape(r, c * pack)
    pt = teacher_probs.reshape(r, c * pack)
    t = labels.reshape(r, pack).astype(jnp.int32)
    return x, pt, t, pack, r, r // n_groups


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9, 10, 11)
)
def fused_cls_losses_raw(
    logits,  # (..., A, C) student logits
    teacher_probs,  # (..., A, C) post-sigmoid teacher probabilities
    labels,  # (..., A) int32 anchor labels (-1 ignore / 0 bg / 1..C fg)
    n_groups: int,
    gamma_f: float,
    alpha_f: float,
    gamma_d: float,
    alpha_d: float,
    beta_d: float,
    ignored_label: int,
    logits_power: float,
    want_powsum: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-group raw sums in one fused pass.

    Returns ``(focal_raw, distill_raw, powsum)``, each ``(n_groups,)`` f32:
      focal_raw[g]   = sum over group g of the focal loss with alpha folded
                       in but WITHOUT the 1/max(fg_num, 1) normalizer,
      distill_raw[g] = likewise for the adaptive distillation loss,
      powsum[g]      = sum over group g of teacher_probs ** logits_power
                       (zeros when want_powsum=False).
    Apply ``scale * raw / max(norm, 1)`` per group afterwards; both published
    CUDA backwards are linear in 1/Np so autodiff of that combine routes the
    correct cotangents back into the single-pass backward kernel.
    """
    return _raw_fwd_impl(
        logits, teacher_probs, labels, n_groups,
        gamma_f, alpha_f, gamma_d, alpha_d, beta_d, ignored_label,
        logits_power, want_powsum,
    )[0]


def _raw_fwd_impl(
    logits, teacher_probs, labels, n_groups,
    gamma_f, alpha_f, gamma_d, alpha_d, beta_d, ignored_label,
    logits_power, want_powsum,
):
    x, pt, t, pack, r, rpg = _views(logits, teacher_probs, labels, n_groups)
    width = x.shape[-1]
    tile = _choose_tile(rpg)
    if tile is not None:
        n_tiles = r // tile
        kernel = functools.partial(
            _fwd_kernel_aligned,
            pack=pack,
            gamma_f=gamma_f, alpha_f=alpha_f,
            gamma_d=gamma_d, alpha_d=alpha_d, beta_d=beta_d,
            ignored_label=ignored_label,
            logits_power=logits_power, want_powsum=want_powsum,
        )
        sums = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                _tile_spec(tile, width), _tile_spec(tile, width),
                _tile_spec(tile, pack),
            ],
            out_specs=pl.BlockSpec(
                (n_tiles, 3), lambda i: (0, 0), memory_space=pltpu.SMEM
            ),
            out_shape=jax.ShapeDtypeStruct((n_tiles, 3), jnp.float32),
            interpret=_pallas_interpret(),
        )(x, pt, t)
        per_group = sums.reshape(n_groups, n_tiles // n_groups, 3).sum(axis=1)
        out = (per_group[:, 0], per_group[:, 1], per_group[:, 2])
        return out, (logits, teacher_probs, labels)
    kernel = functools.partial(
        _fwd_kernel,
        pack=pack, n_rows=r, rows_per_group=rpg, n_groups=n_groups,
        gamma_f=gamma_f, alpha_f=alpha_f,
        gamma_d=gamma_d, alpha_d=alpha_d, beta_d=beta_d,
        ignored_label=ignored_label,
        logits_power=logits_power, want_powsum=want_powsum,
    )
    sums = pl.pallas_call(
        kernel,
        grid=(pl.cdiv(r, TILE_ROWS),),
        in_specs=[_row_spec(width), _row_spec(width), _row_spec(pack)],
        out_specs=pl.BlockSpec(
            (n_groups, 3), lambda i: (0, 0), memory_space=pltpu.SMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_groups, 3), jnp.float32),
        interpret=_pallas_interpret(),
    )(x, pt, t)
    out = (sums[:, 0], sums[:, 1], sums[:, 2])
    return out, (logits, teacher_probs, labels)


def _raw_fwd(
    logits, teacher_probs, labels, n_groups,
    gamma_f, alpha_f, gamma_d, alpha_d, beta_d, ignored_label,
    logits_power, want_powsum,
):
    return _raw_fwd_impl(
        logits, teacher_probs, labels, n_groups,
        gamma_f, alpha_f, gamma_d, alpha_d, beta_d, ignored_label,
        logits_power, want_powsum,
    )


def _raw_bwd(
    n_groups, gamma_f, alpha_f, gamma_d, alpha_d, beta_d, ignored_label,
    logits_power, want_powsum, res, g,
):
    logits, teacher_probs, labels = res
    g_focal, g_distill, _g_pow = g  # d(powsum)/d(logits) == 0
    x, pt, t, pack, r, rpg = _views(logits, teacher_probs, labels, n_groups)
    g_arr = jnp.stack(
        [jnp.asarray(g_focal, jnp.float32), jnp.asarray(g_distill, jnp.float32)]
    )  # (2, G)
    width = x.shape[-1]
    tile = _choose_tile(rpg)
    if tile is not None:
        n_tiles = r // tile
        # expand the per-group scales to per-tile (2, n_tiles) so each tile
        # reads its own (2, 1) SMEM block with static indices
        g_tiled = jnp.repeat(g_arr, n_tiles // n_groups, axis=1)
        kernel = functools.partial(
            _bwd_kernel_aligned,
            pack=pack,
            gamma_f=gamma_f, alpha_f=alpha_f,
            gamma_d=gamma_d, alpha_d=alpha_d, beta_d=beta_d,
            ignored_label=ignored_label,
        )
        dx = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                _tile_spec(tile, width), _tile_spec(tile, width),
                _tile_spec(tile, pack),
                pl.BlockSpec((2, n_tiles), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=_tile_spec(tile, width),
            out_shape=jax.ShapeDtypeStruct((r, width), jnp.float32),
            interpret=_pallas_interpret(),
        )(x, pt, t, g_tiled)
        return (
            dx.reshape(logits.shape).astype(logits.dtype),
            jnp.zeros_like(teacher_probs),
            np.zeros(labels.shape, dtype=jax.dtypes.float0),
        )
    kernel = functools.partial(
        _bwd_kernel,
        pack=pack, n_rows=r, rows_per_group=rpg, n_groups=n_groups,
        gamma_f=gamma_f, alpha_f=alpha_f,
        gamma_d=gamma_d, alpha_d=alpha_d, beta_d=beta_d,
        ignored_label=ignored_label,
    )
    dx = pl.pallas_call(
        kernel,
        grid=(pl.cdiv(r, TILE_ROWS),),
        in_specs=[
            _row_spec(width), _row_spec(width), _row_spec(pack),
            pl.BlockSpec((2, n_groups), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=_row_spec(width),
        out_shape=jax.ShapeDtypeStruct((r, width), jnp.float32),
        interpret=_pallas_interpret(),
    )(x, pt, t, g_arr)
    return (
        dx.reshape(logits.shape).astype(logits.dtype),
        jnp.zeros_like(teacher_probs),
        np.zeros(labels.shape, dtype=jax.dtypes.float0),
    )


fused_cls_losses_raw.defvjp(_raw_fwd, _raw_bwd)


def fused_cls_losses(
    logits,
    teacher_probs,
    labels,
    fg_norm,  # scalar or (G,) focal normalizer (retnet_fg_num per group)
    distill_norm,  # scalar or (G,) distill normalizer
    gamma_f: float,
    alpha_f: float,
    focal_scale: float,
    gamma_d: float,
    alpha_d: float,
    beta_d: float,
    ignored_label: int,
    distill_scale: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single-level convenience wrapper: raw kernel + scalar normalization.

    Returns ``(focal_loss, distill_loss)`` scalars, numerically identical to
    sigmoid_focal_loss + sigmoid_adaptive_distill_loss over the same grids.
    """
    fg = jnp.atleast_1d(jnp.asarray(fg_norm, jnp.float32))
    dn = jnp.atleast_1d(jnp.asarray(distill_norm, jnp.float32))
    n_groups = max(fg.shape[0], dn.shape[0])
    fg = jnp.broadcast_to(fg, (n_groups,))
    dn = jnp.broadcast_to(dn, (n_groups,))
    focal_raw, distill_raw, _ = fused_cls_losses_raw(
        logits, teacher_probs, labels, n_groups,
        gamma_f, alpha_f, gamma_d, alpha_d, beta_d, ignored_label,
        1.0, False,
    )
    focal = jnp.float32(focal_scale) * jnp.sum(focal_raw / jnp.maximum(fg, 1.0))
    distill = jnp.float32(distill_scale) * jnp.sum(
        distill_raw / jnp.maximum(dn, 1.0)
    )
    return focal, distill
