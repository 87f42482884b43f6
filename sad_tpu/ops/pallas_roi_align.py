"""Pallas TPU kernel: windowed multilevel RoIAlign.

The dense formulation (ops/detectron_ops.py roi_align + ops/proposals.py
multilevel_roi_align) keeps all FLOPs on the MXU by computing every roi
against EVERY FPN level with full-width tent-weight matmuls — at mask-1x
geometry (bs2, 1024 rois, P2=200x336) that is ~1.3 TFLOP of matmuls, ~75%
of it against P2, when each roi mathematically touches only a tiny window
of its ONE assigned level (FPN assignment bounds sqrt(area)/stride to
~10-20 cells; the top level is bounded by canvas/stride). This kernel
exploits that: per roi, DMA the (<=WIN x <=WIN) window of its assigned
level from HBM into VMEM and run the same two tent-weight contractions on
the window — a ~100x FLOP reduction that turns the op from MXU-bound to
DMA-latency-bound.

Semantics are identical to multilevel_roi_align (ref: Detectron
roi_align_op.cu:89-160 bilinear rules + FPN.py map_rois_to_fpn_levels
routing): exact tent weights with the CUDA kernel's clamp/inside edge
handling, malformed rois forced to >=1px bins, sr x sr sample averaging.
Rois larger than the window at their level (extreme aspect ratios — FPN
assignment bounds the GEOMETRIC MEAN of the extents, not each axis) are
handled exactly by a dynamic tile loop: each tile owns a disjoint
absolute-column range, so accumulating tile contributions reproduces the
full-width contraction.

Gradients: proposals are stop-gradient at the dispatch site
(ops/proposals.py multilevel_roi_align — the reference never
differentiates roi coords either), so only d/d(features) exists. On TPU
the custom VJP runs a second windowed kernel (_mlra_bwd_kernel): per roi,
read-modify-write its window of a zero-initialized f32 per-level gradient
with the transposed tent-weight contractions — plain RMW is race-free
because the TPU grid is sequential (the CUDA backward needs atomicAdd,
roi_align_op.cu:200-300). Off-TPU it falls back to jax.linear_transpose
of the dense matmul form.

Grid layout: ROIS_PER_PROGRAM rois per program, software-pipelined (roi
rr+1's first-tile DMA is in flight on the other buffer/semaphore while roi
rr computes, and a tile's tent weights are computed before its DMA wait).
Per-roi int scalars (level/batch/window offsets/tile counts) ride ONE
scalar-prefetch int32 array in SMEM, laid out (META_COLS, R_pad) —
cols-major, because the SMEM allocation pads the LAST dim to 128 lanes:
roi-major (R, 8) costs 512 B/roi and blew the 1 MB SMEM budget at bs8's
4096 train rois (u8[2097152] 'prefetched SMEM operand' compile failure),
while cols-major costs ~32 B/roi and admits MAX_ROIS=16384 within half
the budget. The four f32 roi-geometry scalars ride a VMEM-blocked input
instead (Mosaic has no scalar bitcast to smuggle them through the int
array).
"""

from __future__ import annotations

import functools
import os
import warnings
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WIN = 32  # window tile edge (cells); per level: min(WIN, level dim)
ROIS_PER_PROGRAM = 8
META_COLS = 8  # lvl, b, h0, w0, nty, ntx, pad, pad (int32)
FMETA_COLS = 4  # y1, x1, binh, binw (f32; Mosaic has no scalar bitcast)
# per-roi scalars ride SMEM at ~32 B/roi (cols-major meta, see module
# docstring): 16384 rois = 512K, half the 1 MB SMEM budget — covers the
# box head up to bs32 train / bs16 at 1000 eval rois
MAX_ROIS = 16384

# None = auto (kernel on TPU, dense matmuls elsewhere — the interpreter
# pays a Python-level cost per roi that would bog the CPU suite down);
# True/False force either path (tests force True to keep the kernel
# branch alive on CPU). Read at TRACE time: flipping it does not affect
# already-jitted callables (their path is baked in), only functions traced
# after the flip — tests monkeypatch + define fresh closures per case.
# SAD_TPU_ROI_KERNEL=0/1 seeds the global per-process (drive escape hatch
# for comparing paths without editing call sites).
USE_PALLAS_ROI_ALIGN = {"0": False, "1": True}.get(
    os.environ.get("SAD_TPU_ROI_KERNEL", ""), None
)

# Three-way mode override (SAD_TPU_ROI_MODE=dense|windowed|hybrid). Unset =
# legacy auto via USE_PALLAS_ROI_ALIGN above. "hybrid" pairs the DENSE
# matmul forward with the windowed RMW backward: the round-4 stage
# decomposition (BENCH_NOTES) found the in-step costs split — embedded in
# the full program XLA overlaps the dense forward's tent matmuls better
# than the opaque pallas_call (+7.2 vs +9.5 ms), while the windowed
# backward beats the dense transpose (+31.6 vs +33.9) — so the fastest
# step takes one from each. Same trace-time caveat as the global above.
ROI_ALIGN_MODE = os.environ.get("SAD_TPU_ROI_MODE", "") or None
_VALID_MODES = ("dense", "windowed", "hybrid")


def roi_align_mode(n_rois: int, features=None, inference: bool = False) -> str:
    """Resolve the multilevel-RoIAlign dispatch mode for this call site.

    Explicit ROI_ALIGN_MODE wins (still subject to the MAX_ROIS scalar-
    prefetch cap and the lane-alignment guard below — past either every
    kernel path degrades to dense); otherwise legacy auto: windowed on TPU
    / dense elsewhere via use_windowed_kernel.

    inference=True marks a no-backward call site (the serving/eval paths):
    auto then picks the WINDOWED forward instead of hybrid. The hybrid
    default exists because in the TRAIN step XLA overlaps the dense
    forward's tent matmuls with the rest of fwd+bwd — at inference there
    is no backward to overlap against, the dense form computes every roi's
    tent matmuls at every FPN level (1000 rois/im at eval vs 512 sampled
    in train), and the round-5 stage decomposition measured it as 89.5 of
    the 137 ms Faster R-CNN serving step. Windowed forward on the serving
    rows: Faster 58.4 -> 93.2 imgs/s, Mask 50.3 -> 83.2
    (results/rcnn_inference_roiwin.json).
    """
    if ROI_ALIGN_MODE is not None:
        if ROI_ALIGN_MODE not in _VALID_MODES:
            raise ValueError(
                f"SAD_TPU_ROI_MODE={ROI_ALIGN_MODE!r}: want one of "
                f"{_VALID_MODES}"
            )
        if n_rois > MAX_ROIS:
            return "dense"
        if ROI_ALIGN_MODE != "dense" and not _kernel_compatible(features):
            warnings.warn(
                f"SAD_TPU_ROI_MODE={ROI_ALIGN_MODE!r} requested but the "
                "feature shapes fail the kernel preconditions "
                f"(levels>=8x8 everywhere; C%128==0 on TPU) — degrading "
                "to dense",
                stacklevel=2,
            )
            return "dense"
        return ROI_ALIGN_MODE
    if USE_PALLAS_ROI_ALIGN is not None:
        # legacy force knob keeps its original meaning: windowed vs dense
        return (
            "windowed" if use_windowed_kernel(n_rois, features) else "dense"
        )
    if inference:
        # no backward at this call site -> windowed forward (see docstring)
        return (
            "windowed" if use_windowed_kernel(n_rois, features) else "dense"
        )
    # TPU auto default: HYBRID (dense fwd + windowed RMW bwd) — fastest
    # measured pairing at mask-1x geometry (full step 59.6 ms vs windowed
    # 62.6 / dense 61.9; family matrix in BENCH_NOTES round-4)
    return "hybrid" if use_windowed_kernel(n_rois, features) else "dense"


def _kernel_compatible(features) -> bool:
    """Shape preconditions for the windowed Mosaic kernel; violations
    degrade to the dense path (identical semantics, just slower).

    - every level >= 8x8: the window/DMA logic is built on the TPU's
      8-sublane granularity, and Mosaic rejects the degenerate slices a
      1x2 P6 level produces (observed: 'infer-vector-layout: unsupported
      shape cast' at a 64px canvas). Tiny canvases only arise in
      smokes/tests; reference geometries (P6 of 800x1344 = 13x21) pass.
    - channels % 128 == 0: both kernels collapse (rows, dx, C) ->
      (rows, dx*C), which Mosaic can only relayout when C is a whole
      number of 128-wide lane registers (observed: 'unsupported shape
      cast' on vector<32x40x64> -> vector<32x2560> with the
      CHANNEL_RATIO=0.25 student's 64-channel FPN). Standard FPN C=256
      passes. Mosaic-only, so enforced ONLY on the TPU backend: CPU
      interpret mode never lowers through Mosaic and unaligned channels
      work there — keeping it debuggable off-chip (advisor r4).
    Unknown features (None) are presumed compatible — callers that can
    pass the dict should."""
    if features is None:
        return True
    lane_guard = jax.default_backend() == "tpu"
    return not any(
        f.shape[1] < 8 or f.shape[2] < 8
        or (lane_guard and f.shape[-1] % 128 != 0)
        for f in features.values()
    )


def use_windowed_kernel(n_rois: int, features=None) -> bool:
    """Route to the windowed kernel? In auto mode (None) also require the
    _kernel_compatible shape preconditions. An explicit force (True) still
    takes the kernel path — CPU interpret mode never invokes Mosaic."""
    if n_rois > MAX_ROIS:
        return False
    if USE_PALLAS_ROI_ALIGN is None:
        if not _kernel_compatible(features):
            return False
        return jax.default_backend() == "tpu"
    return bool(USE_PALLAS_ROI_ALIGN)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _round8(x: int) -> int:
    return ((x + 7) // 8) * 8


def _dma_width(w_l: int) -> int:
    """x-window width: the whole (8-padded) level when it fits, else the
    owned width + 8 so an align-down of the DMA start still covers it.
    Mosaic requires W-axis (sublane-tiled) slice offsets divisible by 8."""
    return _round8(w_l) if w_l <= WIN else WIN + 8


def _w_padded(w_l: int) -> int:
    return max(_round8(w_l), _dma_width(w_l))


def _axis_weights_window(
    start, binsz, dma0, nominal, own_w: int, n_static: int, winl: int,
    res: int, sr: int,
):
    """Summed tent weights of the `winl` grid columns starting at absolute
    column `dma0`, for the `res` output bins of one axis — the windowed
    slice of detectron_ops.roi_align's axis_weights, masked to the columns
    this tile OWNS ([nominal, nominal+own_w), disjoint across tiles; the
    window may be wider than the owned range for DMA alignment)."""
    f32 = jnp.float32
    shp = (res, sr, winl)
    # Mosaic iota is integer-only; cast after
    p = jax.lax.broadcasted_iota(jnp.int32, shp, 0).astype(f32)
    kk = jax.lax.broadcasted_iota(jnp.int32, shp, 1).astype(f32)
    jj = jax.lax.broadcasted_iota(jnp.int32, shp, 2).astype(f32)
    s = start + p * binsz + (kk + 0.5) * (binsz / sr)
    inside = (s >= -1.0) & (s <= float(n_static))
    s_eff = jnp.clip(s, 0.0, float(n_static - 1))
    col = dma0.astype(f32) + jj
    owned = (col >= nominal.astype(f32)) & (col < nominal.astype(f32) + own_w)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(s_eff - col))
    w = w * (inside & owned).astype(f32)
    return jnp.sum(w, axis=1) / sr  # (res, winl)


def _mlra_kernel(
    meta_ref,  # (META_COLS, R_pad) int32, scalar-prefetched (SMEM)
    *refs,
    level_dims: Tuple[Tuple[int, int], ...],  # (H_l, W_l) per level
    res: int,
    sr: int,
    c: int,
    rpp: int,
):
    # fmeta rides VMEM (scalar-prefetch SMEM windows are 512K each and two
    # operands exceed the 1M budget); scalar reads of 4 floats/roi are cheap
    fmeta_ref = refs[0]  # (rpp, FMETA_COLS) f32 block
    feat_refs = refs[1:1 + len(level_dims)]
    out_ref = refs[1 + len(level_dims)]
    win_ref, acc_ref, sem_ref = refs[2 + len(level_dims):]
    pid = pl.program_id(0)

    def first_tile_copies(r_idx, slot):
        """Copy descriptors for roi r_idx's FIRST tile, one per level (the
        issue and the wait both reconstruct the identical descriptor — the
        guide's double-buffer pattern)."""
        b_n = meta_ref[1, r_idx]
        h0_n = meta_ref[2, r_idx]
        w0_n = meta_ref[3, r_idx]
        copies = []
        for li, (h_l, w_l) in enumerate(level_dims):
            winy = min(WIN, h_l)
            w_pad = _w_padded(w_l)
            dx = _dma_width(w_l)
            dma_h = jnp.minimum(h0_n, h_l - winy)
            dma_w = jnp.clip(w0_n, 0, w_pad - dx)
            dma_w = pl.multiple_of((dma_w // 8) * 8, 8)
            copies.append(pltpu.make_async_copy(
                feat_refs[li].at[
                    b_n, pl.ds(dma_h, winy), pl.ds(dma_w, dx), :
                ],
                win_ref.at[slot, :winy, :dx, :],
                sem_ref.at[slot],
            ))
        return copies

    def issue_first(r_idx, slot):
        copies = first_tile_copies(r_idx, slot)
        lvl_n = meta_ref[0, r_idx]
        for li in range(len(level_dims)):
            @pl.when(lvl_n == li)
            def _(li=li):
                copies[li].start()

    # software pipeline: roi rr+1's first-tile DMA is in flight (other
    # slot/semaphore) while roi rr computes; tent weights for the current
    # tile are computed BEFORE its wait, hiding them under the transfer.
    issue_first(pid * rpp, 0)

    for rr in range(rpp):
        r = pid * rpp + rr
        slot = rr % 2
        lvl = meta_ref[0, r]
        b = meta_ref[1, r]
        h0 = meta_ref[2, r]
        w0 = meta_ref[3, r]
        n_tiles = meta_ref[4, r] * meta_ref[5, r]
        ntx = meta_ref[5, r]
        y1 = fmeta_ref[rr, 0]
        x1 = fmeta_ref[rr, 1]
        binh = fmeta_ref[rr, 2]
        binw = fmeta_ref[rr, 3]

        if rr + 1 < rpp:
            issue_first(r + 1, 1 - slot)

        acc_ref[...] = jnp.zeros(acc_ref.shape, acc_ref.dtype)
        wait_copies = first_tile_copies(r, slot)

        for li, (h_l, w_l) in enumerate(level_dims):
            # h_l, w_l: LOGICAL level dims; the feature ref's W is padded
            # to w_pad (multiple of 8) by the wrapper. The x-window is 8
            # wider than the owned range so the DMA start can align down
            # to the sublane tiling Mosaic requires on the W axis.
            winy = min(WIN, h_l)
            winx = min(WIN, w_l)
            w_pad = _w_padded(w_l)
            dx = _dma_width(w_l)

            @pl.when(lvl == li)
            def _(li=li, h_l=h_l, w_l=w_l, winy=winy, winx=winx,
                  w_pad=w_pad, dx=dx):
                def contract(dma_h, dma_w, nom_h, nom_w, wait_fn):
                    wy = _axis_weights_window(
                        y1, binh, dma_h, nom_h, winy, h_l, winy, res, sr
                    )
                    wx = _axis_weights_window(
                        x1, binw, dma_w, nom_w, winx, w_l, dx, res, sr
                    )
                    wait_fn()
                    w2d = (
                        win_ref[slot, :winy, :dx, :]
                        .astype(jnp.float32)
                        .reshape(winy, dx * c)
                    )
                    a = jax.lax.dot_general(
                        wy, w2d, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ).reshape(res, dx, c)
                    # acc layout: (res_q, res_p * C); per-p matmuls avoid
                    # any in-kernel transpose (Mosaic-friendliest form)
                    for p in range(res):
                        o_p = jax.lax.dot_general(
                            wx, a[p], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )  # (res_q, C)
                        acc_ref[:, p * c:(p + 1) * c] += o_p

                # tile 0: already in flight from the pipeline
                dma_h0 = jnp.minimum(h0, h_l - winy)
                dma_w0 = jnp.clip(w0, 0, w_pad - dx)
                dma_w0 = pl.multiple_of((dma_w0 // 8) * 8, 8)
                contract(dma_h0, dma_w0, h0, w0, wait_copies[li].wait)

                def tile(t, _):
                    # overflow tiles (extreme-aspect rois): synchronous,
                    # reusing this roi's slot after tile 0's compute
                    ty = t // ntx
                    tx = t - ty * ntx
                    nom_h = h0 + ty * winy
                    nom_w = w0 + tx * winx
                    dma_h = jnp.minimum(nom_h, h_l - winy)
                    dma_w = jnp.clip(nom_w, 0, w_pad - dx)
                    dma_w = pl.multiple_of((dma_w // 8) * 8, 8)
                    cp = pltpu.make_async_copy(
                        feat_refs[li].at[
                            b, pl.ds(dma_h, winy), pl.ds(dma_w, dx), :
                        ],
                        win_ref.at[slot, :winy, :dx, :],
                        sem_ref.at[slot],
                    )
                    cp.start()
                    contract(dma_h, dma_w, nom_h, nom_w, cp.wait)
                    return 0

                jax.lax.fori_loop(1, n_tiles, tile, 0, unroll=False)

        for p in range(res):
            out_ref[rr, p, :, :] = acc_ref[:, p * c:(p + 1) * c].astype(
                out_ref.dtype
            )


def _build_meta(
    features: Dict[int, jnp.ndarray],
    rois: jnp.ndarray,
    roi_levels: jnp.ndarray,
    resolution: int,
    sampling_ratio: int,
):
    """Shared fwd/bwd per-roi descriptor construction: the int32 SMEM meta
    (level, batch, window offsets, tile counts) and the f32 VMEM fmeta
    (roi geometry), both padded to a ROIS_PER_PROGRAM multiple."""
    lvls = sorted(features)
    assert lvls == list(range(lvls[0], lvls[-1] + 1)), "levels not contiguous"
    dims = tuple(
        (int(features[l].shape[1]), int(features[l].shape[2])) for l in lvls
    )
    res, sr = resolution, sampling_ratio
    r = rois.shape[0]
    rpp = ROIS_PER_PROGRAM
    r_pad = ((r + rpp - 1) // rpp) * rpp

    f32 = jnp.float32
    lvl0 = (roi_levels - lvls[0]).astype(jnp.int32)
    n_h = jnp.asarray([d[0] for d in dims], f32)[lvl0]
    n_w = jnp.asarray([d[1] for d in dims], f32)[lvl0]
    winy = jnp.asarray([min(WIN, d[0]) for d in dims], f32)[lvl0]
    winx = jnp.asarray([min(WIN, d[1]) for d in dims], f32)[lvl0]
    scale = jnp.asarray([1.0 / (2.0 ** l) for l in lvls], f32)[lvl0]

    bi = rois[:, 0].astype(jnp.int32)
    x1 = rois[:, 1] * scale
    y1 = rois[:, 2] * scale
    x2 = rois[:, 3] * scale
    y2 = rois[:, 4] * scale
    binw = jnp.maximum(x2 - x1, 1.0) / res
    binh = jnp.maximum(y2 - y1, 1.0) / res

    def extent(lo_f, bin_f, n_f, win_f):
        smin = lo_f + 0.5 * bin_f / sr
        smax = lo_f + res * bin_f - 0.5 * bin_f / sr
        c0 = jnp.floor(jnp.clip(smin, 0.0, n_f - 1.0))
        c1 = jnp.clip(jnp.floor(jnp.clip(smax, 0.0, n_f - 1.0)) + 1.0,
                      0.0, n_f - 1.0)
        span = c1 - c0 + 1.0
        n_t = jnp.ceil(span / win_f)
        return c0.astype(jnp.int32), jnp.maximum(n_t, 1.0).astype(jnp.int32)

    h0, n_ty = extent(y1, binh, n_h, winy)
    w0, n_tx = extent(x1, binw, n_w, winx)

    # (META_COLS, r_pad) — cols-major. The SMEM allocation pads the LAST
    # dim to 128 lanes, so the roi axis must be last: (r_pad, 8) int32
    # costs 512 B/roi (observed on chip: u8[2097152] 'prefetched SMEM
    # operand' > the 1 MB SMEM budget at bs8's 4096 train rois), while
    # (8, r_pad) costs ~32 B/roi and fits every call site up to MAX_ROIS.
    meta = jnp.stack(
        [lvl0, bi, h0, w0, n_ty, n_tx,
         jnp.zeros_like(lvl0), jnp.zeros_like(lvl0)],
        axis=0,
    ).astype(jnp.int32)
    meta = jnp.pad(meta, ((0, 0), (0, r_pad - r)))
    fmeta = jnp.stack([y1, x1, binh, binw], axis=1).astype(f32)
    fmeta = jnp.pad(fmeta, ((0, r_pad - r), (0, 0)))
    return meta, fmeta, lvls, dims, r_pad


def _windowed_forward(
    features: Dict[int, jnp.ndarray],
    rois: jnp.ndarray,  # (R, 5) [batch, x1, y1, x2, y2]
    roi_levels: jnp.ndarray,  # (R,) absolute FPN level per roi
    valid: jnp.ndarray,  # (R,)
    resolution: int,
    sampling_ratio: int,
) -> jnp.ndarray:
    meta, fmeta, lvls, dims, r_pad = _build_meta(
        features, rois, roi_levels, resolution, sampling_ratio
    )
    b, _, _, c = features[lvls[0]].shape
    res, sr = resolution, sampling_ratio
    r = rois.shape[0]
    rpp = ROIS_PER_PROGRAM

    out_dtype = features[lvls[0]].dtype
    kernel = functools.partial(
        _mlra_kernel, level_dims=dims, res=res, sr=sr, c=int(c), rpp=rpp,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(r_pad // rpp,),
        in_specs=[
            pl.BlockSpec((rpp, FMETA_COLS), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pl.ANY)] * len(lvls),
        out_specs=pl.BlockSpec(
            (rpp, res, res, c), lambda i, *_: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM(
                (2, WIN, max(_dma_width(d[1]) for d in dims), int(c)),
                out_dtype,
            ),
            pltpu.VMEM((res, res * int(c)), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out_call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((r_pad, res, res, c), out_dtype),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )
    feats_in = []
    for l, (h_l, w_l) in zip(lvls, dims):
        wp = _w_padded(w_l)
        f = features[l]
        if wp != w_l:
            f = jnp.pad(f, ((0, 0), (0, 0), (0, wp - w_l), (0, 0)))
        feats_in.append(f)
    out = out_call(meta, fmeta, *feats_in)
    out = out[:r]
    return out * valid[:, None, None, None].astype(out.dtype)


def _mlra_bwd_kernel(
    meta_ref,  # (META_COLS, R_pad) int32, scalar-prefetched (SMEM)
    fmeta_ref,  # (rpp, FMETA_COLS) f32 block
    g_ref,  # (rpp, res, res, C) cotangent block
    *refs,
    level_dims: Tuple[Tuple[int, int], ...],
    res: int,
    sr: int,
    c: int,
    rpp: int,
):
    """Windowed RoIAlign backward: per roi, read-modify-write its window of
    the f32 per-level gradient (zero-initialized, input_output_aliased):
    dwin[y, x, ch] = sum_p wy[p, y] * sum_q wx[q, x] * g[p, q, ch], the
    exact transpose of the forward's two tent-weight contractions (ref:
    roi_align_op.cu backward, the bilinear_interpolate_gradient atomics at
    roi_align_op.cu:200-300 — here the grid is SEQUENTIAL on the
    TensorCore, so plain RMW replaces the CUDA kernel's atomicAdd).
    Overlapping windows across rois/tiles are safe for the same reason:
    every read happens after the previous write completed."""
    n_l = len(level_dims)
    df_in_refs = refs[:n_l]  # aliased with outputs; never touched directly
    df_refs = refs[n_l:2 * n_l]
    stage_ref, sem_ref = refs[2 * n_l:]
    del df_in_refs
    pid = pl.program_id(0)

    for rr in range(rpp):
        r = pid * rpp + rr
        lvl = meta_ref[0, r]
        b = meta_ref[1, r]
        h0 = meta_ref[2, r]
        w0 = meta_ref[3, r]
        n_tiles = meta_ref[4, r] * meta_ref[5, r]
        ntx = meta_ref[5, r]
        y1 = fmeta_ref[rr, 0]
        x1 = fmeta_ref[rr, 1]
        binh = fmeta_ref[rr, 2]
        binw = fmeta_ref[rr, 3]

        for li, (h_l, w_l) in enumerate(level_dims):
            winy = min(WIN, h_l)
            winx = min(WIN, w_l)
            w_pad = _w_padded(w_l)
            dx = _dma_width(w_l)

            @pl.when(lvl == li)
            def _(li=li, h_l=h_l, w_l=w_l, winy=winy, winx=winx,
                  w_pad=w_pad, dx=dx):
                def tile(t, _):
                    ty = t // ntx
                    tx = t - ty * ntx
                    nom_h = h0 + ty * winy
                    nom_w = w0 + tx * winx
                    dma_h = jnp.minimum(nom_h, h_l - winy)
                    dma_w = jnp.clip(nom_w, 0, w_pad - dx)
                    dma_w = pl.multiple_of((dma_w // 8) * 8, 8)
                    rd = pltpu.make_async_copy(
                        df_refs[li].at[
                            b, pl.ds(dma_h, winy), pl.ds(dma_w, dx), :
                        ],
                        stage_ref.at[:winy, :dx, :],
                        sem_ref,
                    )
                    rd.start()
                    # tent weights + the transposed contractions are
                    # data-independent: computed while the read is in flight
                    wy = _axis_weights_window(
                        y1, binh, dma_h, nom_h, winy, h_l, winy, res, sr
                    )
                    wx = _axis_weights_window(
                        x1, binw, dma_w, nom_w, winx, w_l, dx, res, sr
                    )
                    # m[p, x, ch] = sum_q wx[q, x] * g[p, q, ch]
                    m = jnp.stack(
                        [
                            jax.lax.dot_general(
                                wx,
                                g_ref[rr, p, :, :].astype(jnp.float32),
                                (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                            )
                            for p in range(res)
                        ],
                        axis=0,
                    ).reshape(res, dx * c)
                    dwin = jax.lax.dot_general(
                        wy, m, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ).reshape(winy, dx, c)
                    rd.wait()
                    stage_ref[:winy, :dx, :] += dwin
                    wr = pltpu.make_async_copy(
                        stage_ref.at[:winy, :dx, :],
                        df_refs[li].at[
                            b, pl.ds(dma_h, winy), pl.ds(dma_w, dx), :
                        ],
                        sem_ref,
                    )
                    wr.start()
                    wr.wait()
                    return 0

                # padded rois have n_tiles == 0: the loop never runs, so
                # they add nothing (unlike the forward, whose always-run
                # tile 0 writes garbage into sliced-off output rows)
                jax.lax.fori_loop(0, n_tiles, tile, 0, unroll=False)


def _windowed_backward(
    features: Dict[int, jnp.ndarray],
    rois: jnp.ndarray,
    roi_levels: jnp.ndarray,
    valid: jnp.ndarray,
    res: int,
    sr: int,
    g: jnp.ndarray,  # (R, res, res, C) cotangent
) -> Dict[int, jnp.ndarray]:
    meta, fmeta, lvls, dims, r_pad = _build_meta(
        features, rois, roi_levels, res, sr
    )
    b, _, _, c = features[lvls[0]].shape
    r = rois.shape[0]
    rpp = ROIS_PER_PROGRAM

    # invalid rois contribute nothing (transpose of the forward's valid
    # mask); padded rows are skipped by n_tiles == 0 but zero g anyway
    g = g * valid[:, None, None, None].astype(g.dtype)
    g = jnp.pad(g, ((0, r_pad - r), (0, 0), (0, 0), (0, 0)))

    # f32 accumulation regardless of feature dtype: per-roi RMW rounding
    # in bf16 would drift with overlap count; cast once at the end
    df_zero = [
        jnp.zeros((b, h_l, _w_padded(w_l), c), jnp.float32)
        for (h_l, w_l) in dims
    ]
    kernel = functools.partial(
        _mlra_bwd_kernel, level_dims=dims, res=res, sr=sr, c=int(c), rpp=rpp,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(r_pad // rpp,),
        in_specs=[
            pl.BlockSpec((rpp, FMETA_COLS), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rpp, res, res, c), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pl.ANY)] * len(lvls),
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * len(lvls),
        scratch_shapes=[
            pltpu.VMEM(
                (WIN, max(_dma_width(d[1]) for d in dims), int(c)),
                jnp.float32,
            ),
            pltpu.SemaphoreType.DMA,
        ],
    )
    call = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((b, h_l, _w_padded(w_l), c), jnp.float32)
            for (h_l, w_l) in dims
        ],
        grid_spec=grid_spec,
        # aliasing indices count the scalar-prefetch operand: inputs are
        # [meta, fmeta, g, df_zero...] so df_zero[i] is global input 3+i
        input_output_aliases={3 + i: i for i in range(len(lvls))},
        # RMW accumulation requires the sequential grid the TPU gives
        # "arbitrary" dimensions (no megacore partitioning of this axis)
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
        interpret=_interpret(),
    )
    outs = call(meta, fmeta, g, *df_zero)
    return {
        l: o[:, :, :w_l, :].astype(features[l].dtype)
        for l, (h_l, w_l), o in zip(lvls, dims, outs)
    }


def _mlra_bwd_features(
    features: Dict[int, jnp.ndarray],
    rois: jnp.ndarray,
    roi_levels: jnp.ndarray,
    valid: jnp.ndarray,
    res: int,
    sr: int,
    g: jnp.ndarray,  # (R, res, res, C) cotangent
    slots_per_im: int = 0,
) -> Dict[int, jnp.ndarray]:
    """d/d(features): the windowed RMW kernel when the forward ran windowed;
    otherwise jax.linear_transpose of the dense matmul form (RoIAlign is
    linear in features) — XLA transposes the chunked tent-weight matmuls,
    the same backward it autodiffs for the dense path. A first hand-derived
    dense contraction order materialized an (R, W, res, C) intermediate and
    measured SLOWER than the transpose (17.3 vs 12.9 ms fwd+bwd on chip)."""
    if use_windowed_kernel(rois.shape[0], features):
        return _windowed_backward(
            features, rois, roi_levels, valid, res, sr, g
        )
    from .proposals import dense_multilevel_roi_align

    def lin(f):
        return dense_multilevel_roi_align(
            f, rois, roi_levels, valid, res, sr, slots_per_im
        )

    (df,) = jax.linear_transpose(lin, features)(g)
    return df


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def multilevel_roi_align_windowed(
    features: Dict[int, jnp.ndarray],
    rois: jnp.ndarray,
    roi_levels: jnp.ndarray,
    valid: jnp.ndarray,
    resolution: int,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """Windowed-kernel drop-in for ops.proposals.multilevel_roi_align
    (same signature/semantics; see module docstring)."""
    return _windowed_forward(
        features, rois, roi_levels, valid, resolution, sampling_ratio
    )


def _fwd(features, rois, roi_levels, valid, resolution, sampling_ratio):
    out = _windowed_forward(
        features, rois, roi_levels, valid, resolution, sampling_ratio
    )
    return out, (features, rois, roi_levels, valid)


def _bwd(resolution, sampling_ratio, residuals, g):
    features, rois, roi_levels, valid = residuals
    df = _mlra_bwd_features(
        features, rois, roi_levels, valid, resolution, sampling_ratio, g
    )
    # proposals/levels/validity are stop-gradient upstream (the reference
    # never differentiates through roi coords either); int/bool primals
    # take float0 cotangents
    f0 = jax.dtypes.float0
    return (df, jnp.zeros_like(rois),
            np.zeros(roi_levels.shape, dtype=f0),
            np.zeros(valid.shape, dtype=f0))


multilevel_roi_align_windowed.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def multilevel_roi_align_hybrid(
    features: Dict[int, jnp.ndarray],
    rois: jnp.ndarray,
    roi_levels: jnp.ndarray,
    valid: jnp.ndarray,
    resolution: int,
    sampling_ratio: int = 2,
    slots_per_im: int = 0,
) -> jnp.ndarray:
    """Dense-forward / windowed-backward pairing (see ROI_ALIGN_MODE note):
    forward is the all-levels tent-matmul form XLA overlaps well in the
    full step; backward is the windowed RMW kernel (via _mlra_bwd_features,
    which keeps the off-TPU / tiny-level / MAX_ROIS fallbacks).
    slots_per_im: see ops.detectron_ops.roi_align (per-image blocking of
    the dense forward)."""
    from .proposals import dense_multilevel_roi_align

    return dense_multilevel_roi_align(
        features, rois, roi_levels, valid, resolution, sampling_ratio,
        slots_per_im,
    )


def _hybrid_fwd(features, rois, roi_levels, valid, resolution,
                sampling_ratio, slots_per_im):
    out = multilevel_roi_align_hybrid(
        features, rois, roi_levels, valid, resolution, sampling_ratio,
        slots_per_im,
    )
    return out, (features, rois, roi_levels, valid)


def _hybrid_bwd(resolution, sampling_ratio, slots_per_im, residuals, g):
    features, rois, roi_levels, valid = residuals
    df = _mlra_bwd_features(
        features, rois, roi_levels, valid, resolution, sampling_ratio, g,
        slots_per_im,
    )
    f0 = jax.dtypes.float0
    return (df, jnp.zeros_like(rois),
            np.zeros(roi_levels.shape, dtype=f0),
            np.zeros(valid.shape, dtype=f0))


multilevel_roi_align_hybrid.defvjp(_hybrid_fwd, _hybrid_bwd)
