"""Windowed Pallas RoIAlign (ops/pallas_roi_align.py) vs the dense
matmul form — forward and custom-VJP backward must agree.

Runs the kernel in interpret mode on CPU (same policy as
test_pallas_nms.py); shapes are kept small because interpret mode pays a
Python-level cost per roi. Covers: level routing, extreme aspect ratios
(single-axis extents beyond the window => multi-tile accumulation),
boundary boxes, malformed rois, invalid-slot masking, res 7 and 14."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sad_tpu.ops import pallas_roi_align
from sad_tpu.ops.pallas_roi_align import multilevel_roi_align_windowed
from sad_tpu.ops.proposals import (
    map_rois_to_fpn_levels,
    multilevel_roi_align,
)


@pytest.fixture
def setup():
    rng = np.random.RandomState(0)
    b, c = 2, 8
    hc, wc = 256, 384  # canvas; P2 = 64x96
    feats = {
        l: jnp.asarray(
            rng.randn(b, hc // 2 ** l, wc // 2 ** l, c).astype(np.float32)
        )
        for l in (2, 3, 4, 5)
    }
    r = 21
    x1 = rng.uniform(0, wc * 0.8, r)
    y1 = rng.uniform(0, hc * 0.8, r)
    # small (P2), large (P4/P5), extreme-aspect (multi-tile), degenerate
    w = np.concatenate(
        [rng.uniform(6, 40, 8), rng.uniform(100, 300, 5),
         rng.uniform(2, 6, 4), rng.uniform(200, 370, 4)]
    )
    h = np.concatenate(
        [rng.uniform(6, 40, 8), rng.uniform(100, 200, 5),
         rng.uniform(150, 250, 4), rng.uniform(1, 4, 4)]
    )
    rois = np.stack(
        [rng.randint(0, b, r).astype(np.float32), x1, y1,
         np.minimum(x1 + w, wc - 1), np.minimum(y1 + h, hc - 1)],
        axis=1,
    ).astype(np.float32)
    rois[-1, 1:] = [10.0, 10.0, 10.0, 10.0]  # zero-area -> 1px-bin rule
    rois = jnp.asarray(rois)
    levels = map_rois_to_fpn_levels(rois[:, 1:], 2, 5)
    valid = jnp.asarray(rng.rand(r) > 0.15)
    return feats, rois, levels, valid


@pytest.mark.parametrize("res", [7, 14])
def test_windowed_matches_dense_forward(setup, res):
    feats, rois, levels, valid = setup
    ref = multilevel_roi_align(feats, rois, levels, valid, res, 2)
    got = multilevel_roi_align_windowed(feats, rois, levels, valid, res, 2)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-4, rtol=1e-4
    )


def test_windowed_backward_matches_dense_grad(setup):
    feats, rois, levels, valid = setup

    def loss(fn):
        def f(fd):
            o = fn(fd, rois, levels, valid, 7, 2)
            return jnp.sum(jnp.sin(o) * o)

        return f

    gd = jax.grad(loss(multilevel_roi_align))(feats)
    gw = jax.grad(loss(multilevel_roi_align_windowed))(feats)
    for l in sorted(feats):
        np.testing.assert_allclose(
            np.asarray(gw[l]), np.asarray(gd[l]), atol=5e-4, rtol=1e-4
        )


def test_windowed_rmw_backward_matches_dense_grad(setup, monkeypatch):
    """Force the windowed RMW backward kernel (interpret mode) — without
    the force, CPU routes _mlra_bwd_features to the dense-transpose
    fallback and the kernel branch would go untested."""
    monkeypatch.setattr(pallas_roi_align, "USE_PALLAS_ROI_ALIGN", True)
    feats, rois, levels, valid = setup

    def loss(fn):
        def f(fd):
            o = fn(fd, rois, levels, valid, 7, 2)
            return jnp.sum(jnp.sin(o) * o)

        return f

    gd = jax.grad(loss(multilevel_roi_align))(feats)
    monkeypatch.setattr(pallas_roi_align, "USE_PALLAS_ROI_ALIGN", False)
    gref = jax.grad(loss(multilevel_roi_align))(feats)
    for l in sorted(feats):
        np.testing.assert_allclose(
            np.asarray(gd[l]), np.asarray(gref[l]), atol=5e-4, rtol=1e-4
        )


def test_windowed_rmw_backward_bf16_features(setup, monkeypatch):
    """bf16 features: the RMW kernel accumulates in f32 and casts once at
    the end; parity vs the dense-transpose grad at bf16 tolerance."""
    monkeypatch.setattr(pallas_roi_align, "USE_PALLAS_ROI_ALIGN", True)
    feats, rois, levels, valid = setup
    feats16 = {l: f.astype(jnp.bfloat16) for l, f in feats.items()}

    def loss(fn):
        def f(fd):
            o = fn(fd, rois, levels, valid, 7, 2)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        return f

    gw = jax.grad(loss(multilevel_roi_align_windowed))(feats16)
    monkeypatch.setattr(pallas_roi_align, "USE_PALLAS_ROI_ALIGN", False)
    gref = jax.grad(loss(multilevel_roi_align))(feats16)
    for l in sorted(feats):
        assert gw[l].dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(gw[l], dtype=np.float32),
            np.asarray(gref[l], dtype=np.float32),
            atol=0.15, rtol=0.05,
        )


def test_public_dispatch_forced_kernel(setup, monkeypatch):
    """multilevel_roi_align routes through the kernel when forced — keeps
    the dispatch branch alive in the CPU suite."""
    feats, rois, levels, valid = setup
    ref = multilevel_roi_align(feats, rois, levels, valid, 7, 2)
    monkeypatch.setattr(pallas_roi_align, "USE_PALLAS_ROI_ALIGN", True)
    got = multilevel_roi_align(feats, rois, levels, valid, 7, 2)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-4, rtol=1e-4
    )


def test_windowed_under_jit(setup):
    feats, rois, levels, valid = setup
    f = jax.jit(
        lambda fd, ro: multilevel_roi_align_windowed(
            fd, ro, map_rois_to_fpn_levels(ro[:, 1:], 2, 5), valid, 7, 2
        )
    )
    ref = multilevel_roi_align(feats, rois, levels, valid, 7, 2)
    np.testing.assert_allclose(
        np.asarray(f(feats, rois)), np.asarray(ref), atol=2e-4, rtol=1e-4
    )


def test_hybrid_forward_is_dense(setup, monkeypatch):
    """Hybrid mode's primal == the dense form exactly (it IS the dense
    form), and the public dispatcher routes to it."""
    feats, rois, levels, valid = setup
    ref = multilevel_roi_align(feats, rois, levels, valid, 7, 2)
    monkeypatch.setattr(pallas_roi_align, "ROI_ALIGN_MODE", "hybrid")
    got = multilevel_roi_align(feats, rois, levels, valid, 7, 2)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_hybrid_backward_windowed_kernel(setup, monkeypatch):
    """Hybrid with the RMW backward kernel forced (interpret mode) matches
    the dense autodiff gradient — the pairing the mode exists for."""
    feats, rois, levels, valid = setup

    def loss(fn):
        def f(fd):
            o = fn(fd, rois, levels, valid, 7, 2)
            return jnp.sum(jnp.sin(o) * o)

        return f

    gref = jax.grad(loss(multilevel_roi_align))(feats)
    monkeypatch.setattr(pallas_roi_align, "USE_PALLAS_ROI_ALIGN", True)
    gh = jax.grad(
        loss(pallas_roi_align.multilevel_roi_align_hybrid)
    )(feats)
    for l in sorted(feats):
        np.testing.assert_allclose(
            np.asarray(gh[l]), np.asarray(gref[l]), atol=5e-4, rtol=1e-4
        )


def test_roi_align_mode_resolution(monkeypatch):
    """Mode resolution: explicit mode wins, MAX_ROIS degrades to dense,
    bad strings fail loudly, unset falls back to legacy auto."""
    ok = {2: jnp.zeros((1, 16, 32, 128))}
    monkeypatch.setattr(pallas_roi_align, "ROI_ALIGN_MODE", "hybrid")
    assert pallas_roi_align.roi_align_mode(16, ok) == "hybrid"
    assert (
        pallas_roi_align.roi_align_mode(pallas_roi_align.MAX_ROIS + 1, ok)
        == "dense"
    )
    monkeypatch.setattr(pallas_roi_align, "ROI_ALIGN_MODE", "bogus")
    with pytest.raises(ValueError):
        pallas_roi_align.roi_align_mode(16, ok)
    monkeypatch.setattr(pallas_roi_align, "ROI_ALIGN_MODE", None)
    monkeypatch.setattr(pallas_roi_align, "USE_PALLAS_ROI_ALIGN", True)
    assert pallas_roi_align.roi_align_mode(16, ok) == "windowed"
    monkeypatch.setattr(pallas_roi_align, "USE_PALLAS_ROI_ALIGN", False)
    assert pallas_roi_align.roi_align_mode(16, ok) == "dense"


def test_mode_guards_unaligned_channels(monkeypatch):
    """Channels not a multiple of 128 lanes must degrade every kernel mode
    to dense ON TPU: both kernels collapse (rows, dx, C) -> (rows, dx*C),
    which Mosaic only supports for whole lane registers (observed on chip:
    'infer-vector-layout: unsupported shape cast' on vector<32x40x64> ->
    vector<32x2560> — the CHANNEL_RATIO=0.25 student's 64-channel FPN in
    the rpn_topk --train-both drive). The guard is Mosaic-specific, so on
    CPU interpret mode an explicitly requested kernel mode is honored for
    unaligned channels (advisor r4) — this test pins both behaviors."""
    c64 = {
        2: jnp.zeros((1, 64, 64, 64)),
        3: jnp.zeros((1, 32, 32, 64)),
    }
    on_tpu = jax.default_backend() == "tpu"
    # auto mode never picks the kernel off-TPU; on TPU the lane guard
    # refuses it for 64-channel features
    monkeypatch.setattr(pallas_roi_align, "USE_PALLAS_ROI_ALIGN", None)
    assert not pallas_roi_align.use_windowed_kernel(16, c64)
    # explicit windowed/hybrid: degraded at the resolver on TPU, honored
    # (with interpret-mode lowering) elsewhere
    for mode in ("windowed", "hybrid"):
        monkeypatch.setattr(pallas_roi_align, "ROI_ALIGN_MODE", mode)
        expected = "dense" if on_tpu else mode
        assert pallas_roi_align.roi_align_mode(16, c64) == expected
    # the 8x8-minimum level guard is Mosaic-independent: every backend
    # degrades explicit kernel modes to dense on a sub-8 level
    tiny = {6: jnp.zeros((1, 2, 4, 256))}
    for mode in ("windowed", "hybrid"):
        monkeypatch.setattr(pallas_roi_align, "ROI_ALIGN_MODE", mode)
        assert pallas_roi_align.roi_align_mode(16, tiny) == "dense"
    # aligned channels keep the explicit mode
    ok = {2: jnp.zeros((1, 64, 64, 256))}
    monkeypatch.setattr(pallas_roi_align, "ROI_ALIGN_MODE", "windowed")
    assert pallas_roi_align.roi_align_mode(16, ok) == "windowed"


def test_auto_mode_default_is_hybrid(monkeypatch):
    """Unset knobs on a TPU backend must resolve to HYBRID (the fastest
    measured pairing, BENCH_NOTES round-4); the legacy USE_PALLAS_ROI_ALIGN
    force knob keeps meaning windowed."""
    ok = {2: jnp.zeros((1, 64, 64, 256))}
    monkeypatch.setattr(pallas_roi_align, "ROI_ALIGN_MODE", None)
    monkeypatch.setattr(pallas_roi_align, "USE_PALLAS_ROI_ALIGN", None)
    expected = "hybrid" if jax.default_backend() == "tpu" else "dense"
    assert pallas_roi_align.roi_align_mode(16, ok) == expected
    monkeypatch.setattr(pallas_roi_align, "USE_PALLAS_ROI_ALIGN", True)
    assert pallas_roi_align.roi_align_mode(16, ok) == "windowed"


def test_meta_layout_cols_major(setup):
    """meta must stay (META_COLS, r_pad) — roi-major (R, 8) gets its last
    dim lane-padded to 128 in the SMEM allocation (512 B/roi), which blew
    the 1 MB scalar-memory budget at bs8's 4096 train rois on chip."""
    feats, rois, levels, _ = setup
    meta, fmeta, _, _, r_pad = pallas_roi_align._build_meta(
        feats, rois, levels, 7, 2
    )
    assert meta.shape == (pallas_roi_align.META_COLS, r_pad)
    assert fmeta.shape == (r_pad, pallas_roi_align.FMETA_COLS)
    # worst-case SMEM footprint at the roi cap: half the 1 MB budget
    assert pallas_roi_align.MAX_ROIS * pallas_roi_align.META_COLS * 4 \
        <= 512 * 1024


def test_auto_mode_guards_tiny_levels(monkeypatch):
    """Auto mode must refuse the kernel when any level dim is below the
    8-sublane granularity — Mosaic rejects the degenerate window slices
    (observed on chip: 'infer-vector-layout: unsupported shape cast' with
    a 1x2 P6 at a 64px canvas). An explicit force still takes the kernel."""
    monkeypatch.setattr(pallas_roi_align, "USE_PALLAS_ROI_ALIGN", None)
    tiny = {
        2: jnp.zeros((1, 16, 32, 8)),
        5: jnp.zeros((1, 2, 4, 8)),  # < 8 on both dims
    }
    ok = {2: jnp.zeros((1, 16, 32, 8)), 5: jnp.zeros((1, 8, 8, 8))}
    assert not pallas_roi_align.use_windowed_kernel(16, tiny)
    # sane levels: auto == backend test (False here on CPU)
    assert pallas_roi_align.use_windowed_kernel(16, ok) == (
        jax.default_backend() == "tpu"
    )
    # explicit force wins regardless of shape (interpret mode on CPU)
    monkeypatch.setattr(pallas_roi_align, "USE_PALLAS_ROI_ALIGN", True)
    assert pallas_roi_align.use_windowed_kernel(16, tiny)


def test_inference_flag_biases_auto_to_windowed(monkeypatch):
    """inference=True marks a no-backward call site: the auto default
    flips from HYBRID (dense fwd tuned for train-step overlap) to the
    WINDOWED forward — the round-5 serving stage decomposition measured
    the dense forward as 89.5 of the 137 ms Faster serving step at 1000
    rois/im, and windowed took the rows 58.4 -> 93.2 imgs/s
    (results/rcnn_infer_stages.json, rcnn_inference_roiwin.json)."""
    ok = {2: jnp.zeros((1, 16, 32, 128))}
    monkeypatch.setattr(pallas_roi_align, "ROI_ALIGN_MODE", None)
    monkeypatch.setattr(pallas_roi_align, "USE_PALLAS_ROI_ALIGN", None)
    # auto is backend-gated; pin the TPU answer regardless of host
    monkeypatch.setattr(pallas_roi_align.jax, "default_backend",
                        lambda: "tpu")
    assert pallas_roi_align.roi_align_mode(16, ok) == "hybrid"
    assert (
        pallas_roi_align.roi_align_mode(16, ok, inference=True) == "windowed"
    )
    # explicit mode still wins over the inference hint
    monkeypatch.setattr(pallas_roi_align, "ROI_ALIGN_MODE", "hybrid")
    assert (
        pallas_roi_align.roi_align_mode(16, ok, inference=True) == "hybrid"
    )
    monkeypatch.setattr(pallas_roi_align, "ROI_ALIGN_MODE", None)
    # incompatible shapes degrade the inference hint to dense as usual
    c64 = {2: jnp.zeros((1, 64, 64, 64))}
    assert pallas_roi_align.roi_align_mode(16, c64, inference=True) == "dense"
