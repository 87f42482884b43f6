"""Fused Pallas loss kernel vs the reference-exact jnp ops (interpret mode on
CPU; the same code compiles with Mosaic on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sad_tpu.ops import losses as L
from sad_tpu.ops.pallas_losses import fused_cls_losses

ATOL = 3e-5
RTOL = 3e-4

GAMMA_F, ALPHA_F, SCALE_F = 2.0, 0.25, 0.125
GAMMA_D, ALPHA_D, BETA_D, IGN, SCALE_D = 2.0, 0.5, 0.0, -1, 0.25


def _case(seed, n=2, h=6, w=6, a=3, c=80):
    rng = np.random.RandomState(seed)
    logits = jnp.asarray(rng.randn(n, h, w, a, c) * 3, jnp.float32)
    pt = jnp.asarray(rng.uniform(1e-4, 1 - 1e-4, (n, h, w, a, c)), jnp.float32)
    labels = jnp.asarray(rng.randint(-1, c + 1, (n, h, w, a)), jnp.int32)
    return logits, pt, labels


def _fused(logits, pt, labels, fg, dn):
    return fused_cls_losses(
        logits, pt, labels, fg, dn,
        GAMMA_F, ALPHA_F, SCALE_F, GAMMA_D, ALPHA_D, BETA_D, IGN, SCALE_D,
    )


def _separate(logits, pt, labels, fg, dn):
    focal = L.sigmoid_focal_loss(logits, labels, fg, GAMMA_F, ALPHA_F, SCALE_F)
    distill = L.sigmoid_adaptive_distill_loss(
        logits, pt, labels, dn, GAMMA_D, ALPHA_D, BETA_D, IGN, SCALE_D
    )
    return focal, distill


@pytest.mark.parametrize("seed", [0, 1])
def test_fused_forward_matches_separate_ops(seed):
    logits, pt, labels = _case(seed)
    fg, dn = jnp.float32(7.0), jnp.float32(423.5)
    f1, d1 = jax.jit(_fused)(logits, pt, labels, fg, dn)
    f2, d2 = _separate(logits, pt, labels, fg, dn)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=RTOL, atol=ATOL)


def test_fused_backward_matches_separate_ops():
    logits, pt, labels = _case(3)
    fg, dn = jnp.float32(5.0), jnp.float32(100.0)

    def total_fused(x):
        f, d = _fused(x, pt, labels, fg, dn)
        return 1.3 * f + 0.7 * d

    def total_sep(x):
        f, d = _separate(x, pt, labels, fg, dn)
        return 1.3 * f + 0.7 * d

    g1 = jax.jit(jax.grad(total_fused))(logits)
    g2 = jax.grad(total_sep)(logits)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=RTOL, atol=ATOL)


def test_fused_no_teacher_gradient():
    logits, pt, labels = _case(5)
    fg, dn = jnp.float32(5.0), jnp.float32(100.0)
    g = jax.grad(lambda tp: sum(_fused(logits, tp, labels, fg, dn)))(pt)
    assert float(jnp.abs(g).max()) == 0.0


def test_fused_row_padding_is_masked():
    # row count not a multiple of the kernel tile: padded rows must not leak
    logits, pt, labels = _case(7, n=1, h=3, w=5, a=1)  # 15 rows
    fg, dn = jnp.float32(2.0), jnp.float32(50.0)
    f1, d1 = jax.jit(_fused)(logits, pt, labels, fg, dn)
    f2, d2 = _separate(logits, pt, labels, fg, dn)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=RTOL, atol=ATOL)


def test_train_step_fused_matches_unfused():
    """End-to-end: one joint distillation step with USE_PALLAS_LOSSES on/off
    produces identical metrics and parameter updates."""
    import dataclasses

    from tests.test_model_and_train import tiny_arch, tiny_cfg
    from sad_tpu.models import RetinaNet
    from sad_tpu.models.model_builder import init_model_params
    from sad_tpu.train import TrainState, init_momentum_state, make_train_step

    cfg_fused = dataclasses.replace(tiny_cfg(n_groups=2), USE_PALLAS_LOSSES=True)
    cfg_plain = dataclasses.replace(cfg_fused, USE_PALLAS_LOSSES=False)
    arch = tiny_arch()
    student, teacher = RetinaNet(arch), RetinaNet(arch)
    H = W = 128
    B, G = 4, 2
    sp = init_model_params(student, jax.random.PRNGKey(0), (1, H, W, 3))
    tp = init_model_params(teacher, jax.random.PRNGKey(1), (1, H, W, 3))
    rng = np.random.RandomState(0)
    a = arch.num_anchors
    batch = {
        "data": jnp.asarray(rng.randn(B, H, W, 3), jnp.float32),
        "teacher_data": jnp.asarray(rng.randn(B, H, W, 3), jnp.float32),
        "labels": {}, "bbox_targets": {}, "fg_mask": {},
        "fg_num": jnp.asarray([3.0, 5.0], jnp.float32),
    }
    for lvl in cfg_fused.fpn_levels():
        s = 2 ** lvl
        h, w = H // s, W // s
        batch["labels"][lvl] = jnp.asarray(rng.randint(-1, 5, (B, h, w, a)), jnp.int32)
        batch["bbox_targets"][lvl] = jnp.asarray(rng.randn(B, h, w, a, 4), jnp.float32)
        batch["fg_mask"][lvl] = jnp.asarray(rng.uniform(size=(B, h, w, a)) < 0.05)

    outs = {}
    for name, cfg in (("fused", cfg_fused), ("plain", cfg_plain)):
        step = jax.jit(make_train_step(cfg, student, teacher, n_groups=G))
        state = TrainState(sp, init_momentum_state(sp).velocity)
        new_state, metrics = step(state, tp, batch, jnp.float32(0.01))
        outs[name] = (new_state, metrics)

    mf, mp = outs["fused"][1], outs["plain"][1]
    assert set(mf) == set(mp)
    for k in mp:
        np.testing.assert_allclose(
            np.asarray(mf[k]), np.asarray(mp[k]), rtol=3e-4, atol=3e-5,
            err_msg=k,
        )
    # updated params match
    jax.tree_util.tree_map(
        lambda a_, b_: np.testing.assert_allclose(
            np.asarray(a_), np.asarray(b_), rtol=1e-4, atol=1e-5
        ),
        outs["fused"][0].params,
        outs["plain"][0].params,
    )


def test_raw_per_group_with_inkernel_powsum():
    """fused_cls_losses_raw: per-group raw sums + the PowSum normalizer in
    the same pass; fwd+bwd vs the reference-exact per-group jnp composition
    (including the adaptive normalizer summed across two 'levels')."""
    from sad_tpu.ops.pallas_losses import fused_cls_losses_raw

    G = 2
    l1, p1, t1 = _case(11, n=4, h=6, w=6, a=3)  # M=432, packed path
    l2, p2, t2 = _case(12, n=4, h=3, w=3, a=3)  # M=108, unpacked fallback
    fg = jnp.asarray([7.0, 11.0], jnp.float32)
    POW = 1.8

    def fused(x1, x2):
        r1 = fused_cls_losses_raw(
            x1, p1, t1, G, GAMMA_F, ALPHA_F, GAMMA_D, ALPHA_D, BETA_D, IGN, POW, True
        )
        r2 = fused_cls_losses_raw(
            x2, p2, t2, G, GAMMA_F, ALPHA_F, GAMMA_D, ALPHA_D, BETA_D, IGN, POW, True
        )
        norms = r1[2] + r2[2]  # cross-level adaptive normalizer
        fg_np, dn_np = jnp.maximum(fg, 1.0), jnp.maximum(norms, 1.0)
        total = jnp.float32(0.0)
        for r in (r1, r2):
            total = total + SCALE_F * jnp.sum(r[0] / fg_np)
            total = total + SCALE_D * jnp.sum(r[1] / dn_np)
        return total, norms

    def _gv(x):
        return x.reshape((G, x.shape[0] // G) + x.shape[1:])

    def ref(x1, x2):
        norms = jax.vmap(lambda a_, b_: L.pow_sum([a_, b_], POW))(_gv(p1), _gv(p2))
        total = jnp.float32(0.0)
        for x, p, t in ((x1, p1, t1), (x2, p2, t2)):
            f = jax.vmap(
                lambda xx, tt, ss: L.sigmoid_focal_loss(
                    xx, tt, ss, GAMMA_F, ALPHA_F, SCALE_F
                )
            )(_gv(x), _gv(t), fg)
            d = jax.vmap(
                lambda xx, pp, tt, nn: L.sigmoid_adaptive_distill_loss(
                    xx, pp, tt, nn, GAMMA_D, ALPHA_D, BETA_D, IGN, SCALE_D
                )
            )(_gv(x), _gv(p), _gv(t), norms)
            total = total + jnp.sum(f) + jnp.sum(d)
        return total, norms

    (v1, n1), (g1a, g1b) = jax.jit(
        jax.value_and_grad(fused, argnums=(0, 1), has_aux=True)
    )(l1, l2)
    (v2, n2), (g2a, g2b) = jax.value_and_grad(ref, argnums=(0, 1), has_aux=True)(
        l1, l2
    )
    np.testing.assert_allclose(float(v1), float(v2), rtol=RTOL)
    np.testing.assert_allclose(np.asarray(n1), np.asarray(n2), rtol=RTOL)
    np.testing.assert_allclose(np.asarray(g1a), np.asarray(g2a), rtol=2e-3, atol=ATOL)
    np.testing.assert_allclose(np.asarray(g1b), np.asarray(g2b), rtol=2e-3, atol=ATOL)


class TestAlignedTilePath:
    """Geometries where the tile divides rows-per-group take the aligned
    kernels (no row masks, per-tile partial sums); numerics must match the
    separate ops exactly like the masked fallback path does."""

    def _aligned_case(self, seed, g=2):
        # 2 imgs x 8x8x4 anchors = 512 labels; pack 8 -> r=64, rpg=64/g
        rng = np.random.RandomState(seed)
        n, h, w, a, c = 2, 8, 8, 4, 80
        logits = jnp.asarray(rng.randn(n, h, w, a, c) * 3, jnp.float32)
        pt = jnp.asarray(
            rng.uniform(1e-4, 1 - 1e-4, (n, h, w, a, c)), jnp.float32)
        labels = jnp.asarray(rng.randint(-1, c + 1, (n, h, w, a)), jnp.int32)
        return logits, pt, labels

    def test_tile_chooser(self):
        from sad_tpu.ops.pallas_losses import _choose_tile

        assert _choose_tile(23040) == 512   # P3 bs32/G16 geometry
        assert _choose_tile(5760) == 480    # P4
        assert _choose_tile(360) == 360     # P6
        assert _choose_tile(90) is None     # P7 -> masked fallback
        assert _choose_tile(32) == 32

    def test_aligned_forward_and_powsum_match(self):
        from sad_tpu.ops.pallas_losses import _choose_tile, fused_cls_losses_raw

        logits, pt, labels = self._aligned_case(0)
        g = 2
        assert _choose_tile(labels.size // 8 // g) is not None
        raw = jax.jit(
            fused_cls_losses_raw, static_argnums=tuple(range(3, 12))
        )(logits, pt, labels, g, GAMMA_F, ALPHA_F, GAMMA_D, ALPHA_D,
          BETA_D, IGN, 1.8, True)
        # reference: per-group separate ops with Np=1 (raw sums)
        lg = logits.reshape(g, -1, *logits.shape[1:])
        pg = pt.reshape(g, -1, *pt.shape[1:])
        tg = labels.reshape(g, -1, *labels.shape[1:])
        for i in range(g):
            f = L.sigmoid_focal_loss(lg[i], tg[i], 1.0, GAMMA_F, ALPHA_F, 1.0)
            d = L.sigmoid_adaptive_distill_loss(
                lg[i], pg[i], tg[i], 1.0, GAMMA_D, ALPHA_D, BETA_D, IGN, 1.0)
            ps = jnp.sum(pg[i] ** 1.8)
            np.testing.assert_allclose(raw[0][i], f, rtol=RTOL, atol=ATOL)
            np.testing.assert_allclose(raw[1][i], d, rtol=RTOL, atol=ATOL)
            np.testing.assert_allclose(raw[2][i], ps, rtol=RTOL, atol=ATOL)

    def test_aligned_backward_matches(self):
        logits, pt, labels = self._aligned_case(1)
        fg = jnp.asarray([5.0, 9.0], jnp.float32)
        dn = jnp.asarray([80.0, 120.0], jnp.float32)

        def total_fused(x):
            f, d = _fused(x, pt, labels, fg, dn)
            return 1.3 * f + 0.7 * d

        g1 = jax.jit(jax.grad(total_fused))(logits)
        # per-group separate ops
        lg = logits.reshape(2, -1, *logits.shape[1:])
        pg = pt.reshape(2, -1, *pt.shape[1:])
        tg = labels.reshape(2, -1, *labels.shape[1:])

        def total_sep(x):
            out = 0.0
            for i in range(2):
                xi = x.reshape(2, -1, *x.shape[1:])[i]
                f = L.sigmoid_focal_loss(
                    xi, tg[i], fg[i], GAMMA_F, ALPHA_F, SCALE_F)
                d = L.sigmoid_adaptive_distill_loss(
                    xi, pg[i], tg[i], dn[i], GAMMA_D, ALPHA_D, BETA_D, IGN,
                    SCALE_D)
                out = out + 1.3 * f + 0.7 * d
            return out

        g2 = jax.grad(total_sep)(logits)
        np.testing.assert_allclose(
            np.asarray(g1), np.asarray(g2), rtol=RTOL, atol=ATOL)
