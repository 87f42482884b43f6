"""Pallas greedy-NMS kernel vs the jnp fori_loop form (interpret mode on
CPU; the same code compiles with Mosaic on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sad_tpu.ops.nms import NEG_INF, nms_fixed
from sad_tpu.ops.pallas_nms import nms_fixed_pallas


def _case(seed, k=300, clusters=30):
    """Clustered boxes so real suppression happens."""
    rng = np.random.RandomState(seed)
    centers = rng.uniform(0, 500, (clusters, 2))
    which = rng.randint(0, clusters, k)
    xy = centers[which] + rng.uniform(-8, 8, (k, 2))
    wh = rng.uniform(10, 60, (k, 2))
    boxes = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
    scores = rng.uniform(0.01, 1.0, k).astype(np.float32)
    return jnp.asarray(boxes), jnp.asarray(scores)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("thr", [0.3, 0.5])
def test_matches_jnp_nms(seed, thr):
    boxes, scores = _case(seed)
    i1, v1 = nms_fixed(boxes, scores, thr, 50)
    i2, v2 = nms_fixed_pallas(boxes, scores, thr, 50)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(
        np.asarray(i1)[np.asarray(v1)], np.asarray(i2)[np.asarray(v2)]
    )


def test_nonmultiple_of_128_k_and_invalid_tail():
    boxes, scores = _case(5, k=77)
    scores = scores.at[40:].set(NEG_INF)  # invalid candidates
    i1, v1 = nms_fixed(boxes, scores, 0.5, 60)
    i2, v2 = nms_fixed_pallas(boxes, scores, 0.5, 60)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(
        np.asarray(i1)[np.asarray(v1)], np.asarray(i2)[np.asarray(v2)]
    )
    assert not np.asarray(v2)[45:].any()  # fewer picks than max_out


def test_all_invalid():
    boxes, _ = _case(6, k=16)
    scores = jnp.full((16,), NEG_INF)
    idx, valid = nms_fixed_pallas(boxes, scores, 0.5, 10)
    assert not np.asarray(valid).any()
    np.testing.assert_array_equal(np.asarray(idx), 0)


def test_vmapped_batch_matches():
    """inference vmaps batched_nms over images — the pallas batching rule
    must produce the same per-image results."""
    bs = []
    ss = []
    for s in range(4):
        b, sc = _case(10 + s, k=128)
        bs.append(b)
        ss.append(sc)
    boxes = jnp.stack(bs)
    scores = jnp.stack(ss)
    iv1 = jax.vmap(lambda b, s: nms_fixed(b, s, 0.4, 25))(boxes, scores)
    iv2 = jax.vmap(lambda b, s: nms_fixed_pallas(b, s, 0.4, 25))(boxes, scores)
    np.testing.assert_array_equal(np.asarray(iv1[1]), np.asarray(iv2[1]))
    m = np.asarray(iv1[1])
    np.testing.assert_array_equal(np.asarray(iv1[0])[m], np.asarray(iv2[0])[m])


def test_sublane_batched_matches_per_problem():
    """nms_batched_pallas packs 8 problems per kernel program — every
    problem's result must equal the single-problem nms_fixed, including
    padded problems beyond a non-multiple-of-8 N."""
    from sad_tpu.ops.pallas_nms import nms_batched_pallas

    bs, ss = [], []
    for s in range(11):  # N=11: crosses the 8-sublane group boundary
        b, sc = _case(20 + s, k=200)
        if s == 4:
            sc = sc.at[:].set(NEG_INF)  # one all-invalid problem
        bs.append(b)
        ss.append(sc)
    boxes = jnp.stack(bs)
    scores = jnp.stack(ss)
    i2, v2 = nms_batched_pallas(boxes, scores, 0.4, 30)
    for s in range(11):
        i1, v1 = nms_fixed(boxes[s], scores[s], 0.4, 30)
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2[s]))
        m = np.asarray(v1)
        np.testing.assert_array_equal(np.asarray(i1)[m], np.asarray(i2[s])[m])


def test_nms_levels_batched_matches_per_image_generate_proposals():
    """The batched proposal path (proposal_candidates under vmap + one
    nms_levels_batched call) must reproduce the per-(level, image)
    generate_proposals results exactly, including levels with different
    candidate counts (padding semantics)."""
    from sad_tpu.ops.proposals import (
        generate_proposals,
        nms_levels_batched,
        proposal_candidates,
    )

    rng = np.random.RandomState(7)
    b = 3
    post_n, thr, pre_n = 40, 0.6, 120
    im_hw = jnp.asarray(
        rng.uniform(200, 400, (b, 2)).astype(np.float32)
    )
    levels = {}
    for lvl, (h, w) in {3: (16, 24), 4: (8, 12)}.items():
        a = 3
        anchors = jnp.asarray(
            np.stack(
                [
                    rng.uniform(0, 300, (h, w, a)),
                    rng.uniform(0, 300, (h, w, a)),
                    rng.uniform(40, 120, (h, w, a)),
                    rng.uniform(40, 120, (h, w, a)),
                ],
                axis=-1,
            ).astype(np.float32)
        )
        anchors = anchors.at[..., 2:].set(
            anchors[..., :2] + anchors[..., 2:]
        )
        scores = jnp.asarray(
            rng.uniform(0, 1, (b, h, w, a)).astype(np.float32)
        )
        deltas = jnp.asarray(
            rng.uniform(-0.3, 0.3, (b, h, w, a, 4)).astype(np.float32)
        )
        levels[lvl] = (scores, deltas, anchors)

    prop_levels = []
    for lvl, (scores, deltas, anchors) in levels.items():
        bx, ts, ms = jax.vmap(
            lambda s, d, ihw, a=anchors: proposal_candidates(
                s, d, a, ihw, pre_n, 8.0
            )
        )(scores, deltas, im_hw)
        prop_levels.append((lvl, bx, ts, ms))
    lv_b, lv_s, lv_v = nms_levels_batched(prop_levels, thr, post_n)

    for lvl, (scores, deltas, anchors) in levels.items():
        for i in range(b):
            ref_b, ref_s, ref_v = generate_proposals(
                scores[i], deltas[i], anchors, im_hw[i],
                pre_n, post_n, thr, 8.0,
            )
            np.testing.assert_array_equal(
                np.asarray(ref_v), np.asarray(lv_v[lvl][i])
            )
            m = np.asarray(ref_v)
            np.testing.assert_allclose(
                np.asarray(ref_b)[m], np.asarray(lv_b[lvl][i])[m], rtol=1e-6
            )
            np.testing.assert_allclose(
                np.asarray(ref_s)[m], np.asarray(lv_s[lvl][i])[m], rtol=1e-6
            )


def test_proposal_candidates_approx_branch_matches_exact_on_cpu():
    """cfg.RPN.EXACT_TOPK=False routes the pre-NMS candidate top-k through
    jax.lax.approx_max_k (the TPU throughput path). On CPU the approx
    lowering is an exact fallback, so both branches must agree bit-for-bit —
    the point is that the approx branch is compiled and executed by the
    suite rather than being TPU-only dead code (same policy as
    TEST.EXACT_TOPK, tests/test_parity_e2e.py)."""
    from sad_tpu.ops.proposals import proposal_candidates

    rng = np.random.RandomState(11)
    h, w, a = 32, 48, 3
    anchors = np.stack(
        [
            rng.uniform(0, 300, (h, w, a)),
            rng.uniform(0, 300, (h, w, a)),
            rng.uniform(40, 120, (h, w, a)),
            rng.uniform(40, 120, (h, w, a)),
        ],
        axis=-1,
    ).astype(np.float32)
    anchors[..., 2:] += anchors[..., :2]
    scores = jnp.asarray(rng.uniform(0, 1, (h, w, a)).astype(np.float32))
    deltas = jnp.asarray(
        rng.uniform(-0.3, 0.3, (h, w, a, 4)).astype(np.float32)
    )
    im_hw = jnp.asarray([320.0, 320.0], jnp.float32)

    # pre_n < total scores so the k < flat branch (the approx call) is
    # taken. Both variants run under the same jit wrapper: the comparison
    # isolates the top-k operator choice, not jit-vs-eager fusion noise.
    def run(exact):
        return jax.jit(
            lambda s, d, ihw: proposal_candidates(
                s, d, jnp.asarray(anchors), ihw, 500, 8.0,
                exact_topk=exact,
            )
        )(scores, deltas, im_hw)

    # Compare as a canonical-sorted set of candidate rows rather than
    # positionally: positional bitwise equality would rely on the non-TPU
    # approx_max_k fallback's tie ordering matching top_k's — an XLA
    # implementation detail, not a contract. Same candidate multiset ⇒
    # identical downstream NMS behavior.
    def rows(out):
        boxes, top_scores, masked_scores = (np.asarray(o) for o in out)
        stacked = np.concatenate(
            [top_scores[:, None], masked_scores[:, None], boxes], axis=1
        )
        return stacked[np.lexsort(stacked.T[::-1])]

    np.testing.assert_allclose(rows(run(True)), rows(run(False)), rtol=1e-6)
