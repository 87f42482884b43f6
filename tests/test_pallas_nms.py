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
