"""TPU-only guard: PartialReduce exact top-k really is exact on chip.

The EXACT_TOPK=True parity path defaults to approx_max_k(recall_target=1.0)
on TPU (ops/topk.py `auto`).  On CPU, approx_max_k lowers to an exact
fallback, so the default suite cannot detect a regression if a future XLA
weakens the recall-1.0 guarantee on the TPU lowering.  This module pins the
multiset guarantee ON CHIP — run it whenever the TPU toolchain is bumped:

    SAD_TPU_TEST_ON_CHIP=1 python -m pytest tests/test_topk_tpu.py -m tpu -q

(conftest.py leaves the real backend in place under SAD_TPU_TEST_ON_CHIP=1).
The same assertion runs in every round's chip queue via
tools_drives/topk_guard_drive.py, which records a tracked results JSON.
Boundary-tie identity intentionally differs from lax.top_k (documented in
ops/topk.py): we assert the VALUE multiset and that returned indices point
at those values, not index-for-index equality.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.tpu


def tied_batch(seed: int, rows: int = 64, n: int = 20000) -> np.ndarray:
    """Score fields with heavy ties: quantized sigmoid-like scores."""
    rng = np.random.RandomState(seed)
    # 256 distinct values over 20k entries -> ~78 ties per value.
    return (rng.randint(0, 256, (rows, n)).astype(np.float32)) / 255.0


def check_multiset(scores: np.ndarray, k: int) -> None:
    from sad_tpu.ops import topk

    x = jnp.asarray(scores)
    ev, ei = jax.jit(lambda a: jax.lax.top_k(a, k))(x)
    pv, pi = jax.jit(lambda a: topk.top_k(a, k, exact=True))(x)
    ev, ei, pv, pi = map(np.asarray, (ev, ei, pv, pi))
    for r in range(scores.shape[0]):
        np.testing.assert_array_equal(
            np.sort(pv[r]), np.sort(ev[r]),
            err_msg=f"row {r}: value multiset mismatch (recall<1.0?)",
        )
        # Indices must point at the values they claim.
        np.testing.assert_array_equal(scores[r][pi[r]], pv[r])
        assert len(np.unique(pi[r])) == k, f"row {r}: duplicate indices"


@pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="TPU-toolchain guard; CPU's "
    "approx_max_k is exact by construction so this check is vacuous there"
)
@pytest.mark.parametrize("k", [100, 1000, 6000])
def test_partial_reduce_exactness_on_ties(k):
    check_multiset(tied_batch(seed=k), k)
