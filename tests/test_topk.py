"""ops.topk dispatcher: the shared top-k for decode + RPN candidates.

The chip-side evidence (exact multiset equality incl. adversarial ties,
1.53x timing) is tools_drives/exact_topk_impl_drive.py / BENCH_NOTES
round-4; these tests pin the dispatch logic and the CPU-visible
contracts.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sad_tpu.ops import topk


def _multiset_equal(a, b):
    return np.array_equal(np.sort(np.asarray(a)), np.sort(np.asarray(b)))


@pytest.mark.parametrize("impl", ["sort", "partial_reduce"])
def test_exact_impls_same_multiset(monkeypatch, impl):
    monkeypatch.setattr(topk, "EXACT_TOPK_IMPL", impl)
    arr = np.random.RandomState(0).rand(4096).astype(np.float32)
    x = jnp.asarray(arr)
    vs, inds = jax.jit(lambda x: topk.top_k(x, 100))(x)
    ref_vs, _ = jax.lax.top_k(x, 100)
    assert _multiset_equal(vs, ref_vs)
    # indices point at elements carrying the reported score
    assert np.array_equal(arr[np.asarray(inds)], np.asarray(vs))
    # values descend (aggregate_to_topk sorts the final set)
    v = np.asarray(vs)
    assert np.all(v[:-1] >= v[1:])


@pytest.mark.parametrize("impl", ["sort", "partial_reduce"])
def test_exact_impls_tied_field(monkeypatch, impl):
    # every element ties at the k-th value: multiset must still be exact
    monkeypatch.setattr(topk, "EXACT_TOPK_IMPL", impl)
    x = jnp.full((512,), 0.25, jnp.float32)
    vs, inds = topk.top_k(x, 32)
    assert _multiset_equal(vs, np.full(32, 0.25, np.float32))
    assert len(set(np.asarray(inds).tolist())) == 32  # distinct elements


def test_k_ge_n_degenerate():
    x = jnp.asarray(np.random.RandomState(1).rand(16).astype(np.float32))
    vs, _ = topk.top_k(x, 16)
    assert _multiset_equal(vs, x)


@pytest.mark.parametrize("impl", ["auto", "sort"])
def test_auto_on_cpu_is_sort(monkeypatch, impl):
    # auto routes to lax.top_k off-TPU: bitwise identical incl. tie order
    monkeypatch.setattr(topk, "EXACT_TOPK_IMPL", impl)
    arr = np.round(np.random.RandomState(2).rand(2048) * 8.0) / 8.0
    x = jnp.asarray(arr.astype(np.float32))
    vs, inds = topk.top_k(x, 64)
    ref_vs, ref_inds = jax.lax.top_k(x, 64)
    assert np.array_equal(np.asarray(vs), np.asarray(ref_vs))
    assert np.array_equal(np.asarray(inds), np.asarray(ref_inds))


def test_approx_path_is_wired():
    # exact=False routes to approx_max_k; on CPU that lowers to an exact
    # fallback so the score set matches (tie order not asserted)
    x = jnp.asarray(np.random.RandomState(3).rand(4096).astype(np.float32))
    vs, _ = topk.top_k(x, 100, exact=False)
    ref_vs, _ = jax.lax.top_k(x, 100)
    assert _multiset_equal(vs, ref_vs)


def test_invalid_impl_loud(monkeypatch):
    monkeypatch.setattr(topk, "EXACT_TOPK_IMPL", "bogus")
    with pytest.raises(ValueError, match="SAD_TPU_EXACT_TOPK_IMPL"):
        topk.top_k(jnp.zeros((8,)), 2)
