"""Chip drive: EXACT top-k implementations on the headline decode geometry.

The default decode path (TEST.EXACT_TOPK=True, reference parity) pays
sort-based jax.lax.top_k over the flattened per-level score grid — at the
640x1024 80-class geometry P3 alone is 80*128*9*80 = 7.37M scores per
image, and fast_profile_drive measured the exact path at 3.0x the cost of
approx_max_k(0.99) end-to-end (14.47 vs 4.80 ms/im). XLA's ApproxTopK
custom call with recall_target=1.0 computes the EXACT top-k via the same
two-pass PartialReduce algorithm (arXiv:2206.14286) — this drive checks
on real hardware that (a) its result multiset equals lax.top_k's on both
random and adversarially-tied score fields, and (b) how it times against
sort-based exact and approx(0.99).

Run: PYTHONPATH="/root/repo:$PYTHONPATH" python tools_drives/exact_topk_impl_drive.py
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    k = 1000
    n = 80 * 128 * 9 * 80  # P3 flat size at 640x1024, A=9, C=80
    rng = np.random.RandomState(0)

    def variants(x):
        return {
            "sort_topk": lambda: jax.lax.top_k(x, k),
            "partial_reduce_exact": lambda: jax.lax.approx_max_k(
                x, k, recall_target=1.0
            ),
            "approx_099": lambda: jax.lax.approx_max_k(
                x, k, recall_target=0.99
            ),
        }

    # ---- correctness: exact-set equality vs lax.top_k ------------------
    cases = {
        # sigmoid-prob-like scores, all distinct whp
        "random": rng.rand(n).astype(np.float32),
        # dense near-tie field: few distinct values, heavy boundary ties
        "quantized_ties": (
            np.round(rng.rand(n).astype(np.float32) * 16.0) / 16.0
        ),
        # constant field: EVERY element ties at the k-th value
        "all_equal": np.full(n, 0.25, np.float32),
    }
    ok = True
    for name, arr in cases.items():
        x = jnp.asarray(arr)
        vs, vi = jax.jit(lambda x: jax.lax.top_k(x, k))(x)
        es, ei = jax.jit(
            lambda x: jax.lax.approx_max_k(x, k, recall_target=1.0)
        )(x)
        vs, es = np.asarray(vs), np.asarray(es)
        ei_np = np.asarray(ei)
        same_values = np.array_equal(np.sort(vs), np.sort(es))
        # indices must point at elements carrying the reported score
        consistent = np.array_equal(arr[ei_np], es)
        print(f"{name}: values_equal={same_values} "
              f"indices_consistent={consistent}", flush=True)
        ok = ok and same_values and consistent
    # ---- timing over evolving state (no memoization) -------------------
    iters = 30
    times = {}
    for vname in ("sort_topk", "partial_reduce_exact", "approx_099"):
        def step(x, _):
            s, i = variants(x)[vname]()
            # fold the result back so each iteration differs
            x = x.at[i[:7]].add(s[:7] * 1e-6)
            return x, s[0]

        f = jax.jit(lambda x: jax.lax.scan(step, x, None, length=iters))
        x0 = jnp.asarray(rng.rand(n).astype(np.float32))
        xf, _ = f(x0)  # compile + warm
        jax.block_until_ready(xf)
        t0 = time.perf_counter()
        xf, _ = f(x0)
        jax.block_until_ready(xf)
        dt = (time.perf_counter() - t0) / iters * 1e3
        times[vname] = round(dt, 3)
        print(f"{vname}: {dt:.3f} ms per top-{k} over {n/1e6:.2f}M",
              flush=True)

    print(json.dumps({
        "metric": "exact_topk_impl",
        "exact_set_ok": bool(ok),
        "ms_per_call": times,
        "speedup_exact": round(
            times["sort_topk"] / times["partial_reduce_exact"], 2
        ),
    }), flush=True)


if __name__ == "__main__":
    main()
