"""Chip guard: PartialReduce exact top-k multiset equality on tied scores.

Advisor r4: the EXACT_TOPK=True default rides approx_max_k(recall_target=
1.0), whose exactness on TPU is an XLA guarantee CPU CI cannot re-check
(the CPU lowering is exact by construction). This drive runs the same
assertion as tests/test_topk_tpu.py on the real chip and records a durable
result — re-run it on every TPU toolchain bump (docs/OPERATIONS.md).

Run: PYTHONPATH=/root/repo python tools_drives/topk_guard_drive.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax

    from driveutil import record_result
    from tests.test_topk_tpu import check_multiset, tied_batch

    assert jax.default_backend() == "tpu", "run on the chip"
    ks = (100, 1000, 6000)
    for k in ks:
        check_multiset(tied_batch(seed=k), k)
        print(f"k={k}: multiset exact on ties OK", flush=True)
    record_result("topk_partial_reduce_guard", {
        "metric": "partial_reduce_recall1_exactness",
        "ks": list(ks),
        "rows": 64, "n": 20000, "distinct_values": 256,
        "result": "exact multiset + valid unique indices at every k",
    })
    print("DRIVE OK")


if __name__ == "__main__":
    main()
