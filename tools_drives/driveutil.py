"""Durable evidence records for chip drives (VERDICT r4 Missing #3).

Round-4 published its two biggest results (the dress rehearsal, the
RoIAlign kernel table) citing raw logs under tools_drives/logs/ — which is
gitignored, and the files vanished mid-round. The fix: every drive writes a
compact machine-readable record to tools_drives/results/<name>.json, which
IS git-tracked and is the citation target for BENCH_NOTES
(tests/test_evidence.py asserts every cited results path resolves).

Record shape: {"name", "date", "backend", "payload"} — payload is whatever
the drive measured (metrics, config knobs, ratios). Drives should call
record_result as the LAST step so a crashed run leaves no half-record;
failures worth recording (e.g. the round-4 x101_infer HTTP 413) can be
recorded explicitly with payload={"status": "failed", ...}.
"""
from __future__ import annotations

import datetime
import json
import os

RESULTS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "results")


def record_result(name: str, payload: dict) -> str:
    """Write tools_drives/results/<name>.json (git-tracked) and return the
    path. Overwrites: one file per drive/config, latest run wins — history
    lives in git."""
    try:
        import jax
        backend = jax.default_backend()
    except Exception:  # record even if jax is hosed
        backend = "unknown"
    os.makedirs(RESULTS_DIR, exist_ok=True)
    path = os.path.join(RESULTS_DIR, f"{name}.json")
    rec = {
        "name": name,
        "date": datetime.datetime.now().isoformat(timespec="seconds"),
        "backend": backend,
        "payload": payload,
    }
    with open(path, "w") as f:
        json.dump(rec, f, indent=1, sort_keys=False)
        f.write("\n")
    print(f"[driveutil] recorded -> {path}", flush=True)
    return path
