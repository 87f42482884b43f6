"""Evidence citations must resolve (VERDICT r4 Missing #3 / Weak #1).

Round 4 published its two biggest chip results citing raw logs under the
gitignored tools_drives/logs/, and the files vanished before the snapshot.
Policy since round 5: durable claims cite tools_drives/results/*.json
(git-tracked, written by the drives via driveutil.record_result); logs are
ephemeral color. This test walks every prose file for citations of either
form and asserts:

- every cited results/ path exists (they are tracked, so this holds in a
  fresh clone too);
- every cited logs/ path exists *when the logs directory is present* (a
  fresh clone legitimately has no logs — but on the machine that wrote the
  citation, a dangling log means the claim just lost its artifact);
- every results/*.json parses and carries the record envelope
  (name/date/backend/payload).
"""

import json
import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RESULTS = os.path.join(REPO, "tools_drives", "results")
LOGS = os.path.join(REPO, "tools_drives", "logs")

PROSE = ["BENCH_NOTES.md", "README.md", "ROADMAP.md", "PARITY.md",
         "SURVEY.md", "BASELINE.md"]
PROSE += [os.path.join("docs", f) for f in os.listdir(
    os.path.join(REPO, "docs"))] if os.path.isdir(
    os.path.join(REPO, "docs")) else []

CITE = re.compile(r"tools_drives/(results|logs)/[A-Za-z0-9_.{},-]+")


def expand_braces(path):
    """One level of {a,b,c} shorthand used in prose citations."""
    m = re.search(r"\{([^}]*)\}", path)
    if not m:
        return [path]
    return [path[: m.start()] + alt + path[m.end():]
            for alt in m.group(1).split(",")]


def cited_paths():
    out = []
    for name in PROSE:
        fp = os.path.join(REPO, name)
        if not os.path.isfile(fp):
            continue
        for mm in CITE.finditer(open(fp).read()):
            for p in expand_braces(mm.group(0)):
                if p.endswith((".json", ".log", ".txt")):
                    out.append((name, p))
    return out


def test_all_cited_evidence_resolves():
    missing = []
    logs_present = os.path.isdir(LOGS) and os.listdir(LOGS)
    for src, rel in cited_paths():
        full = os.path.join(REPO, rel)
        if rel.startswith("tools_drives/results/"):
            if not os.path.isfile(full):
                missing.append(f"{src}: {rel}")
        elif logs_present and not os.path.isfile(full):
            missing.append(f"{src}: {rel} (log cited but absent)")
    assert not missing, "dangling evidence citations:\n" + "\n".join(missing)


def test_results_records_wellformed():
    if not os.path.isdir(RESULTS):
        pytest.skip("no results yet")
    for f in os.listdir(RESULTS):
        if not f.endswith(".json"):
            continue
        rec = json.load(open(os.path.join(RESULTS, f)))
        for key in ("name", "date", "backend", "payload"):
            assert key in rec, f"{f}: missing {key!r}"
        assert rec["name"] == f[:-5], f"{f}: name/filename mismatch"


def test_some_evidence_is_cited():
    """The policy is only useful if BENCH_NOTES actually cites records."""
    assert any(rel.startswith("tools_drives/results/")
               for _, rel in cited_paths())
