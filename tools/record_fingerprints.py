"""Record, per registered query, the source fingerprint of the code
its latest GREEN driver attestation actually tested (VERDICT r9 next
#1) into plans/fingerprints.json — the store ordered_names() compares
against to decide whether a green row still proves the code at HEAD.

How it knows what the driver tested: the driver commits each round's
artifacts as ``round N: verdict/advice/correctness/bench`` ON TOP of
the code it just attested, so that commit's tree IS the attested code.
For every round that is some query's latest green, the tool extracts
the tree (`git archive`) and fingerprints every query in it via a
subprocess (tools/_fp_dump.py) whose sys.path points at the old tree —
the algorithm itself (plans/fingerprint.py, stdlib-only) is loaded by
file path from the CURRENT repo so old and new code hash identically.

Run at ROUND START, before touching any query code (round-practices
memory): updates are incremental — an entry is rewritten only when the
query's latest green round is newer than the recorded one, so re-runs
are cheap and never clobber a fingerprint with post-rewire code.

A query attested in a round whose tree predates the query (renames) or
whose fingerprint the dump could not compute simply gets NO entry —
ordered_names() treats missing as changed, which re-attests it (safe).
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FP_FILE = os.path.join(
    REPO, "batch_processing_etl_orchestration_spark", "plans",
    "fingerprints.json",
)
FP_ALGO = os.path.join(
    REPO, "batch_processing_etl_orchestration_spark", "plans",
    "fingerprint.py",
)
DUMP = os.path.join(REPO, "tools", "_fp_dump.py")


def _round_commit(rnd: int) -> str | None:
    out = subprocess.run(
        ["git", "-C", REPO, "log", "--format=%H %s"],
        capture_output=True, text=True, check=True,
    ).stdout
    pat = re.compile(rf"^([0-9a-f]+) round {rnd}: verdict")
    for line in out.splitlines():
        m = pat.match(line)
        if m:
            return m.group(1)
    return None


def _tree_fingerprints(sha: str) -> dict[str, str]:
    with tempfile.TemporaryDirectory() as tmp:
        archive = subprocess.run(
            ["git", "-C", REPO, "archive", sha],
            capture_output=True, check=True,
        ).stdout
        subprocess.run(["tar", "-x", "-C", tmp], input=archive, check=True)
        proc = subprocess.run(
            [sys.executable, DUMP, tmp, FP_ALGO],
            capture_output=True, text=True, cwd=tmp,
        )
        if proc.returncode != 0:
            print(proc.stderr, file=sys.stderr)
            raise RuntimeError(f"fingerprint dump failed for {sha}")
        if proc.stderr.strip():
            print(proc.stderr.strip(), file=sys.stderr)
        return json.loads(proc.stdout)


def _write_store(recorded: dict, algo: int) -> None:
    with open(FP_FILE, "w") as f:
        json.dump(
            {"v": 1, "algo": algo,
             "queries": {k: recorded[k] for k in sorted(recorded)}},
            f, indent=1,
        )
        f.write("\n")


def main() -> None:
    sys.path.insert(0, REPO)
    from batch_processing_etl_orchestration_spark.plans import registry as R
    from batch_processing_etl_orchestration_spark.plans.fingerprint import (
        ALGO_VERSION,
    )

    latest = R._latest_rows()
    try:
        with open(FP_FILE) as f:
            doc = json.load(f)
        recorded = doc.get("queries", {})
        stored_algo = doc.get("algo", 1)
    except (OSError, ValueError):
        recorded, stored_algo = {}, ALGO_VERSION
    if stored_algo != ALGO_VERSION:
        # Hash-input schema changed: every stored fp was computed by a
        # different algorithm and would read as spurious drift (or
        # spurious stability). Re-fingerprint every attested tree.
        print(f"algo {stored_algo} -> {ALGO_VERSION}: re-recording all")
        recorded = {}

    # rounds whose tree we must fingerprint = latest-GREEN rounds of
    # queries with a missing or older-round record
    need: dict[int, list[str]] = {}
    for name, (rnd, green) in latest.items():
        if not green or name not in R.QUERIES:
            continue
        entry = recorded.get(name)
        if isinstance(entry, dict) and entry.get("round", -1) >= rnd:
            continue
        need.setdefault(rnd, []).append(name)

    failures = 0
    for rnd in sorted(need):
        sha = _round_commit(rnd)
        if sha is None:
            print(f"WARN: no driver commit found for round {rnd}; "
                  f"skipping {len(need[rnd])} queries", file=sys.stderr)
            continue
        # One unfingerprintable historical tree must not discard the
        # fingerprints of every other round in the run (ADVICE r10 #3):
        # degrade to missing-entry (ordered_names re-attests) and keep
        # going; the store is flushed after EVERY round below.
        try:
            fps = _tree_fingerprints(sha)
        except (RuntimeError, subprocess.CalledProcessError,
                ValueError, OSError) as exc:
            print(f"WARN: round {rnd} ({sha[:8]}) dump failed: {exc}; "
                  f"leaving {len(need[rnd])} queries unrecorded",
                  file=sys.stderr)
            failures += 1
            continue
        hit = miss = 0
        for name in need[rnd]:
            if name in fps:
                recorded[name] = {"round": rnd, "fp": fps[name]}
                hit += 1
            else:
                recorded.pop(name, None)  # absent in attested tree →
                miss += 1                 # treat as changed (re-attest)
        print(f"round {rnd} ({sha[:8]}): recorded {hit}, missing {miss}")
        _write_store(recorded, ALGO_VERSION)  # incremental flush

    _write_store(recorded, ALGO_VERSION)
    print(f"wrote {len(recorded)} fingerprints to {FP_FILE}"
          + (f" ({failures} round(s) failed — rerun after fixing)"
             if failures else ""))


if __name__ == "__main__":
    main()
