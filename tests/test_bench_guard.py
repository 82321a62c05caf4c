"""Pins for bench.py's guard plumbing (no Spark session needed):
the row-count guard (VERDICT r9 next #3), the two-probe baseline
unpacking (r9 next #4), and the committed baseline's integrity —
a BENCH_LOCAL.json without rows/probes would silently disarm both
guards for a round."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def test_row_regression_detects_any_delta():
    base = {"q_a": 10, "q_b": 0, "q_c": 7}
    assert bench._row_regressions(
        {"q_a": 10, "q_b": 0, "q_c": 7}, base, set()
    ) == []
    hits = bench._row_regressions({"q_a": 9, "q_b": 1, "q_c": 7}, base, set())
    assert len(hits) == 2 and any("q_a" in h for h in hits)
    # exemption and new-query (absent from baseline) skips
    assert bench._row_regressions({"q_a": 9, "q_b": 0, "q_c": 7}, base,
                                  {"q_a"}) == []
    assert bench._row_regressions(
        {"q_new": 5, "q_a": 10, "q_b": 0, "q_c": 7}, base, set()
    ) == []


def test_row_regression_flags_dropped_baseline_queries():
    """ADVICE r10 #1: a baseline query absent from the current run
    (dropped from BENCH_QUERIES, or a rename typo) fails loudly instead
    of silently promoting a shrunken baseline; BASELINE_EXEMPT is the
    deliberate-removal escape hatch."""
    base = {"q_a": 10, "q_b": 0}
    hits = bench._row_regressions({"q_a": 10}, base, set())
    assert len(hits) == 1 and "q_b" in hits[0] and "absent" in hits[0]
    assert bench._row_regressions({"q_a": 10}, base, {"q_b"}) == []


def test_baseline_unpacks_rows_and_both_probes(tmp_path):
    rec = {
        "sf": 0.1,
        "queries": {"q_a": 1.0},
        "rows": {"q_a": 42},
        "probe_sec": 0.1,
        "probe_shuffle_sec": 1.5,
    }
    (tmp_path / "BENCH_LOCAL.json").write_text(json.dumps(rec))
    q, p, ps, rows = bench._baseline(0.1, here=str(tmp_path))
    assert q == {"q_a": 1.0} and p == 0.1 and ps == 1.5 and rows == {"q_a": 42}
    # sf mismatch → empty baseline (an sf0.01 run must not be guarded
    # against the sf0.1 record)
    q, p, ps, rows = bench._baseline(0.01, here=str(tmp_path))
    assert q == {} and p is None and ps is None and rows == {}
    # pre-r10 baseline (no rows / shuffle probe) → guards disarm
    # gracefully instead of erroring
    (tmp_path / "BENCH_LOCAL.json").write_text(
        json.dumps({"sf": 0.1, "queries": {"q_a": 1.0}, "probe_sec": 0.1})
    )
    q, p, ps, rows = bench._baseline(0.1, here=str(tmp_path))
    assert q == {"q_a": 1.0} and p == 0.1 and ps is None and rows == {}


def test_committed_baseline_carries_rows_and_probes():
    """The promoted BENCH_LOCAL.json must keep the guard armed: every
    headline query timed AND counted, both probes present."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "BENCH_LOCAL.json")) as f:
        rec = json.load(f)
    if rec.get("sf") != 0.1:
        return  # an iteration run at another sf never promotes (guarded)
    assert rec.get("probe_sec", 0) > 0
    assert rec.get("probe_shuffle_sec", 0) > 0
    assert set(rec.get("rows", {})) == set(rec["queries"])


def test_round_gate_rejects_empty_selection():
    """Review r12: contradictory flags (--fast --only sweep) must be a
    usage error, never a vacuous PASS — a gate that verifies nothing
    and exits 0 is the silent-protocol-drift mode the tool closes."""
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "tools/round_gate.py", "--fast", "--only", "sweep"],
        cwd=root, capture_output=True, text=True,
    )
    assert r.returncode == 2
    assert "no gates selected" in r.stderr


def test_bench_sf100_queries_flag_validated_before_spark():
    """Review r12: a trailing bare --queries, an empty spec, and an
    unknown name must all be usage errors raised BEFORE the ~30 s
    session build (exit fast, no JVM)."""
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for argv, needle in [
        (["--bench-only", "--queries"], "usage: --queries"),
        (["--bench-only", "--queries", ""], "no query names given"),
        (["--bench-only", "--queries", "q_bogus"], "not in family"),
    ]:
        r = subprocess.run(
            [sys.executable, "tools/bench_sf100.py", *argv],
            cwd=root, capture_output=True, text=True,
        )
        # the usage message + nonzero exit prove validation fired
        # before any Spark session build (ADVICE r12 #2: no wall-clock
        # bound — pyspark import alone can eat seconds on a loaded
        # host, and the structural assert is the real evidence)
        assert r.returncode != 0, argv
        assert needle in (r.stderr + r.stdout), argv


def test_tail_queries_fits_budget_and_keeps_top_of_bill():
    """VERDICT r15 next #1a: the final stdout line must carry a
    per-query dict small enough to sit whole in the driver's ~2000-char
    tail window, ordered so the expensive queries (where regressions
    matter) always make the cut."""
    per_query = {f"q_name_{i:03d}": float(i) / 10 for i in range(148)}
    tq = bench._tail_queries(per_query, budget=1350)
    assert 0 < len(tq) < len(per_query)
    # serialized fragment honors the budget
    assert len(json.dumps(tq, separators=(",", ":"))) <= 1350
    # most-expensive-first: every included entry >= every excluded one
    floor = min(tq.values())
    excluded_max = max(
        v for k, v in per_query.items() if k not in tq
    )
    assert floor >= round(excluded_max, 2)
    # a small catalog fits whole
    small = {"q_a": 1.234, "q_b": 0.5}
    assert bench._tail_queries(small) == {"q_a": 1.23, "q_b": 0.5}


def test_should_promote_requires_same_sf_and_cpus():
    """VERDICT r15 next #1b: the r15 driver's 8-core scaling run passed
    the probe-calibrated guard and clobbered the 32-core baseline.
    Promotion now requires BOTH the baseline's sf and core count;
    legacy baselines missing either field default to the documented
    headline shape (sf0.1 / 32 cores)."""
    assert bench._should_promote(0.1, 32, 0.1, 32)
    assert not bench._should_promote(0.1, 32, 0.1, 8)  # the r15 clobber
    assert not bench._should_promote(0.1, 32, 0.01, 32)
    assert not bench._should_promote(0.1, 8, 0.1, 32)
    # legacy baselines: missing cpus/sf read as 32-core sf0.1
    assert bench._should_promote(0.1, None, 0.1, 32)
    assert not bench._should_promote(0.1, None, 0.1, 8)
    assert bench._should_promote(None, None, 0.1, 32)
    assert not bench._should_promote(None, None, 0.01, 32)


def test_committed_baseline_is_tagged_32_cores():
    """The committed baseline of record must be a 32-core run — an
    8-core record loosens every 32-core comparison ~1.2x (ADVICE r15)."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "BENCH_LOCAL.json")) as f:
        rec = json.load(f)
    if rec.get("sf") != 0.1:
        return
    assert rec.get("cpus") == 32
