"""Registry that pairs each named query (a PySpark plan builder) with
its DuckDB oracle SQL — the shape the driver's correctness gate
consumes (__spark_entry__.py). Queries without an oracle (ML-backed or
streaming operators that ANSI SQL can't express) register oracle=None
and get the driver's weaker rows-only check.
"""

from __future__ import annotations

import glob
import json
import os
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    tags: tuple[str, ...] = field(default=())
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, tags: tuple[str, ...] = ()):
    """Decorator: add a query to the catalog."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, tags=tags, doc=(fn.__doc__ or "").strip()
        )
        return fn

    return deco


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _latest_rows() -> dict[str, tuple[int, bool]]:
    """Per query name, (round, green) of its NEWEST row in any
    CORRECTNESS_r*.json driver artifact — green means rows+schema+hash
    all match with no err. Rounds are walked in ascending round-number
    order so a later round's row overwrites an earlier one's — a query
    green in r1 but red in r4 reports False (VERDICT r5 Missing #1:
    union-across-rounds stranded regressed queries in the attested
    tail)."""
    rounds: list[tuple[int, str]] = []
    for path in glob.glob(os.path.join(_repo_root(), "CORRECTNESS_r*.json")):
        stem = os.path.basename(path)[len("CORRECTNESS_r") : -len(".json")]
        try:
            rounds.append((int(stem), path))
        except ValueError:
            continue
    latest: dict[str, tuple[int, bool]] = {}
    for rnd, path in sorted(rounds):
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, rec in rows.items():
            if not isinstance(rec, dict):
                continue
            latest[name] = (
                rnd,
                rec.get("err") is None
                and rec.get("rows_match", False)
                and rec.get("schema_match", True)
                and rec.get("hash_match", True),
            )
    return latest


def _latest_status() -> dict[str, bool]:
    """Per query name, whether its newest driver row is fully green."""
    return {name: green for name, (_, green) in _latest_rows().items()}


_fp_cache: dict[str, tuple[int, str]] = {}


def current_fingerprint(name: str) -> str:
    """The query's source fingerprint at HEAD (plans/fingerprint.py),
    memoized per fn identity — ordered_names() is called repeatedly
    (all_queries + all_oracle_sql in one driver import) and getsource
    over 200+ fns is not free."""
    from batch_processing_etl_orchestration_spark.plans.fingerprint import (
        query_fingerprint,
    )

    spec = QUERIES[name]
    hit = _fp_cache.get(name)
    if hit is not None and hit[0] == id(spec.fn):
        return hit[1]
    fp = query_fingerprint(spec.fn, spec.oracle)
    _fp_cache[name] = (id(spec.fn), fp)
    return fp


def _recorded_fingerprints() -> dict[str, dict]:
    """plans/fingerprints.json: per query, the fingerprint of the code
    its latest GREEN driver attestation actually tested (recorded by
    tools/record_fingerprints.py from the corresponding git tree).
    Missing/unreadable file → empty map (every green then counts as
    changed — conservative: it re-attests)."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "fingerprints.json")
    try:
        with open(path) as f:
            doc = json.load(f)
    except (OSError, ValueError):
        return {}
    qs = doc.get("queries")
    return qs if isinstance(qs, dict) else {}


def ordered_names() -> list[str]:
    """Registry names ordered for the driver's fixed-size correctness
    window: (1) queries whose LATEST driver row is red — a regression
    or a healed break that must re-attest — then (2) queries never
    attested at all, then (3) every attested-green query STALEST FIRST
    (ascending latest-attestation round; at the same round, queries
    whose source fingerprint no longer matches the one recorded at
    that attestation sort before fingerprint-stable ones, registration
    order last). Stalest-first replaces r5's strided rotation (VERDICT
    r8 next #5): every driver window re-attests exactly the queries
    whose proof is oldest, so no query's attestation age can exceed
    ceil(|catalog| / window) rounds while the window keeps landing —
    the bound tests/test_registry.py::test_attestation_freshness
    enforces at HEAD.

    Fingerprint-changed greens (VERDICT r9 next #1: a green row proves
    the code that RAN, so a rewired query is unproven at HEAD) used to
    preempt the ENTIRE stable tail; r16 inherited-state fix: an
    optimization round that rewires 30+ queries then starves the
    window — the r15 churn pushed 30 stable queries past the freshness
    ceiling. Merging both classes by attestation age bounds EVERY
    query's re-proof age by the same ceiling: a rewired query ages
    from its pre-rewire attestation like everyone else (and wins ties
    at equal age), so it still re-attests within the ceiling, while
    mass churn can no longer crowd out the queries whose proof is
    oldest. NOTE: iteration order depends on the CORRECTNESS_r*.json
    artifacts at the repo root and plans/fingerprints.json — callers
    needing a stable order should sort; correctness tests iterate
    QUERIES directly, which stays in registration order."""
    rows = _latest_rows()
    rec = _recorded_fingerprints()
    names = list(QUERIES)

    def _fp_changed(n: str) -> bool:
        entry = rec.get(n)
        return (
            not isinstance(entry, dict)
            or entry.get("fp") != current_fingerprint(n)
        )

    latest_red = [n for n in names if n in rows and not rows[n][1]]
    never = [n for n in names if n not in rows]
    order = {n: i for i, n in enumerate(names)}
    attested = sorted(
        (n for n in names if n in rows and rows[n][1]),
        key=lambda n: (rows[n][0], not _fp_changed(n), order[n]),
    )
    return latest_red + never + attested


def all_queries() -> dict[str, QueryFn]:
    return {name: QUERIES[name].fn for name in ordered_names()}


def all_oracle_sql() -> dict[str, str]:
    return {
        name: QUERIES[name].oracle
        for name in ordered_names()
        if QUERIES[name].oracle is not None
    }
