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


def _latest_round() -> int:
    """Highest N among CORRECTNESS_r{N}.json driver artifacts (0 if
    none) — used to vary the green-tail rotation each round."""
    latest = 0
    for path in glob.glob(os.path.join(_repo_root(), "CORRECTNESS_r*.json")):
        stem = os.path.basename(path)[len("CORRECTNESS_r") : -len(".json")]
        try:
            latest = max(latest, int(stem))
        except ValueError:
            continue
    return latest


def _latest_status() -> dict[str, bool]:
    """Per query name, whether its NEWEST row in any CORRECTNESS_r*.json
    driver artifact is fully green (rows+schema+hash, no err). Rounds
    are walked in ascending round-number order so a later round's row
    overwrites an earlier one's — a query green in r1 but red in r4
    reports False (VERDICT r5 Missing #1: union-across-rounds stranded
    regressed queries in the attested tail)."""
    rounds: list[tuple[int, str]] = []
    for path in glob.glob(os.path.join(_repo_root(), "CORRECTNESS_r*.json")):
        stem = os.path.basename(path)[len("CORRECTNESS_r") : -len(".json")]
        try:
            rounds.append((int(stem), path))
        except ValueError:
            continue
    status: dict[str, bool] = {}
    for _, path in sorted(rounds):
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
            status[name] = (
                rec.get("err") is None
                and rec.get("rows_match", False)
                and rec.get("schema_match", True)
                and rec.get("hash_match", True)
            )
    return status


def ordered_names() -> list[str]:
    """Registry names ordered for the driver's fixed-size correctness
    window: (1) queries whose LATEST driver row is red — a regression
    or a healed break that must re-attest — then (2) queries never
    attested at all, then (3) the latest-green tail ROTATED by the
    upcoming round number so consecutive rounds re-check a different
    green subset (VERDICT r2 #3 + r5 #2). NOTE: iteration order
    therefore depends on the CORRECTNESS_r*.json artifacts at the repo
    root — callers needing a stable order should sort; correctness
    tests iterate QUERIES directly, which stays in registration
    order."""
    status = _latest_status()
    names = list(QUERIES)
    latest_red = [n for n in names if status.get(n) is False]
    pending = [n for n in names if n not in status]
    tail = [n for n in names if status.get(n) is True]
    if tail:
        # Stride by the slots the green tail gets inside the driver's
        # 50-row window so consecutive rounds tile the whole catalog.
        stride = max(1, 50 - len(latest_red) - len(pending))
        k = ((_latest_round() + 1) * stride) % len(tail)
        tail = tail[k:] + tail[:k]
    return latest_red + pending + tail


def all_queries() -> dict[str, QueryFn]:
    return {name: QUERIES[name].fn for name in ordered_names()}


def all_oracle_sql() -> dict[str, str]:
    return {
        name: QUERIES[name].oracle
        for name in ordered_names()
        if QUERIES[name].oracle is not None
    }
