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


def _attested_names() -> set[str]:
    """Query names with a fully-green row in any prior round's
    CORRECTNESS_r*.json (driver artifact at the repo root). The driver's
    correctness gate records only a prefix of the registry, so ordering
    un-attested queries first rotates coverage until every operator has
    a green row."""
    green: set[str] = set()
    for path in sorted(glob.glob(os.path.join(_repo_root(), "CORRECTNESS_r*.json"))):
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
            if (
                rec.get("err") is None
                and rec.get("rows_match", False)
                and rec.get("schema_match", True)
                and rec.get("hash_match", True)
            ):
                green.add(name)
    return green


def ordered_names() -> list[str]:
    """Registry names, queries without a green driver attestation first,
    then the attested tail ROTATED by the upcoming round number so the
    driver's fixed-size prefix re-attests a different green subset each
    round (VERDICT r2 #3 / ADVICE: a regressed green must periodically
    re-enter the checked window). NOTE: iteration order therefore
    depends on the CORRECTNESS_r*.json artifacts at the repo root —
    callers needing a stable order should sort; correctness tests
    iterate QUERIES directly, which stays in registration order."""
    green = _attested_names()
    names = list(QUERIES)
    pending = [n for n in names if n not in green]
    tail = [n for n in names if n in green]
    if tail:
        # Stride by the slots the green tail gets inside the driver's
        # 50-row window so consecutive rounds tile the whole catalog.
        stride = max(1, 50 - len(pending))
        k = ((_latest_round() + 1) * stride) % len(tail)
        tail = tail[k:] + tail[:k]
    return pending + tail


def all_queries() -> dict[str, QueryFn]:
    return {name: QUERIES[name].fn for name in ordered_names()}


def all_oracle_sql() -> dict[str, str]:
    return {
        name: QUERIES[name].oracle
        for name in ordered_names()
        if QUERIES[name].oracle is not None
    }
