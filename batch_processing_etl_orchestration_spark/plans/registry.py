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


def _attested_names() -> set[str]:
    """Query names with a fully-green row in any prior round's
    CORRECTNESS_r*.json (driver artifact at the repo root). The driver's
    correctness gate records only a prefix of the registry, so ordering
    un-attested queries first rotates coverage until every operator has
    a green row."""
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    green: set[str] = set()
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
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
    """Registry names, queries without a green driver attestation first
    (stable within each group by registration order)."""
    green = _attested_names()
    names = list(QUERIES)
    return [n for n in names if n not in green] + [n for n in names if n in green]


def all_queries() -> dict[str, QueryFn]:
    return {name: QUERIES[name].fn for name in ordered_names()}


def all_oracle_sql() -> dict[str, str]:
    return {
        name: QUERIES[name].oracle
        for name in ordered_names()
        if QUERIES[name].oracle is not None
    }
