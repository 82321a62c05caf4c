"""Oracle-output type lint (VERDICT r7 ask #2).

DuckDB `SUM(BIGINT)` returns HUGEINT and `int * 10.0` returns
DECIMAL; both survive Python `==` comparison locally but render
differently through the driver's pandas-based value hash (HUGEINT →
float64, so `10001324.0` vs Spark's `10001324`). That one class of
type artifact accounted for 10 of the 12 driver reds in r6/r7 while
every local check stayed green.

This lint closes the class forever: every registered oracle is
DESCRIBE-planned on DuckDB (no execution, no Spark, ~2 s total) and
every output column type must be in the explicitly-allowed set —
HUGEINT and DECIMAL are rejected outright, so an uncast SUM can never
ship again.
"""

from __future__ import annotations

import duckdb
import pytest

from batch_processing_etl_orchestration_spark.plans import QUERIES
from tests.conftest import SF_SMALL as SF_DIR  # one fixture-location source
from tests.oracle_utils import TABLES

# Types whose pandas rendering provably matches the Spark column the
# engine emits alongside them. Anything else — HUGEINT, DECIMAL(p,s),
# TINYINT/SMALLINT surprises — must be CAST explicitly in the oracle.
ALLOWED = {
    "BIGINT",
    "INTEGER",
    "DOUBLE",
    "FLOAT",
    "VARCHAR",
    "DATE",
    "TIMESTAMP",
    "BOOLEAN",
}


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield c
    c.close()


ORACLES = [(n, s.oracle) for n, s in QUERIES.items() if s.oracle is not None]


@pytest.mark.parametrize("name,oracle", ORACLES, ids=[n for n, _ in ORACLES])
def test_oracle_output_types(con, name, oracle):
    rows = con.execute(f"DESCRIBE {oracle}").fetchall()
    bad = [
        (col, typ)
        for col, typ, *_ in rows
        if _base_type(typ) not in ALLOWED
    ]
    assert not bad, (
        f"{name}: oracle output columns {bad} are outside the allowed "
        f"type set {sorted(ALLOWED)} — HUGEINT/DECIMAL render "
        f"differently through the driver's pandas hash than the Spark "
        f"column they mirror; add an explicit CAST in the oracle SQL"
    )


def _base_type(typ: str) -> str:
    """'DECIMAL(13,1)' → 'DECIMAL'; list/struct types pass through so
    they fail loudly (no oracle should emit them)."""
    return typ.split("(", 1)[0].strip()
