"""The local twin of the driver's t2 correctness gate: every query in
the catalog that declares an oracle is executed on Spark and on DuckDB
at sf=0.01 and compared (count + schema + order-insensitive values).
"""

from __future__ import annotations

import pytest

from batch_processing_etl_orchestration_spark.plans import QUERIES

from tests.oracle_utils import compare_query

ORACLE_QUERIES = sorted(n for n, s in QUERIES.items() if s.oracle is not None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, sf_dir, name):
    spec = QUERIES[name]
    compare_query(spark, sf_dir, spec.fn, spec.oracle)


def test_rows_only_queries_run(spark, sf_dir):
    for name, spec in QUERIES.items():
        if spec.oracle is None:
            df = spec.fn(spark, sf_dir)
            assert df.count() >= 0, name
