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
    compare_query(spark, sf_dir, spec.fn, spec.oracle, allow_empty="empty-ok" in spec.tags)


def test_rows_only_queries_run(spark, sf_dir):
    for name, spec in QUERIES.items():
        if spec.oracle is None:
            df = spec.fn(spark, sf_dir)
            assert df.count() >= 0, name


def test_approx_percentiles_within_rank_error(spark):
    """percentile_approx(accuracy=10000) must land within the sketch's
    rank-error bound of the exact percentile: the returned value's true
    rank is within ~n/accuracy positions of the target rank. (The
    registered query now emits per-quantile ok-flags the oracle
    hash-checks; this test re-derives the bound from the raw sketch
    values independently.)"""
    from pyspark.sql import functions as F

    from batch_processing_etl_orchestration_spark.tables import load_table

    sf = "/root/testdata/sf0.01"
    got = {
        r["o_orderpriority"]: (r["approx_p"], r["n_orders"])
        for r in load_table(spark, sf, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.percentile_approx("o_totalprice", [0.25, 0.5, 0.9], 10000).alias(
                "approx_p"
            ),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .collect()
    }
    rows = load_table(spark, sf, "orders").select("o_orderpriority", "o_totalprice").collect()
    by_prio: dict[str, list[float]] = {}
    for r in rows:
        by_prio.setdefault(r["o_orderpriority"], []).append(r["o_totalprice"])
    for prio, (approx, n) in got.items():
        vals = sorted(by_prio[prio])
        assert n == len(vals)
        for q, a in zip([0.25, 0.5, 0.9], approx):
            # true rank of the returned value vs target rank
            import bisect

            lo = bisect.bisect_left(vals, a)
            hi = bisect.bisect_right(vals, a)
            target = q * (len(vals) - 1)
            tol = max(1.0, len(vals) / 10000) + 1
            assert lo - tol <= target <= hi + tol, (prio, q, a)
