"""Property tests for the exact-aggregation module: the core claim is
partition-invariance — the same values produce bit-identical results
under any physical distribution — plus agreement with an independent
Python computation of the scaled-long semantics."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings, strategies as st

from batch_processing_etl_orchestration_spark.functions.exact import (
    SCALE,
    exact_avg,
    exact_std,
    exact_sum,
)

_vals = st.lists(
    st.floats(min_value=-1e5, max_value=1e5, allow_nan=False, allow_infinity=False),
    min_size=1,
    max_size=60,
)


def _py_exact_sum(xs: list[float]) -> float:
    # Python-side reimplementation of the scaled-long semantics:
    # round-half-away-from-zero at 6 decimals, exact int sum, one
    # double division
    def r(x: float) -> int:
        scaled = x * SCALE
        return int(math.floor(scaled + 0.5)) if scaled >= 0 else int(math.ceil(scaled - 0.5))

    return sum(r(x) for x in xs) / float(SCALE)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(_vals)
def test_exact_sum_partition_invariant_and_matches_python(spark, xs):
    df1 = spark.createDataFrame([(x,) for x in xs], "v DOUBLE").coalesce(1)
    df8 = spark.createDataFrame([(x,) for x in xs], "v DOUBLE").repartition(8)
    s1 = df1.agg(exact_sum("v").alias("s")).collect()[0]["s"]
    s8 = df8.agg(exact_sum("v").alias("s")).collect()[0]["s"]
    assert s1 == s8  # bit-identical under different parallelism
    assert s1 == _py_exact_sum(xs)


def test_exact_stats_partition_invariant(spark):
    xs = [((-1) ** i) * (i * 0.123456789 % 97.3) for i in range(500)]
    rows1 = (
        spark.createDataFrame([(x,) for x in xs], "v DOUBLE")
        .coalesce(1)
        .agg(exact_avg("v").alias("a"), exact_std("v").alias("s"))
        .collect()[0]
    )
    rows8 = (
        spark.createDataFrame([(x,) for x in xs], "v DOUBLE")
        .repartition(8)
        .agg(exact_avg("v").alias("a"), exact_std("v").alias("s"))
        .collect()[0]
    )
    assert rows1["a"] == rows8["a"]
    assert rows1["s"] == rows8["s"]


class TestExactSumProperty:
    """Property: exact_sum is partition-count invariant and equals
    DuckDB's sql_exact_sum twin on arbitrary doubles — the foundation
    every oracle comparison in the repo stands on."""

    def test_partition_invariance_and_duckdb_parity(self, spark):
        import duckdb
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from batch_processing_etl_orchestration_spark.functions.exact import (
            exact_sum,
            sql_exact_sum,
        )

        @settings(max_examples=15, deadline=None)
        @given(
            st.lists(
                st.floats(
                    min_value=-1e6,
                    max_value=1e6,
                    allow_nan=False,
                    allow_infinity=False,
                ),
                min_size=1,
                max_size=60,
            ),
            st.integers(min_value=1, max_value=9),
        )
        def check(values, n_parts):
            df = spark.createDataFrame([(v,) for v in values], "x double")
            one = df.coalesce(1).agg(exact_sum("x").alias("s")).first()["s"]
            many = (
                df.repartition(n_parts).agg(exact_sum("x").alias("s")).first()["s"]
            )
            duck = duckdb.connect().execute(
                f"SELECT {sql_exact_sum('x')} AS s FROM (SELECT unnest(?) AS x)",
                [values],
            ).fetchone()[0]
            assert one == many == duck, (one, many, duck, values)

        check()
