"""operators/profile.py — one-pass table profiler."""

from __future__ import annotations

from pyspark.sql import functions as F

from batch_processing_etl_orchestration_spark.operators.profile import profile_table
from batch_processing_etl_orchestration_spark.tables import load_table


def test_nulls_and_types(spark):
    df = spark.createDataFrame(
        [(1, "a", 2.5), (2, None, None), (None, "b", 1.5), (4, "a", 2.5)],
        "k bigint, s string, v double",
    )
    prof = {r["column"]: r for r in profile_table(df).collect()}
    assert set(prof) == {"k", "s", "v"}
    assert all(r["n_rows"] == 4 for r in prof.values())
    assert prof["k"]["n_nulls"] == 1 and prof["k"]["n_distinct"] == 3
    assert prof["s"]["n_nulls"] == 1 and prof["s"]["n_distinct"] == 2
    assert prof["s"]["min_str"] == "a" and prof["s"]["max_str"] == "b"
    assert prof["s"]["min_num"] is None and prof["s"]["avg_value"] is None
    assert prof["v"]["n_distinct"] == 2
    assert prof["v"]["min_num"] == 1.5 and prof["v"]["max_num"] == 2.5
    # avg_value lands on the 1e-6 grid (integer-fold mean)
    assert abs(prof["v"]["avg_value"] - (2.5 + 1.5 + 2.5) / 3) < 1e-6
    assert prof["v"]["min_str"] is None


def test_single_scan_plan(spark, sf_dir):
    """All metrics for all columns come from ONE scan of the source —
    the profiler's reason to exist at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    plan = profile_table(ev)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1


def test_approx_mode_single_scan_no_expand(spark, sf_dir):
    """approx_distinct=True profiles via HLL partials: no Expand node
    in the plan (exact multi-distinct needs one), still one scan."""
    ev = load_table(spark, sf_dir, "events")
    exact_plan = profile_table(ev)._jdf.queryExecution().executedPlan().toString()
    approx_plan = (
        profile_table(ev, approx_distinct=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Expand" in exact_plan
    assert "Expand" not in approx_plan

    exact = {r["column"]: r["n_distinct"] for r in profile_table(ev).collect()}
    approx = {
        r["column"]: r["n_distinct"]
        for r in profile_table(ev, approx_distinct=True).collect()
    }
    for k in exact:
        assert abs(approx[k] - exact[k]) <= max(0.05 * exact[k], 2), k


def test_column_subset(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    out = profile_table(ev, cols=["event_type", "value"]).collect()
    assert [r["column"] for r in out] == ["event_type", "value"]
