"""operators/expectations.py — DQ rules, quarantine split, FK audit."""

from __future__ import annotations

from pyspark.sql import functions as F

from batch_processing_etl_orchestration_spark.operators.expectations import (
    check_expectations,
    fk_orphans,
    split_expectations,
    stamp_violations,
)


def _frame(spark):
    return spark.createDataFrame(
        [
            (1, 10.0, "A"),
            (2, -5.0, "A"),      # breaks positive
            (3, None, "B"),      # NULL value → breaks positive (strict)
            (4, 7.0, "X"),       # breaks domain
            (5, -1.0, "X"),      # breaks both
        ],
        "id bigint, v double, cat string",
    )


def _rules():
    return {
        "positive": F.col("v") > 0,
        "domain": F.col("cat").isin("A", "B"),
    }


def test_check_counts_and_strict_nulls(spark):
    got = {r["rule"]: r for r in check_expectations(_frame(spark), _rules()).collect()}
    assert got["positive"]["n_rows"] == 5
    assert got["positive"]["n_violations"] == 3  # -5, NULL, -1
    assert got["domain"]["n_violations"] == 2    # two X rows
    assert abs(got["positive"]["pass_rate"] - 0.4) < 1e-12


def test_single_scan(spark):
    plan = (
        check_expectations(_frame(spark), _rules())
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Scan ") == 1


def test_split_quarantine(spark):
    good, bad = split_expectations(_frame(spark), _rules())
    assert sorted(r["id"] for r in good.collect()) == [1]
    bad_rows = {r["id"]: sorted(r["violated_rules"]) for r in bad.collect()}
    assert bad_rows == {
        2: ["positive"],
        3: ["positive"],
        4: ["domain"],
        5: ["domain", "positive"],
    }
    assert good.columns == ["id", "v", "cat"]  # original schema


def test_stamp_is_pure_projection(spark):
    plan = (
        stamp_violations(_frame(spark), _rules())
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_fk_orphans_counts_null_and_missing(spark):
    child = spark.createDataFrame(
        [(1,), (2,), (99,), (None,)], "k bigint"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk bigint")
    row = fk_orphans(child, "k", parent, "pk", "c->p").collect()[0]
    assert (row["fk"], row["n_rows"], row["n_orphans"]) == ("c->p", 4, 2)


def test_observe_expectations_free_ride(spark):
    """Violation counts ride the consuming job (CollectMetrics in the
    plan, no second scan) and equal the standalone audit."""
    from batch_processing_etl_orchestration_spark.operators.expectations import (
        observe_expectations,
    )

    df = _frame(spark)
    observed, obs = observe_expectations(df, _rules(), "dq")
    plan = observed._jdf.queryExecution().executedPlan().toString()
    assert "CollectMetrics" in plan and plan.count("Scan ") == 1
    observed.write.mode("overwrite").format("noop").save()
    got = obs.get
    want = {
        r["rule"]: r["n_violations"]
        for r in check_expectations(df, _rules()).collect()
    }
    assert got["n_rows"] == 5
    assert got["positive__violations"] == want["positive"] == 3
    assert got["domain__violations"] == want["domain"] == 2
