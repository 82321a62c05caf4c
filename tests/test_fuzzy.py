"""operators/fuzzy.py — pigeonhole-blocked edit-distance join."""

from __future__ import annotations

from pyspark.sql import functions as F

from batch_processing_etl_orchestration_spark.operators.fuzzy import (
    blocked_fuzzy_join,
)


def _pairs(df):
    return sorted((r["lid"], r["rid"], r["dist"]) for r in df.collect())


def test_substitutions_complete_vs_bruteforce(spark):
    """Every pair within distance 2 (substitutions) is found — the
    pigeonhole guarantee — and nothing below the bar leaks in."""
    base = ["abcdefgh", "abcdefgx", "abxdefgx", "xxxxefgh", "zzzzzzzz"]
    left = spark.createDataFrame(
        [(i, s) for i, s in enumerate(base)], "lid int, s string"
    )
    right = spark.createDataFrame(
        [(i + 100, s) for i, s in enumerate(base)], "rid int, s string"
    )
    got = _pairs(
        blocked_fuzzy_join(
            left, right, "s", max_dist=2,
            left_keep=["lid"], right_keep=["rid"],
        )
    )
    brute = (
        left.crossJoin(right)
        .withColumn("dist", F.levenshtein(left["s"], right["s"]))
        .where(F.col("dist") <= 2)
    )
    want = sorted((r["lid"], r["rid"], r["dist"]) for r in brute.collect())
    assert got == want
    assert (0, 101, 1) in got and (0, 104, 8) not in got


def test_single_indel_caught_same_ceiling(spark):
    """max_dist=1 with an end-anchored suffix segment catches a
    deletion when both lengths share ⌈len/2⌉ (9 for 17 and 18)."""
    left = spark.createDataFrame([(1, "abcdefghijklmnopqr")], "lid int, s string")
    right = spark.createDataFrame(
        [(2, "acdefghijklmnopqr"), (3, "abcdefghijklmnopqr")],
        "rid int, s string",
    )  # rid=2 drops 'b' (len 17): head edit, tail-9 intact
    got = _pairs(
        blocked_fuzzy_join(
            left, right, "s", max_dist=1,
            left_keep=["lid"], right_keep=["rid"],
        )
    )
    assert got == [(1, 2, 1), (1, 3, 0)]


def test_no_cross_product_shuffle(spark):
    """Blocking joins on (segment idx, text): the join keys in the
    plan are segment columns, not a Cartesian product."""
    left = spark.createDataFrame([(1, "abcdef")], "lid int, s string")
    right = spark.createDataFrame([(2, "abcdeg")], "rid int, s string")
    plan = (
        blocked_fuzzy_join(
            left, right, "s", max_dist=1,
            left_keep=["lid"], right_keep=["rid"],
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan


def test_degenerate_prefix_dropping_keeps_completeness(spark):
    """Shared-prefix keys ('ID#...'): with n_segments=4 the prefix
    segments are one giant bucket each; max_bucket drops the worst
    two indexes (completeness holds — a single substitution leaves 3
    of 4 intact, and 2 kept ⇒ ≥1 intact kept), the found pairs still
    equal brute force, and candidate volume collapses."""
    n = 300
    left = spark.range(n).select(
        F.col("id").alias("lid"),
        F.concat(F.lit("ID#"), F.lpad(F.col("id").cast("string"), 9, "0")).alias("s"),
    )
    # corrupt one char near the tail for every 3rd row
    right = spark.range(n).select(
        (F.col("id") + 1000).alias("rid"),
        F.when(
            F.col("id") % 3 == 0,
            F.concat(
                F.lit("ID#"),
                F.lpad(F.col("id").cast("string"), 8, "0"),
                F.lit("x"),
            ),
        )
        .otherwise(
            F.concat(F.lit("ID#"), F.lpad(F.col("id").cast("string"), 9, "0"))
        )
        .alias("s"),
    )
    got = _pairs(
        blocked_fuzzy_join(
            left, right, "s", max_dist=1,
            left_keep=["lid"], right_keep=["rid"],
            n_segments=4, max_bucket=50,
        )
    )
    brute = (
        left.crossJoin(right)
        .withColumn("dist", F.levenshtein(left["s"], right["s"]))
        .where(F.col("dist") <= 1)
    )
    want = sorted((r["lid"], r["rid"], r["dist"]) for r in brute.collect())
    assert got == want and len(got) >= n // 3


def test_wildcard_join_complete_vs_bruteforce(spark):
    """The character-deletion neighborhood finds every equal-length
    pair within one substitution (its completeness domain) and admits
    nothing farther."""
    from batch_processing_etl_orchestration_spark.operators.fuzzy import (
        wildcard_fuzzy_join,
    )

    base = ["prefix001", "prefix002", "prefix102", "prefix999", "zzzzzzzzz"]
    left = spark.createDataFrame(
        [(i, s) for i, s in enumerate(base)], "lid int, s string"
    )
    right = spark.createDataFrame(
        [(i + 100, s) for i, s in enumerate(base)], "rid int, s string"
    )
    got = _pairs(
        wildcard_fuzzy_join(
            left, right, "s", left_keep=["lid"], right_keep=["rid"]
        )
    )
    brute = (
        left.crossJoin(right)
        .withColumn("dist", F.levenshtein(left["s"], right["s"]))
        .where(F.col("dist") <= 1)
    )
    want = sorted((r["lid"], r["rid"], r["dist"]) for r in brute.collect())
    assert got == want
    # dist-0 pairs (shared every variant) appear exactly once
    assert got.count((0, 100, 0)) == 1


def test_wildcard_join_rejects_long_strings(spark):
    import pytest as _pytest

    from batch_processing_etl_orchestration_spark.operators.fuzzy import (
        wildcard_fuzzy_join,
    )

    left = spark.createDataFrame([(1, "a" * 80)], "lid int, s string")
    right = spark.createDataFrame([(2, "a" * 80)], "rid int, s string")
    with _pytest.raises(Exception, match="max_len"):
        wildcard_fuzzy_join(
            left, right, "s", left_keep=["lid"], right_keep=["rid"],
            max_len=64,
        ).collect()


def test_entropy_blocking_complete_on_low_entropy_keys(spark):
    """Entropy-balanced boundaries stay complete for substitutions on
    shared-prefix keys — the workload that defeats positional splits —
    and for max_dist=2."""
    from batch_processing_etl_orchestration_spark.operators.fuzzy import (
        entropy_blocked_fuzzy_join,
    )

    base = [f"Customer#{i:09d}" for i in range(0, 400, 7)]
    corrupt = [s[:12] + "xy" + s[14:] for s in base[:20]]  # 2 subs
    left = spark.createDataFrame(
        [(i, s) for i, s in enumerate(corrupt)], "lid int, s string"
    )
    right = spark.createDataFrame(
        [(i + 1000, s) for i, s in enumerate(base)], "rid int, s string"
    )
    got = _pairs(
        entropy_blocked_fuzzy_join(
            left, right, "s", max_dist=2,
            left_keep=["lid"], right_keep=["rid"],
        )
    )
    brute = (
        left.crossJoin(right)
        .withColumn("dist", F.levenshtein(left["s"], right["s"]))
        .where(F.col("dist") <= 2)
    )
    want = sorted((r["lid"], r["rid"], r["dist"]) for r in brute.collect())
    assert got == want and len(got) >= 20
