"""dense_renumber: segmented ROW_NUMBER vs the single-window truth."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from batch_processing_etl_orchestration_spark.operators.renumber import (
    dense_renumber,
)
from batch_processing_etl_orchestration_spark.tables import load_table


def _truth(df, key):
    return {
        r[key]: r["idx"]
        for r in df.select(
            key,
            (F.row_number().over(Window.orderBy(key)) - 1).alias("idx"),
        ).collect()
    }


def test_matches_global_row_number_on_fixture(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    got = {r["doc_id"]: r["idx"] for r in dense_renumber(d, "doc_id").collect()}
    assert got == _truth(d, "doc_id")


def test_matches_on_sparse_and_clustered_keys(spark):
    """Non-uniform keys: gaps, one dense cluster inside a single
    bucket, negative-free but wildly uneven spacing."""
    keys = (
        list(range(100))                       # one dense bucket
        + [10_000, 10_001, 99_999]             # gaps
        + [4096 * k for k in range(1, 9)]      # clustered mid-range run
    )
    d = spark.createDataFrame([(k,) for k in keys], "k BIGINT")
    got = {r["k"]: r["idx"] for r in dense_renumber(d, "k").collect()}
    assert got == _truth(d, "k")
    assert sorted(got.values()) == list(range(len(keys)))


def test_one_based_and_custom_column(spark):
    d = spark.createDataFrame([(5,), (2,), (9,)], "k BIGINT")
    rows = {
        r["k"]: r["rn"]
        for r in dense_renumber(
            d, "k", idx_col="rn", zero_based=False
        ).collect()
    }
    assert rows == {2: 1, 5: 2, 9: 3}


def test_no_single_partition_window_over_data(spark, sf_dir):
    """The point of the operator: the event-stream window partitions
    by bucket (bounded width); only the bucket SUMMARY (metadata-
    sized) may use an unpartitioned window."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    plan = (
        dense_renumber(d, "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the big-side window must carry the bucket key in its partition
    import re

    wins = re.findall(r"Window \[row_number\(\)[^\]]*\], \[([^\]]*)\]", plan)
    assert any("__b" in w for w in wins), wins


def test_null_keys_raise_and_sparse_keys_bounded(spark):
    """NULL keys fail loudly (never silently dropped), a string key
    column is rejected at plan time, and hashed/snowflake-style sparse
    64-bit keys produce a BOUNDED bucket domain (adaptive width from
    the stats pass — a fixed width would make the offset table
    data-sized)."""
    import pytest as _pytest

    d = spark.createDataFrame([(1,), (None,), (3,)], "k BIGINT")
    with _pytest.raises(ValueError, match="NULL"):
        dense_renumber(d, "k")

    s = spark.createDataFrame([("a",), ("b",)], "k STRING")
    with _pytest.raises(TypeError, match="integer"):
        dense_renumber(s, "k")

    # sparse keys spanning the whole positive long range
    keys = [(37 + i * 104_729) ** 2 % (2**62) for i in range(500)]
    keys = sorted(set(keys))
    sp = spark.createDataFrame([(k,) for k in keys], "k BIGINT")
    out = dense_renumber(sp, "k", n_buckets=64)
    got = {r["k"]: r["idx"] for r in out.collect()}
    assert got == {k: i for i, k in enumerate(keys)}
    # the bucket domain respected n_buckets (bounded offsets table)
    import re

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # offsets stayed broadcast-sized


def test_full_range_long_keys_no_overflow(spark):
    """Keys spanning more than 2^63 (full signed-long range, the
    xxhash64-surrogate case the docstring recommends): a lo-anchored
    `key - lo` bucket would wrap in non-ANSI mode and order the
    largest keys FIRST — the division form must renumber exactly."""
    keys = [
        -(2**62) - 1,
        -(2**61),
        -12345,
        0,
        7,
        2**61 + 99,
        2**62,
        2**63 - 1,
    ]
    d = spark.createDataFrame([(k,) for k in keys], "k BIGINT")
    got = {r["k"]: r["idx"] for r in dense_renumber(d, "k", n_buckets=8).collect()}
    assert got == {k: i for i, k in enumerate(sorted(keys))}


def test_duplicate_keys_raise(spark):
    """ADVICE r8: the docstring promises uniqueness as a contract —
    enforce it in the stats pass instead of silently numbering with an
    arbitrary tie order."""
    import pytest
    from pyspark.sql import functions as F

    from batch_processing_etl_orchestration_spark.operators.renumber import (
        dense_renumber,
    )

    df = spark.createDataFrame([(1,), (2,), (2,), (5,)], "k LONG")
    with pytest.raises(ValueError, match="duplicate"):
        dense_renumber(df, "k").collect()
