"""Physical layout utilities: date-partitioned and bucketed writes —
the two levers that make 100 TB queries cheap (SCALE.md §storage).

The reference stores flat Postgres tables; every date-bounded query
scans everything. Here, facts land date-partitioned (partition pruning
turns the reference's bounded fetch horizons into near-free scans) and
optionally bucketed by their join key (shuffle-free fact-fact joins —
proven in tests/test_bucketing.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_date_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str,
    mode: str = "overwrite",
    grain: str = "day",
) -> None:
    """Write parquet partitioned by a date column derived from ts_col.
    Readers filtering on `p_date` (or on ts_col ranges rewritten to
    p_date) scan only matching partitions."""
    out = df.withColumn("p_date", F.date_trunc(grain, F.col(ts_col)).cast("date"))
    out.write.mode(mode).partitionBy("p_date").parquet(path)


def read_date_partitioned(spark, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    mode: str = "overwrite",
) -> None:
    """Write a bucketed+sorted managed table; joins/aggregations on
    bucket_col against same-bucketed tables need no shuffle."""
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(table)
    )


def compact_parquet(
    spark,
    src_path: str,
    dst_path: str,
    target_rows_per_file: int,
    cluster_col: str | None = None,
) -> int:
    """Rewrite a fragmented parquet dataset into ~target-sized files,
    optionally range-clustered on cluster_col. Returns the number of
    output partitions.

    Small-file compaction is the steady-state maintenance job of any
    streaming/incremental 100 TB table: micro-batches and dynamic
    partition overwrites leave thousands of KB-sized files whose
    open/footer costs dominate scans. One pass: count, size the
    partition count, `repartitionByRange` (when clustering — gives
    each file a disjoint value range, so min/max footer stats prune
    like a coarse index) or round-robin `repartition`, and a
    maxRecordsPerFile cap as the safety net against skewed ranges.
    """
    df = spark.read.parquet(src_path)
    n = df.count()
    n_parts = max(1, -(-n // target_rows_per_file))
    out = (
        df.repartitionByRange(n_parts, cluster_col)
        if cluster_col
        else df.repartition(n_parts)
    )
    (
        out.write.mode("overwrite")
        .option("maxRecordsPerFile", target_rows_per_file)
        .parquet(dst_path)
    )
    return n_parts
