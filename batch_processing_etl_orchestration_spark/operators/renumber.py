"""Scale-safe dense renumbering: ROW_NUMBER() OVER (ORDER BY key)
without the single-task global sort.

The reference renumbers frames constantly (`reset_index(drop=True)`,
e.g. EIA930PipelineHourlyData.py:106,128); Spark's literal equivalent
— ``row_number().over(Window.orderBy(key))`` — collapses the whole
table into ONE window partition: one task sorts 100 TB. This is the
segmented-scan fix, same shape as operators/sessionize.py:

1. bucket rows by key range (``floor(key / bucket_width)`` — order-
   preserving across buckets by construction);
2. local ``row_number`` within each (bucket) window — width bounded
   by rows-per-bucket;
3. a bucket-count summary (rows = #buckets, metadata-sized) gets
   exclusive prefix offsets via a window over buckets, broadcast
   back: ``idx = offset + local``.

The result is EXACTLY the global ROW_NUMBER ordered by key (ties
impossible: key must be unique; enforced by the caller's semantics,
e.g. a primary key). Uniformity of keys bounds bucket width; a
pathological key distribution (all keys in one bucket) degrades to
the plain window — pick bucket_width accordingly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dense_renumber(
    df: DataFrame,
    key_col: str,
    idx_col: str = "idx",
    bucket_width: int = 4096,
    zero_based: bool = True,
) -> DataFrame:
    """All input columns plus ``idx_col`` = dense rank of ``key_col``
    ascending (0-based by default) — bit-equal to the single-window
    ROW_NUMBER, computed with bounded task width."""
    b = F.floor(F.col(key_col) / F.lit(int(bucket_width))).alias("__b")
    keyed = df.withColumn("__b", b)
    wb = Window.partitionBy("__b").orderBy(key_col)
    local = F.row_number().over(wb)

    counts = keyed.groupBy("__b").agg(F.count(F.lit(1)).alias("__n"))
    wo = Window.orderBy("__b").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "__b",
        F.coalesce(F.sum("__n").over(wo), F.lit(0)).alias("__off"),
    )
    base = 0 if zero_based else 1
    return (
        keyed.join(F.broadcast(offsets), "__b")
        .withColumn(
            idx_col, F.col("__off") + local + F.lit(base - 1)
        )
        .drop("__b", "__off")
    )
