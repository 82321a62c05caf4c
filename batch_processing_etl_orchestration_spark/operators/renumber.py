"""Scale-safe dense renumbering: ROW_NUMBER() OVER (ORDER BY key)
without the single-task global sort.

The reference renumbers frames constantly (`reset_index(drop=True)`,
e.g. EIA930PipelineHourlyData.py:106,128); Spark's literal equivalent
— ``row_number().over(Window.orderBy(key))`` — collapses the whole
table into ONE window partition: one task sorts 100 TB. This is the
segmented-scan fix, same shape as operators/sessionize.py:

1. one cheap column-pruned min/max pass sizes the buckets:
   ``width = ceil(span / n_buckets)`` — so the bucket DOMAIN is
   bounded by ``n_buckets`` for ANY key distribution (dense ids,
   snowflake/hashed 64-bit ids, huge gaps alike; a fixed width would
   make the offset table data-sized on sparse keys);
2. local ``row_number`` within each bucket window — width bounded by
   rows-per-bucket (uniform-ish keys; adversarially clustered keys
   degrade toward the plain window, which the docstring owns);
3. a bucket-count summary (≤ n_buckets rows, metadata-sized) gets
   exclusive prefix offsets via a window over buckets and broadcasts
   back: ``idx = offset + local``.

The result is EXACTLY the global ROW_NUMBER ordered by key (the
bucketing is order-preserving; ties impossible — key uniqueness is
VALIDATED in the stats pass and duplicates RAISE, ADVICE r8). NULL
keys RAISE too (detected in the
same stats pass) rather than silently dropping rows — the global
ROW_NUMBER would number them, and a segmented scan cannot place them
deterministically without a policy, so the caller must filter or fill
first. Non-numeric key columns are
rejected at plan time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


def dense_renumber(
    df: DataFrame,
    key_col: str,
    idx_col: str = "idx",
    n_buckets: int = 65536,
    zero_based: bool = True,
) -> DataFrame:
    """All input columns plus ``idx_col`` = dense rank of ``key_col``
    ascending (0-based by default) — bit-equal to the single-window
    ROW_NUMBER, computed with bounded task width and a ≤ n_buckets
    offset table regardless of key sparsity."""
    dtype = next(
        (f.dataType for f in df.schema.fields if f.name == key_col), None
    )
    if not isinstance(dtype, _NUMERIC):
        raise TypeError(
            f"dense_renumber: key column {key_col!r} must be an integer "
            f"type, got {dtype}; string/decimal keys need an explicit "
            "surrogate (e.g. xxhash64) chosen by the caller"
        )
    # count_distinct enforces the uniqueness CONTRACT the numbering
    # relies on (ADVICE r8: duplicates would silently yield an
    # arbitrary tie order). Exact, not approx — an HLL estimate could
    # false-positive and reject a valid key. Cost: map-side partial
    # distinct + one shuffle of distinct keys, on the stats scan the
    # renumber already pays.
    stats = df.agg(
        F.min(key_col).alias("lo"),
        F.max(key_col).alias("hi"),
        F.count(F.lit(1)).alias("n_rows"),
        F.count(key_col).alias("n_keys"),
        F.count_distinct(F.col(key_col)).alias("n_distinct"),
    ).collect()[0]
    if stats["n_rows"] != stats["n_keys"]:
        raise ValueError(
            f"dense_renumber: {stats['n_rows'] - stats['n_keys']} NULL "
            f"values in key column {key_col!r} — a segmented renumber "
            "cannot place them; filter or fill nulls first"
        )
    if stats["n_distinct"] != stats["n_keys"]:
        raise ValueError(
            f"dense_renumber: key column {key_col!r} has "
            f"{stats['n_keys'] - stats['n_distinct']} duplicate values "
            "— the dense index is only deterministic over a unique "
            "key; deduplicate or choose a composite surrogate first"
        )
    if stats["n_rows"] == 0:
        return df.withColumn(idx_col, F.lit(None).cast("long"))
    span = int(stats["hi"]) - int(stats["lo"]) + 1  # exact in Python
    width = max(1, -(-span // int(n_buckets)))  # ceil
    # bucket = floor(key / width) with NO lo-subtraction: key - lo
    # overflows int64 when the key range spans more than 2^63 (hashed/
    # snowflake ids — exactly the keys the adaptive width exists for)
    # and non-ANSI mode would wrap it silently. floor over the double
    # division is monotone non-decreasing in key (IEEE), which is all
    # the bucketing needs — offsets come from the ACTUAL bucket ids,
    # so alignment to lo is irrelevant, and the bucket domain stays
    # ≤ n_buckets + 1.
    b = F.floor(F.col(key_col) / F.lit(width)).alias("__b")
    keyed = df.withColumn("__b", b)
    wb = Window.partitionBy("__b").orderBy(key_col)
    local = F.row_number().over(wb)

    counts = keyed.groupBy("__b").agg(F.count(F.lit(1)).alias("__n"))
    # summary window: ≤ n_buckets rows by construction — metadata-sized
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
