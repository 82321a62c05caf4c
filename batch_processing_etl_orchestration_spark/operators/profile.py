"""One-pass table profiling: per-column null counts, distinct counts,
min/max, and mean from a SINGLE aggregation over the data.

The reference inspects frames driver-side (``.info()`` / ad-hoc
``print`` in the DAG notebooks); profiling a 100 TB table that way —
or worse, one scan per column — is untenable. Here every column's
metrics are expressions in ONE ``df.agg(...)``: Spark computes all of
them in the same scan with map-side partial aggregation, and the
1-row result is exploded into a tidy (column, metric...) table
driver-free.

Distinct counts: ``approx_distinct=True`` (the 100 TB default) uses
HLL++ partials — still one scan, no expand. Exact mode uses
``countDistinct``; Spark plans multiple distinct aggregates with one
Expand (rows × #distinct-cols) — a single wide shuffle, fine at audit
scale, and the mode the DuckDB oracle can reproduce bit-for-bit.

Type handling keeps the output hash-stable across engines: numeric
min/max/mean stay DOUBLE (no string formatting of floats — engines
disagree on rendering, not on values), string min/max stay strings,
timestamps are formatted 'yyyy-MM-dd HH:mm:ss' (functions/exact.py
convention). Mean uses scaled-long exact sums so any parallelism
matches the single-threaded oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from batch_processing_etl_orchestration_spark.functions.exact import (
    SCALE,
    ts_str,
)

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)
_TEMPORAL = (T.DateType, T.TimestampType, T.TimestampNTZType)


def _metric_exprs(
    name: str, dtype: T.DataType, approx: bool, rsd: float, scale: int
) -> dict[str, Column]:
    c = F.col(name)
    n_nulls = F.sum(F.when(c.isNull(), 1).otherwise(0)).alias(f"{name}__nulls")
    n_distinct = (
        F.approx_count_distinct(name, rsd=rsd)
        if approx
        else F.countDistinct(name)
    ).alias(f"{name}__distinct")
    if isinstance(dtype, _NUMERIC):
        dc = c.cast("double")
        return {
            "nulls": n_nulls,
            "distinct": n_distinct,
            "min_num": F.min(dc).alias(f"{name}__min_num"),
            "max_num": F.max(dc).alias(f"{name}__max_num"),
            # exact order-insensitive mean (scaled-long; exact.py):
            # the scaled sum and count are exact integers in every
            # engine, and the two IEEE divisions (sum/n, then /scale)
            # are correctly rounded — bit-identical as long as the
            # oracle spells the SAME operation order (it does:
            # parity.py _profile_oracle_col). No grid snapping — the
            # r7 grid hedge quantized the metric for nothing (the
            # driver mismatch was the HUGEINT n_nulls column).
            "avg": (
                F.sum(F.round(dc * F.lit(scale)).cast("long"))
                / F.count(c)
                / F.lit(float(scale))
            ).alias(f"{name}__avg"),
        }
    if isinstance(dtype, _TEMPORAL):
        rendered = ts_str(c) if not isinstance(dtype, T.DateType) else c.cast("string")
    else:
        rendered = c.cast("string")
    return {
        "nulls": n_nulls,
        "distinct": n_distinct,
        "min_str": F.min(rendered).alias(f"{name}__min_str"),
        "max_str": F.max(rendered).alias(f"{name}__max_str"),
    }


def profile_table(
    df: DataFrame,
    cols: list[str] | None = None,
    approx_distinct: bool = False,
    rsd: float = 0.01,
    scale: int = SCALE,
) -> DataFrame:
    """Profile `cols` (default: all) in one aggregation.

    Returns one row per column:
      (column, n_rows, n_nulls, n_distinct,
       min_num, max_num, avg_value,   -- doubles, null for non-numeric
       min_str, max_str)              -- strings, null for numeric
    """
    names = cols or df.columns
    dtypes = dict(zip(df.schema.names, [f.dataType for f in df.schema.fields]))
    per_col = {n: _metric_exprs(n, dtypes[n], approx_distinct, rsd, scale) for n in names}

    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for exprs in per_col.values():
        aggs.extend(exprs.values())
    one = df.agg(*aggs)

    def _col_or_null(n: str, key: str, out: str, typ: str) -> Column:
        if key in per_col[n]:
            return F.col(f"{n}__{key}").alias(out)
        return F.lit(None).cast(typ).alias(out)

    structs = [
        F.struct(
            F.lit(n).alias("column"),
            F.col("__n_rows").alias("n_rows"),
            F.col(f"{n}__nulls").alias("n_nulls"),
            F.col(f"{n}__distinct").cast("long").alias("n_distinct"),
            _col_or_null(n, "min_num", "min_num", "double"),
            _col_or_null(n, "max_num", "max_num", "double"),
            _col_or_null(n, "avg", "avg_value", "double"),
            _col_or_null(n, "min_str", "min_str", "string"),
            _col_or_null(n, "max_str", "max_str", "string"),
        )
        for n in names
    ]
    return one.select(F.explode(F.array(*structs)).alias("p")).select("p.*")
