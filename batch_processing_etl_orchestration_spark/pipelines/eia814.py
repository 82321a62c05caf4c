"""EIA-814 monthly crude-oil imports pipeline, Spark-first.

Re-expresses the `cleaner` of EIA814PipelineMonthlyData.py:63-68:
union of pages (O6), rename period→date (P2), parse 'YYYY-MM' (P5)
and snap to month-end (P6), coerce quantity (P4), snake_case (P3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from batch_processing_etl_orchestration_spark.functions.cleaning import (
    MONTHLY_FMT,
    month_end,
    snake_case_columns,
    try_double,
    try_ts,
)


def clean_monthly(raw: DataFrame) -> DataFrame:
    """`cleaner` (EIA814PipelineMonthlyData.py:63-68): period 'YYYY-MM'
    → timestamp at last day of month; quantity coerced to double."""
    df = raw.withColumnRenamed("period", "date")
    df = df.withColumn("date", month_end(try_ts("date", MONTHLY_FMT)))
    if "quantity" in df.columns:
        df = df.withColumn("quantity", try_double("quantity"))
    return df


def prepare_for_load(df: DataFrame) -> DataFrame:
    """P3 (EIA814PipelineMonthlyData.py:71-80)."""
    return snake_case_columns(df)
