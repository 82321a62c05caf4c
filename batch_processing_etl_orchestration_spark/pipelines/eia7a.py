"""EIA-7A quarterly coal pipeline, Spark-first.

Re-expresses the `cleaner` of EIA7APipelineQuarterlyData.py:74-92:
union of paginated pages (O6), rename period→date (P2), dropna on
price (P11), numeric-validity filter (P4 variant, :81), quarterly
period parse (P5, 'YYYY-Qn'), the schema-dependent branch (:85-88):
imports/exports rows (have customsDistrictId) exclude the "Total"
district rollup (P8); shipment-receipt rows fill missing
mineCountyName (P13); then keep only the target quarter (P9).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from batch_processing_etl_orchestration_spark.functions.cleaning import (
    parse_quarter_period,
    snake_case_columns,
    try_double,
)


def union_pages(pages: list[DataFrame]) -> DataFrame:
    """O6 — pd.concat of paginated fetches
    (EIA7APipelineQuarterlyData.py:78); unionByName tolerates column
    order drift across pages."""
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), pages)


def clean_quarterly(raw: DataFrame, target_quarter: str) -> DataFrame:
    """`cleaner` (EIA7APipelineQuarterlyData.py:74-92).

    target_quarter: 'YYYY-Qn' string (the reference computes
    twoQuartersAgo at :51; here it is an explicit parameter —
    relative-date literals P7 are the caller's policy).
    """
    df = raw.withColumnRenamed("period", "date")
    df = df.na.drop(subset=["price"])  # P11 (:80)
    df = df.where(try_double("price").isNotNull())  # P4 validity filter (:81)
    df = df.withColumn("price", try_double("price"))
    df = df.withColumn("date", parse_quarter_period("date"))  # P5 (:82)
    if "customsDistrictId" in df.columns:  # branch (:85-88)
        df = df.where(F.col("customsDistrictDescription") != "Total")  # P8 (:86)
    else:
        df = df.na.fill({"mineCountyName": "Not Specified"})  # P13 (:88)
    # P9 (:90): temporal equality on the quarter
    df = df.where(df["date"] == parse_quarter_period(F.lit(target_quarter)))
    return df


def prepare_for_load(df: DataFrame) -> DataFrame:
    """P3 (EIA7APipelineQuarterlyData.py:95-104)."""
    return snake_case_columns(df)
