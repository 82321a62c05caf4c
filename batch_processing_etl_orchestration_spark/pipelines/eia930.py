"""EIA-930 hourly electricity pipeline, Spark-first.

Re-expresses the transform stage of the reference's flagship DAG
(EIA930PipelineHourlyData.py): `cleaner` (:96-108), the three
`compute*` gold aggregates (:111-118, :121-129, :132-141), and the
snake_case load prep (:145-155). Raw input = bronze rows with the
F1 schema (FIXTURES.md): period/respondent-or-fromba/type/value as
strings — exactly what `pd.DataFrame(entry['response']['data'])`
produced.

Spark-first notes:
- The positional trim at the 2-days-ago boundary (:102, P10) becomes
  a value predicate on the parsed timestamp (pushdown-friendly,
  partition-pruning at scale).
- The `isin` BA filter (:104-106, J1) becomes a broadcast LEFT SEMI
  join against the dimension.
- pivots (A4/A5) use an explicit value list ('D','DF','NG','TI') so
  planning needs no extra distinct pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from batch_processing_etl_orchestration_spark.functions.cleaning import (
    HOURLY_FMT,
    coalesce_columns,
    snake_case_columns,
    try_double,
    try_ts,
)
from batch_processing_etl_orchestration_spark.functions.exact import exact_sum

RESPONSE_TYPES = ["D", "DF", "NG", "TI"]  # EIA930PipelineHourlyData.py:126,139


def clean_hourly(
    raw: DataFrame,
    ba_dim: DataFrame,
    cutoff_ts: str,
    ba_code_col: str = "ba_code",
) -> DataFrame:
    """`cleaner` (EIA930PipelineHourlyData.py:96-108): rename period→
    date (P2), coerce timestamp (P5) and value (P4), trim at the
    retention boundary (P10, value-based), keep only respondents in
    the BA dimension (J1 semi-join), normalize respondent/fromba
    schema drift (P14)."""
    df = raw.withColumnRenamed("period", "date")
    df = df.withColumn("date", try_ts("date", HOURLY_FMT))
    df = df.withColumn("value", try_double("value"))
    df = df.where(F.col("date") < F.lit(cutoff_ts).cast("timestamp_ntz"))
    df = coalesce_columns(df, "respondent", "respondent", "fromba")
    joined = df.join(
        F.broadcast(ba_dim),
        df["respondent"] == ba_dim[ba_code_col],
        "left_semi",
    )
    return joined


def net_generation_by_energy_source(clean: DataFrame) -> DataFrame:
    """A1 (EIA930PipelineHourlyData.py:111-118): national hourly net
    generation per fuel type — groupBy(date, fueltype).sum(value)."""
    return (
        clean.groupBy("date", "fueltype")
        .agg(exact_sum("value").alias("value"))
        .orderBy("date", "fueltype")
    )


def respondents_producing_and_generating(clean: DataFrame) -> DataFrame:
    """A2+A4+P12 (EIA930PipelineHourlyData.py:121-129): per-respondent
    pivot to wide D/DF/NG/TI columns, keep only respondents reporting
    all four."""
    wide = (
        clean.groupBy("date", "respondent", F.col("respondent-name").alias("respondent_name"))
        .pivot("type", RESPONSE_TYPES)
        .agg(exact_sum("value"))
    )
    return wide.na.drop("any").orderBy("date", "respondent")


def statistics_by_response_type(clean: DataFrame) -> DataFrame:
    """A3+A5 (EIA930PipelineHourlyData.py:132-141): national totals per
    response type, pivoted wide."""
    return (
        clean.groupBy("date").pivot("type", RESPONSE_TYPES).agg(exact_sum("value")).orderBy("date")
    )


def prepare_for_load(df: DataFrame) -> DataFrame:
    """P3 (EIA930PipelineHourlyData.py:145-155): snake_case every
    column before the warehouse sink."""
    return snake_case_columns(df)
