"""Open-Meteo weather pipeline, Spark-first.

Re-expresses OpenMeteoWeatherPipelineHourlyData.py:
- S9 time-series materialization (:60-83): per-coordinate response
  (start/end/interval unix seconds + one float array per variable) →
  hourly rows. pandas date_range + numpy columns become
  sequence()+explode over arrays_zip — fully distributed, no driver
  loop over rows.
- A6/A7 per-state-per-hour mean/std (:86-107): the reference's
  fixed-stride positional grouping (W1/W2, index//3 and iloc[i::50])
  is replaced by an honest broadcast equi-join on (latitude,
  longitude) against the coordinate dimension (J2) followed by
  groupBy(date, state) — same numbers, key-based, scale-safe.
  std is sample std (ddof=1, :100 pd.Series.std) — exact_std.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from batch_processing_etl_orchestration_spark.functions.exact import exact_avg, exact_std
from batch_processing_etl_orchestration_spark.warehouse.catalog import WEATHER_VARS


def materialize_hourly(responses: DataFrame, variables: list[str] | None = None) -> DataFrame:
    """S9: responses(latitude, longitude, start_s, end_s, interval_s,
    values: array<array<double>> — one inner array per variable in
    order) → one row per (hour, coordinate) with a column per variable.

    The hourly axis is sequence(start, end-interval, interval) —
    pandas date_range(inclusive='left') semantics
    (OpenMeteoWeatherPipelineHourlyData.py:67-70).
    """
    variables = variables or WEATHER_VARS
    ticks = F.sequence(
        F.col("start_s").cast("long"),
        (F.col("end_s") - F.col("interval_s")).cast("long"),
        F.col("interval_s").cast("long"),
    )
    exploded = responses.select(
        "latitude",
        "longitude",
        "values",
        F.posexplode(ticks).alias("idx", "tick_s"),
    )
    date = F.expr(
        "timestampadd(SECOND, tick_s, TIMESTAMP_NTZ '1970-01-01 00:00:00')"
    ).alias("date")
    cols = [date, F.col("latitude"), F.col("longitude")] + [
        F.col("values")[i][F.col("idx")].alias(v) for i, v in enumerate(variables)
    ]
    return exploded.select(*cols)


def metrics_per_state_per_hour(
    weather: DataFrame,
    coords: DataFrame,
    computation: str,
    variables: list[str] | None = None,
) -> DataFrame:
    """A6/A7 (OpenMeteoWeatherPipelineHourlyData.py:86-107): per-state
    hourly mean or sample-std across that state's coordinate locations.

    `computation` ∈ {'mean','std'} mirrors the reference's dynamic
    getattr(pd.Series, computationType) dispatch (:100) as a table of
    Spark aggregate builders. coords(State, Latitude, Longitude) is the
    150-row dimension → broadcast join, zero fact shuffle for the join;
    the groupBy shuffles on (date, state) only.
    """
    variables = variables or WEATHER_VARS
    dispatch = {"mean": exact_avg, "std": exact_std}
    agg = dispatch[computation]
    labeled = weather.join(
        F.broadcast(coords),
        (weather["latitude"] == coords["Latitude"])
        & (weather["longitude"] == coords["Longitude"]),
        "inner",
    ).select(weather["*"], coords["State"].alias("state"))
    return (
        labeled.groupBy("date", "state")
        .agg(*[agg(v).alias(v) for v in variables])
        .orderBy("date", "state")
    )
