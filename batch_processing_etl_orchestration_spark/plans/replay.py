"""End-to-end replay of the reference's flagship DAG as correctness
entries.

The parity catalog checks the EIA-930 transform's PIECES (rename,
coerce, trim, semi-join, pivot — SURVEY §2.3/§2.5); these queries check
the WHOLE dataflow: F1-shaped bronze rows (FIXTURES.md) derived
deterministically from the ``events`` fixture are pushed through the
real pipeline code (pipelines/eia930.py — the same functions
pipelines/jobs.py lands in the warehouse) and the resulting gold tables
are oracle-checked against the identical dataflow written in SQL.

Bronze derivation (identical in both engines so inputs match bit-wise):

- ``period``            strftime(ts, '%Y-%m-%dT%H')   — the raw hourly string
- ``respondent/fromba`` user_id as string, placed in ``fromba`` for every
                        5th event (schema drift → P14 coalesce)
- ``respondent-name``   'resp_' || user_id
- ``type``              event_id%4 → D/DF/NG/TI        — the pivot domain
- ``fueltype``          event_type
- ``value``             value as string; every 97th event 'N/A' (dirty
                        numerics → P4 null-on-error coercion)

The BA dimension is ``nation`` (FIXTURES.md F4: 25 codes, so most
user_ids fail the semi-join — real selectivity). The retention cutoff
trims the last 2 days of the fixture's range, mirroring the
keep-through-2-days-back boundary (EIA930PipelineHourlyData.py:102).

Scale: identical posture to the underlying pieces — the bronze
derivation is per-row projection (no shuffle), cleaning is
filter+broadcast-semi-join (one scan), each gold aggregate is one
partial+final hash agg on bounded keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from batch_processing_etl_orchestration_spark.functions.exact import (
    sql_exact_sum,
    sql_ts_str,
    ts_str,
)
from batch_processing_etl_orchestration_spark.pipelines.eia930 import (
    clean_hourly,
    net_generation_by_energy_source,
    prepare_for_load,
    respondents_producing_and_generating,
    statistics_by_response_type,
)
from batch_processing_etl_orchestration_spark.plans.registry import register
from batch_processing_etl_orchestration_spark.tables import load_table

CUTOFF = "2024-01-28 00:00:00"  # fixture range is Jan 2024; trim last ~2 days

# DuckDB twin of the bronze derivation + cleaner (shared by all three
# gold oracles). NOTE each engine round-trips value through ITS OWN
# double→string→double path; shortest-roundtrip reprs make both recover
# the original bits, so the cleaned inputs agree exactly.
_SQL_CLEAN = f"""
  bronze AS (
    SELECT strftime(ts, '%Y-%m-%dT%H') AS period,
           CASE WHEN event_id % 5 <> 0 THEN CAST(user_id AS VARCHAR) END
             AS respondent,
           'resp_' || CAST(user_id AS VARCHAR) AS respondent_name,
           CASE event_id % 4 WHEN 0 THEN 'D' WHEN 1 THEN 'DF'
                             WHEN 2 THEN 'NG' ELSE 'TI' END AS type,
           event_type AS fueltype,
           CASE WHEN event_id % 97 = 0 THEN 'N/A'
                ELSE CAST(value AS VARCHAR) END AS value,
           CASE WHEN event_id % 5 = 0 THEN CAST(user_id AS VARCHAR) END
             AS fromba
    FROM events
  ),
  clean AS (
    SELECT try_strptime(period, '%Y-%m-%dT%H') AS date,
           COALESCE(respondent, fromba) AS respondent,
           respondent_name,
           type,
           fueltype,
           TRY_CAST(value AS DOUBLE) AS value
    FROM bronze
    WHERE try_strptime(period, '%Y-%m-%dT%H') < TIMESTAMP '{CUTOFF}'
      AND COALESCE(respondent, fromba) IN
          (SELECT CAST(n_nationkey AS VARCHAR) FROM nation)
  )
"""


def _bronze(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1-shaped raw rows (all-string payload columns, FIXTURES.md F1)
    derived deterministically from the events fixture."""
    return _bronze_cols(load_table(spark, sf_dir, "events"))


def _bronze_cols(ev: DataFrame) -> DataFrame:
    """The bronze projection itself — pure per-row expressions, so it
    applies unchanged to a batch or a streaming events DataFrame."""
    uid = F.col("user_id").cast("string")
    drift = F.col("event_id") % 5 == 0
    return ev.select(
        F.date_format("ts", "yyyy-MM-dd'T'HH").alias("period"),
        F.when(~drift, uid).alias("respondent"),
        F.concat(F.lit("resp_"), uid).alias("respondent-name"),
        F.element_at(
            F.array(F.lit("D"), F.lit("DF"), F.lit("NG"), F.lit("TI")),
            (F.col("event_id") % 4 + 1).cast("int"),
        ).alias("type"),
        F.col("event_type").alias("fueltype"),
        F.when(F.col("event_id") % 97 == 0, F.lit("N/A"))
        .otherwise(F.col("value").cast("string"))
        .alias("value"),
        F.when(drift, uid).alias("fromba"),
    )


def _clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    ba_dim = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("string").alias("ba_code")
    )
    return clean_hourly(_bronze(spark, sf_dir), ba_dim, CUTOFF)


@register(
    "q_pipeline_eia930_net_gen",
    oracle=f"""
    WITH {_SQL_CLEAN}
    SELECT {sql_ts_str('date')} AS date,
           fueltype,
           {sql_exact_sum('value')} AS value
    FROM clean
    GROUP BY 1, 2
    """,
    tags=("pipeline", "A1"),
)
def q_pipeline_eia930_net_gen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-DAG replay #1: bronze → cleaner → hourly net generation by
    fuel type (EIA930PipelineHourlyData.py:96-118) — the gold table
    run_eia930_job lands as eia930_hourly_net_generation_by_energy_source."""
    gold = prepare_for_load(net_generation_by_energy_source(_clean(spark, sf_dir)))
    return gold.select(ts_str("date").alias("date"), "fueltype", "value")


def _sql_pivot_col(t: str) -> str:
    return sql_exact_sum(f"CASE WHEN type = '{t}' THEN value END")


@register(
    "q_pipeline_eia930_pivot",
    oracle=f"""
    WITH {_SQL_CLEAN}
    SELECT * FROM (
      SELECT {sql_ts_str('date')} AS date,
             respondent,
             respondent_name,
             {_sql_pivot_col('D')} AS d,
             {_sql_pivot_col('DF')} AS df,
             {_sql_pivot_col('NG')} AS ng,
             {_sql_pivot_col('TI')} AS ti
      FROM clean
      GROUP BY 1, 2, 3
    )
    WHERE d IS NOT NULL AND df IS NOT NULL
      AND ng IS NOT NULL AND ti IS NOT NULL
    """,
    tags=("pipeline", "A4"),
)
def q_pipeline_eia930_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-DAG replay #2: bronze → cleaner → per-respondent wide
    D/DF/NG/TI pivot keeping complete respondents only
    (EIA930PipelineHourlyData.py:121-129) — gold table
    eia930_hourly_respondents_producing_and_generating."""
    gold = prepare_for_load(
        respondents_producing_and_generating(_clean(spark, sf_dir))
    )
    return gold.select(
        ts_str("date").alias("date"),
        "respondent",
        "respondent_name",
        "d",
        "df",
        "ng",
        "ti",
    )


@register(
    "q_pipeline_eia930_stats",
    oracle=f"""
    WITH {_SQL_CLEAN}
    SELECT {sql_ts_str('date')} AS date,
           {_sql_pivot_col('D')} AS d,
           {_sql_pivot_col('DF')} AS df,
           {_sql_pivot_col('NG')} AS ng,
           {_sql_pivot_col('TI')} AS ti
    FROM clean
    GROUP BY 1
    """,
    tags=("pipeline", "A5"),
)
def q_pipeline_eia930_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-DAG replay #3: bronze → cleaner → national per-hour totals
    pivoted by response type (EIA930PipelineHourlyData.py:132-141) —
    gold table eia930_hourly_statistics_by_response_type."""
    gold = prepare_for_load(statistics_by_response_type(_clean(spark, sf_dir)))
    return gold.select(
        ts_str("date").alias("date"), "d", "df", "ng", "ti"
    )


@register(
    "q_pipeline_eia930_stream",
    oracle=f"""
    WITH {_SQL_CLEAN}
    SELECT {sql_ts_str('date')} AS date,
           fueltype,
           {sql_exact_sum('value')} AS value
    FROM clean
    GROUP BY 1, 2
    """,
    tags=("pipeline", "streaming"),
)
def q_pipeline_eia930_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full-DAG replay executed as a STRUCTURED STREAMING job: the
    bronze projection and cleaner run on a streaming events read
    (stream-static broadcast semi-join against the BA dim), the gold
    aggregate runs in complete mode, availableNow drains it — the
    incremental-batch form of the reference's cron'd DAG. Over the
    static fixture this must equal the batch replay, which the
    (identical) oracle asserts.

    Scale: the only stateful operator is the bounded-key hourly
    aggregate; the semi-join re-broadcasts the 25-row dim per
    micro-batch, never shuffling the stream."""
    from batch_processing_etl_orchestration_spark.functions.exact import exact_sum
    from batch_processing_etl_orchestration_spark.streaming.events import (
        read_events_stream,
        run_stream_to_table,
    )

    stream = read_events_stream(spark, sf_dir)
    ba_dim = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("string").alias("ba_code")
    )
    clean = clean_hourly(_bronze_cols(stream), ba_dim, CUTOFF)
    agg = clean.groupBy("date", "fueltype").agg(exact_sum("value").alias("value"))
    result = run_stream_to_table(agg, spark)
    return result.select(ts_str("date").alias("date"), "fueltype", "value")
