"""End-to-end replays of ALL FOUR reference DAGs as correctness
entries: EIA-930 hourly (batch + streaming), Open-Meteo weather,
EIA-7A quarterly coal, EIA-814 monthly crude oil.

The parity catalog checks each transform's PIECES (rename, coerce,
trim, semi-join, pivot — SURVEY §2.3/§2.5); these queries check the
WHOLE dataflow: bronze rows shaped like each DAG's raw payload
(FIXTURES.md F1/F2/F5/F6) derive deterministically from the driver
fixtures and run through the real pipeline code (pipelines/*.py — the
same functions pipelines/jobs.py lands in the warehouse); the gold
tables are oracle-checked against the identical dataflow in SQL.

Bronze derivation (identical in both engines so inputs match bit-wise):

- ``period``            strftime(ts, '%Y-%m-%dT%H')   — the raw hourly string
- ``respondent/fromba`` user_id as string, placed in ``fromba`` for every
                        5th event (schema drift → P14 coalesce)
- ``respondent-name``   'resp_' || user_id
- ``type``              every event fans out to ALL FOUR D/DF/NG/TI rows
                        (posexplode ×4) — the reference's respondents
                        report all four series per interval, so the A4
                        complete-respondent pivot is non-vacuous; the
                        dropna filter's selectivity comes from the
                        dirty-value rows below
- ``fueltype``          event_type
- ``value``             value · (1 + type_pos/4) as string (exact
                        power-of-two scale keeps doubles bit-exact and
                        the four pivot columns distinct); every 97th
                        event 'N/A' (dirty numerics → P4 null-on-error
                        coercion)

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
           t.type AS type,
           event_type AS fueltype,
           CASE WHEN event_id % 97 = 0 THEN 'N/A'
                ELSE CAST(value * (1.0 + t.pos * 0.25) AS VARCHAR) END AS value,
           CASE WHEN event_id % 5 = 0 THEN CAST(user_id AS VARCHAR) END
             AS fromba
    FROM events
    CROSS JOIN (VALUES ('D', 0), ('DF', 1), ('NG', 2), ('TI', 3))
      AS t(type, pos)
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
    """The bronze projection itself — per-row expressions plus a ×4
    typed fan-out (posexplode of the D/DF/NG/TI domain, mirroring the
    reference feed where every respondent reports all four series per
    interval), so it applies unchanged to a batch or a streaming
    events DataFrame. The per-type value scale 1 + pos/4 is a sum of
    powers of two, so the scaled double (and its shortest-round-trip
    string) stays bit-exact in both engines."""
    uid = F.col("user_id").cast("string")
    drift = F.col("event_id") % 5 == 0
    typed = ev.select(
        "event_id",
        "ts",
        "user_id",
        "event_type",
        "value",
        F.posexplode(
            F.array(F.lit("D"), F.lit("DF"), F.lit("NG"), F.lit("TI"))
        ).alias("pos", "type"),
    )
    scaled = F.col("value") * (F.lit(1.0) + F.col("pos") * F.lit(0.25))
    return typed.select(
        F.date_format("ts", "yyyy-MM-dd'T'HH").alias("period"),
        F.when(~drift, uid).alias("respondent"),
        F.concat(F.lit("resp_"), uid).alias("respondent-name"),
        "type",
        F.col("event_type").alias("fueltype"),
        F.when(F.col("event_id") % 97 == 0, F.lit("N/A"))
        .otherwise(scaled.cast("string"))
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


# ---------------------------------------------------------------------------
# Second DAG replay: Open-Meteo weather (S9 materialization → A6/A7 gold)
# ---------------------------------------------------------------------------

_WX_VARS = ["temperature", "wind", "precip"]
_WX_START_S = 1704067200  # 2024-01-01 00:00:00 UTC
_WX_HOURS = 24

# value formula shared by both engines: pure integer arithmetic cast to
# double — v(k, var_i, hour_idx) = ((k*7 + i*13 + idx) % 100)/10 + i
_SQL_WX = f"""
  coords AS (
    SELECT c_custkey AS k,
           'S' || CAST(c_custkey % 50 AS VARCHAR) AS state
    FROM customer WHERE c_custkey < 150
  ),
  ticks AS (
    SELECT k, state, unnest(range(0, {_WX_HOURS})) AS idx FROM coords
  ),
  weather AS (
    SELECT state,
           TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (idx) HOUR AS date,
           {", ".join(
               f"CAST((k*7 + {i}*13 + idx) % 100 AS DOUBLE)/10.0 + {i} AS {v}"
               for i, v in enumerate(_WX_VARS)
           )}
    FROM ticks
  )
"""


def _wx_responses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic F2-shaped Open-Meteo responses: one row per coordinate
    with the hourly time axis (start/end/interval unix seconds) and one
    float array per variable — derived deterministically from customer
    keys so the oracle can recompute every value in SQL."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") < 150)
    k = F.col("c_custkey")
    arrays = F.array(
        *[
            F.expr(
                f"transform(sequence(0, {_WX_HOURS - 1}), idx -> "
                f"CAST((c_custkey*7 + {i}*13 + idx) % 100 AS DOUBLE)/10.0 + {i})"
            )
            for i in range(len(_WX_VARS))
        ]
    )
    return c.select(
        (k * 0.5).alias("latitude"),
        (k * -0.25).alias("longitude"),
        F.lit(_WX_START_S).alias("start_s"),
        F.lit(_WX_START_S + _WX_HOURS * 3600).alias("end_s"),
        F.lit(3600).alias("interval_s"),
        arrays.alias("values"),
    )


def _wx_coords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The coordinate dimension (F3): same coordinate derivation, with
    the state label — 50 states × 3 coordinates, the reference's
    curatedCoordinates.csv shape."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") < 150)
    k = F.col("c_custkey")
    return c.select(
        F.concat(F.lit("S"), (k % 50).cast("string")).alias("State"),
        (k * 0.5).alias("Latitude"),
        (k * -0.25).alias("Longitude"),
    )


def _wx_gold(spark: SparkSession, sf_dir: str, computation: str) -> DataFrame:
    from batch_processing_etl_orchestration_spark.pipelines.openmeteo import (
        materialize_hourly,
        metrics_per_state_per_hour,
    )

    weather = materialize_hourly(_wx_responses(spark, sf_dir), _WX_VARS)
    gold = metrics_per_state_per_hour(
        weather, _wx_coords(spark, sf_dir), computation, _WX_VARS
    )
    return gold.select(
        ts_str("date").alias("date"), "state", *_WX_VARS
    )


def _sql_wx_avg(v: str) -> str:
    from batch_processing_etl_orchestration_spark.functions.exact import sql_exact_avg

    return f"{sql_exact_avg(v)} AS {v}"


def _sql_wx_std(v: str) -> str:
    from batch_processing_etl_orchestration_spark.functions.exact import sql_exact_std

    return f"{sql_exact_std(v)} AS {v}"


@register(
    "q_pipeline_openmeteo_means",
    oracle=f"""
    WITH {_SQL_WX}
    SELECT {sql_ts_str('date')} AS date, state,
           {", ".join(_sql_wx_avg(v) for v in _WX_VARS)}
    FROM weather
    GROUP BY 1, 2
    """,
    tags=("pipeline", "A6"),
)
def q_pipeline_openmeteo_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-DAG replay: synthetic per-coordinate responses →
    materialize_hourly (sequence+posexplode time axis,
    OpenMeteoWeatherPipelineHourlyData.py:60-83) → per-state hourly
    MEANS over each state's 3 coordinates (:86-107) — the gold table
    run_openmeteo_job lands as openmeteo_weather_means_per_hour."""
    return _wx_gold(spark, sf_dir, "mean")


@register(
    "q_pipeline_openmeteo_stds",
    oracle=f"""
    WITH {_SQL_WX}
    SELECT {sql_ts_str('date')} AS date, state,
           {", ".join(_sql_wx_std(v) for v in _WX_VARS)}
    FROM weather
    GROUP BY 1, 2
    """,
    tags=("pipeline", "A7"),
)
def q_pipeline_openmeteo_stds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-DAG replay, std variant: per-state hourly SAMPLE std
    (ddof=1 — pd.Series.std parity,
    OpenMeteoWeatherPipelineHourlyData.py:100) via exact_std's
    scaled-long formulation."""
    return _wx_gold(spark, sf_dir, "std")


# ---------------------------------------------------------------------------
# Third DAG replay: EIA-7A quarterly coal (union → cleaner branch → quarter)
# ---------------------------------------------------------------------------

_Q_TARGET = "1997-Q2"


@register(
    "q_pipeline_eia7a_quarterly",
    oracle=f"""
    WITH bronze AS (
      SELECT CAST(year(o_orderdate) AS VARCHAR) || '-Q'
               || CAST(quarter(o_orderdate) AS VARCHAR) AS period,
             CASE WHEN o_orderkey % 11 = 0 THEN NULL
                  WHEN o_orderkey % 13 = 0 THEN 'bad'
                  ELSE CAST(o_totalprice AS VARCHAR) END AS price,
             CASE WHEN o_orderkey % 17 = 0 THEN 'Total'
                  ELSE 'D' || CAST(o_orderkey % 5 AS VARCHAR) END
               AS customs_district_description,
             o_custkey AS country_id,
             date_trunc('quarter', o_orderdate) AS qstart
      FROM orders
    )
    SELECT {sql_ts_str('qstart')} AS date,
           country_id,
           customs_district_description,
           TRY_CAST(price AS DOUBLE) AS price
    FROM bronze
    WHERE price IS NOT NULL
      AND TRY_CAST(price AS DOUBLE) IS NOT NULL
      AND customs_district_description <> 'Total'
      AND qstart = TIMESTAMP '1997-04-01 00:00:00'
    """,
    tags=("pipeline", "P5", "P8", "P11"),
)
def q_pipeline_eia7a_quarterly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third-DAG replay: EIA-7A quarterly coal cleaner
    (EIA7APipelineQuarterlyData.py:74-92) — two bronze pages unioned
    (O6), dropna + numeric-validity on price (P11/P4), the custom
    'YYYY-Qn' quarter parse (P5), the imports-variant 'Total' district
    exclusion (P8), and the target-quarter equality (P9). The oracle
    reaches the same rows via date_trunc('quarter') directly — the
    string round trip must be semantically invisible."""
    from batch_processing_etl_orchestration_spark.pipelines.eia7a import (
        clean_quarterly,
        prepare_for_load,
        union_pages,
    )

    o = load_table(spark, sf_dir, "orders")
    key = F.col("o_orderkey")
    bronze = o.select(
        F.concat(
            F.year("o_orderdate").cast("string"),
            F.lit("-Q"),
            F.quarter("o_orderdate").cast("string"),
        ).alias("period"),
        F.when(key % 11 == 0, F.lit(None).cast("string"))
        .when(key % 13 == 0, F.lit("bad"))
        .otherwise(F.col("o_totalprice").cast("string"))
        .alias("price"),
        F.when(key % 17 == 0, F.lit("Total"))
        .otherwise(F.concat(F.lit("D"), (key % 5).cast("string")))
        .alias("customsDistrictDescription"),
        F.col("o_custkey").alias("country_id"),
        F.lit(1).alias("customsDistrictId"),  # imports variant → 'Total' branch
    )
    pages = [
        bronze.where(key % 2 == 0),
        bronze.where(key % 2 == 1),
    ]
    cleaned = prepare_for_load(clean_quarterly(union_pages(pages), _Q_TARGET))
    return cleaned.select(
        ts_str("date").alias("date"),
        "country_id",
        "customs_district_description",
        "price",
    )


# ---------------------------------------------------------------------------
# Fourth DAG replay: EIA-814 monthly crude oil (month-end snap cleaner)
# ---------------------------------------------------------------------------


@register(
    "q_pipeline_eia814_monthly",
    oracle=f"""
    SELECT {sql_ts_str("CAST(last_day(o_orderdate) AS TIMESTAMP)")} AS date,
           o_custkey % 25 AS origin_id,
           'G' || CAST(o_orderkey % 3 AS VARCHAR) AS grade_id,
           TRY_CAST(CASE WHEN o_orderkey % 19 = 0 THEN 'n/a'
                         ELSE CAST(o_totalprice AS VARCHAR) END AS DOUBLE)
             AS quantity
    FROM orders
    """,
    tags=("pipeline", "P5", "P6"),
)
def q_pipeline_eia814_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fourth-DAG replay: EIA-814 monthly crude-oil cleaner
    (EIA814PipelineMonthlyData.py:63-68) — 'YYYY-MM' period parse
    snapped to month-end (P5+P6) with dirty-quantity coercion (P4),
    through the real pipeline code. The oracle snaps the source date
    directly with last_day — the string round trip must be invisible."""
    from batch_processing_etl_orchestration_spark.pipelines.eia814 import (
        clean_monthly,
        prepare_for_load,
    )

    o = load_table(spark, sf_dir, "orders")
    key = F.col("o_orderkey")
    bronze = o.select(
        F.date_format("o_orderdate", "yyyy-MM").alias("period"),
        (F.col("o_custkey") % 25).alias("origin_id"),
        F.concat(F.lit("G"), (key % 3).cast("string")).alias("grade_id"),
        F.when(key % 19 == 0, F.lit("n/a"))
        .otherwise(F.col("o_totalprice").cast("string"))
        .alias("quantity"),
    )
    cleaned = prepare_for_load(clean_monthly(bronze))
    return cleaned.select(
        ts_str("date").alias("date"), "origin_id", "grade_id", "quantity"
    )
