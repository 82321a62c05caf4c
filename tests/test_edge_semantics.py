"""Edge semantics of the round-3 composite queries, on purpose-built
fixtures: funnel milestone ordering must be strict (a click BEFORE the
first view does not convert), and canonical-survivor selection must
tiebreak deterministically when cluster members tie on length."""

from __future__ import annotations

from batch_processing_etl_orchestration_spark.plans.analytics import q_events_funnel
from batch_processing_etl_orchestration_spark.plans.northstar import (
    q_dedup_keep_canonical,
)

HOUR_NS = 3_600 * 1_000_000_000


def _write_events(spark, path, rows):
    spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts long"
    ).write.parquet(f"{path}/events.parquet")


def test_funnel_strict_milestone_ordering(spark, tmp_path):
    sf = str(tmp_path)
    _write_events(
        spark,
        sf,
        [
            # user 1: click BEFORE first view -> that click cannot count;
            # the purchase then has no qualifying click -> not converted
            (1, 1, "click", 0 * HOUR_NS),
            (2, 1, "view", 1 * HOUR_NS),
            (3, 1, "purchase", 2 * HOUR_NS),
            # user 2: proper view -> click -> purchase chain
            (4, 2, "view", 0 * HOUR_NS),
            (5, 2, "click", 1 * HOUR_NS),
            (6, 2, "purchase", 2 * HOUR_NS),
            # user 3: clicks only, never views -> absent from the funnel
            (7, 3, "click", 0 * HOUR_NS),
        ],
    )
    out = {r["user_id"]: r for r in q_events_funnel(spark, sf).collect()}
    assert set(out) == {1, 2}
    assert out[1]["first_click"] is None
    assert out[1]["first_purchase"] is None
    assert not out[1]["converted"]
    assert out[2]["converted"]
    assert out[2]["first_purchase"] is not None


def test_keep_canonical_length_tiebreak(spark, tmp_path):
    sf = str(tmp_path)
    dup = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    uniq = "one two three four five six seven eight nine ten"
    spark.createDataFrame(
        [
            (1, dup, "en", "s", len(dup)),
            (2, dup, "en", "s", len(dup)),  # identical length -> doc_id tiebreak
            (3, uniq, "en", "s", len(uniq)),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{sf}/documents.parquet")
    rows = {r["comp_id"]: r for r in q_dedup_keep_canonical(spark, sf).collect()}
    assert rows[1]["keep_doc_id"] == 1 and rows[1]["cluster_size"] == 2
    assert rows[3]["keep_doc_id"] == 3 and rows[3]["cluster_size"] == 1


def test_grouped_map_ops_survive_hot_key_skew(spark):
    """One user with 50k events among 100 ordinary users: the
    streaming sessionization walk and the stateful streaming twin
    must complete and agree — 'skewed users cost one long task, not a
    reshuffle', pinned on data that would break an assumption of
    balanced groups. Exercises the PRODUCTION walk
    (capped_session_summaries), including with tiny Arrow batches so
    the hot user's history crosses thousands of batch boundaries."""
    import pandas as pd
    from pyspark.sql import functions as F

    from batch_processing_etl_orchestration_spark.plans.analytics import (
        capped_session_summaries,
    )
    from batch_processing_etl_orchestration_spark.streaming.stateful import (
        stateful_capped_sessions,
    )

    # hot user 0: 50k events 90s apart (gap never binds, cap splits
    # every 960 events); users 1..100: 5 events each, 7h apart (every
    # gap binds)
    hot = pd.DataFrame(
        {
            "user_id": 0,
            "event_id": range(50_000),
            "ts_us": [i * 90_000_000 for i in range(50_000)],
        }
    )
    cold = pd.DataFrame(
        [
            (u, 100_000 + u * 10 + i, (u * 10 + i) * 7 * 3600 * 1_000_000)
            for u in range(1, 101)
            for i in range(5)
        ],
        columns=["user_id", "event_id", "ts_us"],
    )
    pdf = pd.concat([hot, cold])
    df = spark.createDataFrame(pdf).withColumn(
        "ts", F.timestamp_micros(F.col("ts_us"))
    )

    batch = {
        tuple(r)
        for r in capped_session_summaries(
            df.select("user_id", "event_id", "ts")
        ).collect()
    }
    # batch-boundary invariance: the same walk over ~64-row Arrow
    # batches (the hot user spans ~780 of them) must be bit-identical
    old_batchsz = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "64")
        tiny = {
            tuple(r)
            for r in capped_session_summaries(
                df.select("user_id", "event_id", "ts")
            ).collect()
        }
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old_batchsz)
    assert tiny == batch
    hot_row = [r for r in batch if r[0] == 0][0]
    # 50k events at 90s spacing: a session holds 961 events (the
    # 962nd is >24h past the session start) → ceil(50000/961) = 53
    # sessions, 52 opened by the cap
    assert hot_row[1] == 53 and hot_row[3] == 52 and hot_row[2] == 50_000
    cold_rows = [r for r in batch if r[0] != 0]
    assert all(r[1] == 5 and r[3] == 0 for r in cold_rows)  # every gap binds

    # streaming twin agrees on the same skewed data (single batch)
    import tempfile

    d = tempfile.mkdtemp()
    pdf.to_parquet(f"{d}/0.parquet", index=False)
    schema = spark.read.parquet(d).schema
    stream = (
        spark.readStream.schema(schema)
        .parquet(d)
        .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
        .select("user_id", "event_id", "ts")
    )
    from batch_processing_etl_orchestration_spark.streaming.events import (
        run_stream_to_table,
    )

    streamed = {
        tuple(r)
        for r in run_stream_to_table(
            stateful_capped_sessions(stream),
            spark,
            output_mode="update",
            update_keys=["user_id"],
        ).collect()
    }
    assert streamed == batch


def test_sessionize_degenerate_million_event_key(spark):
    """VERDICT r5 #6: one bot key with 10⁶ events must stream through
    the session walk — under the old grouped map this materialized the
    whole history in one pandas frame; the streaming walk carries one
    open-session tuple. Events 90s apart: the 24h cap holds exactly
    961 events per session (961st offset = 960*90s = 24h, inclusive),
    so ceil(1e6/961) = 1041 sessions, 1040 opened by the cap."""
    from pyspark.sql import functions as F

    from batch_processing_etl_orchestration_spark.plans.analytics import (
        capped_session_summaries,
    )

    ev = spark.range(1_000_000).select(
        F.lit(0).cast("long").alias("user_id"),
        F.col("id").alias("event_id"),
        F.timestamp_micros(F.col("id") * 90_000_000).alias("ts"),
    )
    rows = capped_session_summaries(ev).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["n_sessions"], r["n_events"], r["n_cap_splits"]) == (1041, 1_000_000, 1040)
    assert r["longest_dur_us"] == 960 * 90_000_000


def test_interval_islands_running_max_not_lag(spark, tmp_path):
    """A long early interval must swallow later short ones: the island
    break compares against the RUNNING MAX of ends — a lag-based port
    (previous ROW's end) would falsely split after a swallowed short
    interval. Durations are 60 + event_id % 600 seconds."""
    from batch_processing_etl_orchestration_spark.plans.analytics import (
        q_interval_islands,
    )

    sf = str(tmp_path)
    S = 1_000_000_000  # seconds -> ns
    _write_events(
        spark,
        sf,
        [
            # user 1: [0,600) swallows [100,160) and [300,361) — a lag
            # rule would split at 300 > 160; then a true gap to [700,762)
            (540, 1, "view", 0 * S),    # dur 600
            (600, 1, "view", 100 * S),  # dur 60, swallowed
            (601, 1, "view", 300 * S),  # dur 61, swallowed (lag trap)
            (602, 1, "view", 700 * S),  # dur 62, new island, gap 100
            # user 2: single event -> one island, zero gap
            (610, 2, "view", 0 * S),    # dur 70
        ],
    )
    rows = {r["user_id"]: r for r in q_interval_islands(spark, sf).collect()}
    u1 = rows[1]
    assert u1["n_islands"] == 2
    assert u1["n_events"] == 4
    assert u1["covered_s"] == 600 + 62
    assert u1["max_island_s"] == 600
    assert u1["max_gap_s"] == 100
    u2 = rows[2]
    assert (u2["n_islands"], u2["covered_s"], u2["max_gap_s"]) == (1, 70, 0)


def test_tvd_one_sided_type_is_total_drift(spark, tmp_path):
    """A type present in only one half of the timeline is maximal
    drift: tvd must be exactly 1.0, not NULL/inf from a zero
    denominator (Spark NULL-on-/0 vs DuckDB IEEE inf is an
    engine-parity trap)."""
    from batch_processing_etl_orchestration_spark.plans.analytics import (
        q_value_drift_tvd,
    )

    sf = str(tmp_path)
    H = 3_600 * 1_000_000_000
    spark.createDataFrame(
        [
            # 'old' spans both halves; 'new' launches late (2nd half only)
            (1, 1, "old", 0 * H, 10.0),
            (2, 1, "old", 10 * H, 10.0),
            (3, 1, "new", 9 * H, 10.0),
            (4, 1, "new", 10 * H, 99.0),
        ],
        "event_id long, user_id long, event_type string, ts long, value double",
    ).write.parquet(f"{sf}/events.parquet")
    rows = {r["event_type"]: r for r in q_value_drift_tvd(spark, sf).collect()}
    assert rows["new"]["n_a"] == 0
    assert rows["new"]["tvd"] == 1.0
    assert rows["old"]["tvd"] == 0.0


def test_cusum_localizes_level_shift(spark, tmp_path):
    """A clean mean shift must put the upward CUSUM peak at the LAST
    day of the shifted regime and leave the pre-shift days' downward
    peak at the regime boundary — the localization property that
    distinguishes CUSUM from a smoother."""
    from batch_processing_etl_orchestration_spark.plans.analytics import (
        q_cusum_changepoint,
    )

    sf = str(tmp_path)
    D = 24 * 3_600 * 1_000_000_000
    rows = []
    # 10 days: value 10/day for days 0-4, then 30/day for days 5-9
    for day in range(10):
        rows.append(
            (day, 1, "shift", day * D, 10.0 if day < 5 else 30.0)
        )
    spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, ts long, value double",
    ).write.parquet(f"{sf}/events.parquet")
    r = q_cusum_changepoint(spark, sf).collect()[0]
    assert r["n_days"] == 10
    # mean = 20; post-shift days add +10 each (scaled by n*100):
    # S+ climbs from day 5 and peaks on the final day
    assert str(r["day_up"]) == "1970-01-10"
    assert r["max_up_norm"] == 50.0  # 5 days x +10 mean deviation
    # S- accumulates -10 per pre-shift day, peaking at the boundary
    assert str(r["day_dn"]) == "1970-01-05"
    assert r["max_dn_norm"] == 50.0


DAY_NS = 24 * 3_600 * 1_000_000_000


def test_survival_km_censoring_convention(spark, tmp_path):
    """Censored users stay in n_risk at their censoring duration
    (censoring happens AFTER events at t), and the survival curve is
    the floored scaled-integer product."""
    from batch_processing_etl_orchestration_spark.plans.analytics import q_survival_km

    sf = str(tmp_path)
    _write_events(
        spark,
        sf,
        [
            # users 1, 2: purchase at day 2
            (1, 1, "view", 0 * DAY_NS),
            (2, 1, "purchase", 2 * DAY_NS),
            (3, 2, "view", 0 * DAY_NS),
            (4, 2, "purchase", 2 * DAY_NS),
            # user 3: never purchases, censored at the watermark (day 4)
            (5, 3, "view", 0 * DAY_NS),
            (6, 3, "click", 1 * DAY_NS),
            # user 4: purchase at day 4 (also sets the watermark)
            (7, 4, "view", 0 * DAY_NS),
            (8, 4, "purchase", 4 * DAY_NS),
        ],
    )
    rows = {r["duration_days"]: r for r in q_survival_km(spark, sf).collect()}
    assert set(rows) == {2, 4}
    # t=2: all four users at risk, two purchases
    assert rows[2]["n_risk"] == 4 and rows[2]["n_events"] == 2
    assert rows[2]["hazard_ppm"] == 500_000
    assert rows[2]["survival_ppm"] == 500_000
    # t=4: user 3 (censored at 4) still at risk alongside user 4
    assert rows[4]["n_risk"] == 2 and rows[4]["n_events"] == 1
    assert rows[4]["hazard_ppm"] == 500_000
    assert rows[4]["survival_ppm"] == 250_000  # (500000 * 1) // 2


def test_seasonal_dow_zero_fill_and_interior_windows(spark, tmp_path):
    """A day with no events contributes v=0 to its neighbors' moving
    averages (calendar-correct trend), edge days without a full 7-day
    window are excluded, and dow 0 is Monday."""
    from batch_processing_etl_orchestration_spark.plans.analytics import (
        q_seasonal_dow_decompose,
    )

    sf = str(tmp_path)
    # 2024-01-01 (a Monday) + d days; day 7 has NO events.
    base_day = 19723  # 2024-01-01 in epoch days
    rows = [
        (d, 1, "view", (base_day * DAY_NS) + d * DAY_NS, 100.0 * d)
        for d in range(15)
        if d != 7
    ]
    spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts long, value double"
    ).write.parquet(f"{sf}/events.parquet")

    # Integer reference on the same centi-unit grid.
    v = [10_000 * d if d != 7 else 0 for d in range(15)]
    expect = {}
    for d in range(3, 12):  # interior days only
        det7 = 7 * v[d] - sum(v[d - 3 : d + 4])
        dow = d % 7  # day 0 is a Monday
        n, s = expect.get(dow, (0, 0))
        expect[dow] = (n + 1, s + det7)

    out = {r["dow"]: r for r in q_seasonal_dow_decompose(spark, sf).collect()}
    assert set(out) == set(expect)
    for dow, (n, s) in expect.items():
        assert out[dow]["n_days"] == n
        assert out[dow]["sum_detrended_c7"] == s
        assert out[dow]["seasonal_value"] == s / (700.0 * n)
