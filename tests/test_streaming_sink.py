"""Streaming foreachBatch merge sink: re-running the whole stream (new
checkpoint, same source) must not duplicate warehouse rows — the
exactly-once posture the reference lacks."""

from __future__ import annotations

import pytest

from batch_processing_etl_orchestration_spark.streaming.events import read_events_stream
from batch_processing_etl_orchestration_spark.streaming.sink import stream_merge_to_table
from batch_processing_etl_orchestration_spark.warehouse.catalog import create_database, create_table

DB = "stream_sink_test"
TABLE = "events_landed"


@pytest.fixture(scope="module", autouse=True)
def scratch(spark):
    create_database(spark, DB)
    create_table(
        spark,
        TABLE,
        {
            "event_id": "BIGINT",
            "ts": "TIMESTAMP",
            "user_id": "BIGINT",
            "event_type": "STRING",
            "value": "DOUBLE",
            "props": "STRING",
        },
        DB,
    )
    yield
    spark.sql(f"DROP TABLE IF EXISTS {DB}.{TABLE}")
    spark.sql(f"DROP DATABASE IF EXISTS {DB}")


def test_stream_merge_rerun_no_duplicates(spark):
    from batch_processing_etl_orchestration_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    expected = load_table(spark, sf, "events").count()

    stream_merge_to_table(read_events_stream(spark, sf), TABLE, ["event_id"], DB)
    n1 = spark.table(f"{DB}.{TABLE}").count()
    assert n1 == expected

    # fresh checkpoint → the source replays from scratch; the keyed
    # merge must swallow the duplicates
    stream_merge_to_table(read_events_stream(spark, sf), TABLE, ["event_id"], DB)
    assert spark.table(f"{DB}.{TABLE}").count() == expected


def test_stream_capped_sessions_chunked_replay_equals_batch(spark, tmp_path):
    """The capped-session recurrence must survive micro-batch
    boundaries: replay the events log as three chronological files
    (maxFilesPerTrigger=1 → three micro-batches), and the drained
    per-user summaries must bit-equal the batch grouped-map walk."""
    from pyspark.sql import functions as F

    from batch_processing_etl_orchestration_spark.plans.analytics import (
        q_sessionize_capped,
    )
    from batch_processing_etl_orchestration_spark.streaming.stateful import (
        stateful_capped_sessions,
    )
    from batch_processing_etl_orchestration_spark.streaming.events import (
        run_stream_to_table,
    )
    from batch_processing_etl_orchestration_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    # carry event time as int64 micros: pandas would write ns-precision
    # parquet, which the session's nanosAsLong conf reads back as longs
    ev = (
        load_table(spark, sf, "events")
        .select(
            "user_id",
            "event_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        )
        .orderBy("ts_us", "event_id")
        .toPandas()
    )
    n = len(ev)
    chunk_dir = tmp_path / "chunks"
    chunk_dir.mkdir()
    import time

    for i, lo in enumerate(range(0, n, (n + 2) // 3)):
        ev.iloc[lo : lo + (n + 2) // 3].to_parquet(
            chunk_dir / f"{i}.parquet", index=False
        )
        time.sleep(1.1)  # distinct mtimes → deterministic file order

    schema = spark.read.parquet(str(chunk_dir)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(chunk_dir))
        .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
        .select("user_id", "event_id", "ts")
    )
    got = run_stream_to_table(
        stateful_capped_sessions(stream),
        spark,
        output_mode="update",
        update_keys=["user_id"],
    )
    expected = q_sessionize_capped(spark, sf)
    key = lambda r: tuple(r)
    assert sorted(map(key, got.collect())) == sorted(map(key, expected.collect()))
