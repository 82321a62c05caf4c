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
