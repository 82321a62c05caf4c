"""Storage-format breadth and warehouse write semantics the 100 TB
story depends on: ORC/JSON/CSV round-trips (beyond the parquet the
fixtures use), dynamic partition overwrite (re-load one day without
touching the others — the reference's 3-day refetch as an idempotent
partition swap), and schema-evolution reads (a column added mid-stream
must not break old files)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from batch_processing_etl_orchestration_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def _events(spark):
    return load_table(spark, SF, "events").select(
        "event_id", "user_id", "event_type", "value"
    )


def test_orc_json_csv_round_trip(spark, tmp_path):
    ev = _events(spark).orderBy("event_id").limit(200)
    want = [tuple(r) for r in ev.collect()]
    for fmt, opts in [
        ("orc", {"compression": "zstd"}),
        ("json", {}),
        ("csv", {"header": "true"}),
    ]:
        path = str(tmp_path / fmt)
        ev.write.mode("overwrite").options(**opts).format(fmt).save(path)
        reader = spark.read.format(fmt).options(**opts)
        if fmt == "csv":
            reader = reader.schema(ev.schema)  # csv is untyped; supply schema
        back = reader.load(path)
        assert back.schema == ev.schema or fmt == "json", fmt
        got = sorted(tuple(r) for r in back.select(*ev.columns).collect())
        assert got == sorted(want), fmt


def test_dynamic_partition_overwrite_replaces_only_written_days(spark, tmp_path):
    """partitionOverwriteMode=dynamic: rewriting one day's partition
    must leave every other day untouched — the idempotent form of the
    reference's rolling 3-day refetch (EIA930PipelineHourlyData.py:48)."""
    path = str(tmp_path / "events_dyn")
    ev = load_table(spark, SF, "events").withColumn(
        "p_date", F.date_trunc("day", "ts").cast("date")
    ).select("event_id", "value", "p_date")
    ev.write.mode("overwrite").partitionBy("p_date").parquet(path)
    total_before = spark.read.parquet(path).count()
    one_day = ev.where(F.col("p_date") == "2024-01-05")
    n_day = one_day.count()
    assert 0 < n_day < total_before

    # halve that day's rows and dynamically overwrite only its partition
    replacement = one_day.where(F.col("event_id") % 2 == 0)
    prior = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        replacement.write.mode("overwrite").partitionBy("p_date").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prior)

    back = spark.read.parquet(path)
    assert back.where(F.col("p_date") == "2024-01-05").count() == replacement.count()
    # every OTHER day untouched
    assert back.where(F.col("p_date") != "2024-01-05").count() == total_before - n_day
    assert len([d for d in os.listdir(path) if d.startswith("p_date=")]) > 1


def test_schema_evolution_merge_schema(spark, tmp_path):
    """Files written before a column existed must read as nulls for it
    under mergeSchema — bronze schema drift across ingestion epochs
    (the respondent/fromba drift, FIXTURES.md F1, at the storage layer)."""
    path = str(tmp_path / "evolving")
    old = spark.range(5).select(F.col("id").alias("event_id"), F.lit(1.0).alias("value"))
    new = spark.range(5, 10).select(
        F.col("id").alias("event_id"),
        F.lit(2.0).alias("value"),
        F.lit("eu-west").alias("region"),
    )
    old.write.mode("overwrite").parquet(os.path.join(path, "epoch=1"))
    new.write.mode("overwrite").parquet(os.path.join(path, "epoch=2"))
    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) >= {"event_id", "value", "region"}
    assert merged.count() == 10
    assert merged.where(F.col("region").isNull()).count() == 5  # old epoch
    assert merged.where(F.col("region") == "eu-west").count() == 5
