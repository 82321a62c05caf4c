"""Watermark semantics under real multi-batch execution: late rows
arriving after their window is finalized must be DROPPED, not merged,
and finalized windows must emit exactly once.

availableNow over a single file never exercises this (everything is
batch 1, watermark still at its initial floor), so this test stages
THREE files with one-file-per-micro-batch:

- batch 0: the full events fixture → watermark advances to
  max_ts - horizon at its end,
- batch 1: a row near max_ts — the watermark is now ACTIVE and the
  finalized windows are emitted/evicted. (Spark applies the watermark
  one trigger behind its computation, so a late file in batch 1 would
  still merge — this intermediate batch is what arms the filter.)
- batch 2: a file whose rows all fall on the fixture's earliest day —
  every one is below the watermark and must be dropped
  (numRowsDroppedByWatermark > 0, no count inflation, no re-emission
  of an already-finalized window).
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import functions as F

from batch_processing_etl_orchestration_spark.functions.exact import exact_sum
from batch_processing_etl_orchestration_spark.tables import load_table

SF = "/root/testdata/sf0.001"
HORIZON = "2 days"


def _write_single_parquet(df, tmp_dir: str, dest: str) -> None:
    df.coalesce(1).write.mode("overwrite").parquet(tmp_dir)
    part = glob.glob(os.path.join(tmp_dir, "part-*.parquet"))[0]
    shutil.move(part, dest)


def test_watermark_drops_late_rows(spark, tmp_path):
    ev = load_table(spark, SF, "events").select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    stage = str(tmp_path / "in")
    os.makedirs(stage)
    min_ts, max_ts = ev.agg(F.min("ts"), F.max("ts")).first()
    late = ev.where(
        F.col("ts") < F.lit(min_ts) + F.expr("INTERVAL 1 DAY")
    ).withColumn("event_id", F.col("event_id") + F.lit(10**9))
    mid = ev.where(
        F.col("ts") > F.lit(max_ts) - F.expr("INTERVAL 1 HOUR")
    ).withColumn("event_id", F.col("event_id") + F.lit(2 * 10**9))
    assert late.count() > 0 and mid.count() > 0

    _write_single_parquet(ev, str(tmp_path / "a"), os.path.join(stage, "00_base.parquet"))
    _write_single_parquet(mid, str(tmp_path / "b"), os.path.join(stage, "01_mid.parquet"))
    _write_single_parquet(late, str(tmp_path / "c"), os.path.join(stage, "02_late.parquet"))
    base_mtime = os.path.getmtime(os.path.join(stage, "00_base.parquet"))
    os.utime(os.path.join(stage, "01_mid.parquet"), (base_mtime + 60,) * 2)
    os.utime(os.path.join(stage, "02_late.parquet"), (base_mtime + 120,) * 2)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(stage)
    )
    agg = (
        stream.withWatermark("ts", HORIZON)
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            exact_sum("value").alias("total_value"),
        )
    )
    table, ckpt = "wm_late_test", str(tmp_path / "ckpt")
    q = (
        agg.writeStream.format("memory")
        .queryName(table)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    dropped = sum(
        p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
    )
    assert dropped > 0, "the late file must be dropped by the watermark"

    out = spark.table(table)
    emitted = out.count()
    assert emitted == out.select("w").distinct().count(), "window emitted twice"

    got = {
        r["w"]["start"].strftime("%Y-%m-%d %H"): (r["n_events"], r["total_value"])
        for r in out.collect()
    }
    # append emits windows finalized below the final watermark; the mid
    # rows (last hour) stay unfinalized, so the emitted contents must
    # equal the BASE file alone — if the late file had merged, every
    # early-day hour would show inflated counts.
    wm = F.lit(max_ts) - F.expr(f"INTERVAL {HORIZON}")
    expected = {
        r["w"]["start"].strftime("%Y-%m-%d %H"): (r["n_events"], r["total_value"])
        for r in ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            exact_sum("value").alias("total_value"),
        )
        .where(F.col("w.end") <= wm)
        .collect()
    }
    late_hours = {
        r["h"].strftime("%Y-%m-%d %H")
        for r in late.select(F.date_trunc("hour", "ts").alias("h")).distinct().collect()
    }
    assert late_hours & set(got), "late hours must be inside the emitted range"
    assert got == expected


def test_stream_stream_left_outer_emits_unmatched(spark, tmp_path):
    """Stream-stream LEFT OUTER interval join: a purchase with no click
    in its preceding hour must eventually emit with NULL click columns —
    but only after the watermark closes its join window, so a
    single-batch run shows none of them. Matched pairs must equal the
    batch inner join exactly; no purchase may appear both matched and
    null-matched; nothing may emit twice."""
    ev = load_table(spark, SF, "events").select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"), "user_id",
        "event_type", "value",
    )
    stage = str(tmp_path / "in")
    os.makedirs(stage)
    # tail files carry only filter-dropped rows ('error' type): their
    # content never reaches the join — they exist to give the engine
    # two more triggers with the already-armed watermark, which is when
    # outer-side state eviction (and null emission) happens.
    tail = ev.where(F.col("event_type") == "error").limit(3).withColumn(
        "event_id", F.col("event_id") + F.lit(10**9)
    )
    _write_single_parquet(ev, str(tmp_path / "a"), os.path.join(stage, "00_base.parquet"))
    _write_single_parquet(tail, str(tmp_path / "b"), os.path.join(stage, "01_t1.parquet"))
    _write_single_parquet(tail, str(tmp_path / "c"), os.path.join(stage, "02_t2.parquet"))
    base_mtime = os.path.getmtime(os.path.join(stage, "00_base.parquet"))
    os.utime(os.path.join(stage, "01_t1.parquet"), (base_mtime + 60,) * 2)
    os.utime(os.path.join(stage, "02_t2.parquet"), (base_mtime + 120,) * 2)

    def _stream():
        return (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", "1")
            .option("latestFirst", "false")
            .parquet(stage)
        )

    purchases = (
        _stream()
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "2 days")
    )
    clicks = (
        _stream()
        .where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "2 days")
    )
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user_id"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") <= F.col("p_ts")),
        "left_outer",
    ).select("purchase_id", "user_id", "p_ts", "click_id")
    table, ckpt = "ss_left_outer", str(tmp_path / "ckpt")
    q = (
        joined.writeStream.format("memory")
        .queryName(table)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table(table).collect()

    got_matched = {(r["purchase_id"], r["click_id"]) for r in out if r["click_id"] is not None}
    got_null = [r["purchase_id"] for r in out if r["click_id"] is None]

    # batch ground truth
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("p_ts")
    )
    c = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("c_ts"),
    )
    inner = {
        (r["purchase_id"], r["click_id"])
        for r in p.join(
            c,
            (F.col("user_id") == F.col("c_user_id"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("c_ts") <= F.col("p_ts")),
        ).collect()
    }
    matched_ids = {m[0] for m in inner}
    unmatched_purchases = {
        r["purchase_id"] for r in p.collect() if r["purchase_id"] not in matched_ids
    }

    assert got_matched == inner  # inner pairs emit exactly, as they process
    assert got_null, "watermark passage must flush some unmatched purchases"
    assert len(got_null) == len(set(got_null)), "unmatched purchase emitted twice"
    assert set(got_null) <= unmatched_purchases  # nulls only for truly unmatched
    assert not (set(got_null) & {m[0] for m in inner})
