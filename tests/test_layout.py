"""Date-partitioned layout: the write produces one directory per day
and a filtered read prunes partitions (PartitionFilters in the scan)."""

from __future__ import annotations

import io
import os
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from batch_processing_etl_orchestration_spark.tables import load_table
from batch_processing_etl_orchestration_spark.warehouse.layout import (
    read_date_partitioned,
    write_date_partitioned,
)


def test_partitioned_write_and_pruning(spark, tmp_path):
    path = str(tmp_path / "events_part")
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    write_date_partitioned(ev, path, "ts")

    # one directory per day present in the data
    days = {d for d in os.listdir(path) if d.startswith("p_date=")}
    n_days = ev.select(F.date_trunc("day", "ts").cast("date")).distinct().count()
    assert len(days) == n_days

    back = read_date_partitioned(spark, path)
    assert back.count() == ev.count()

    filtered = back.where(F.col("p_date") == "2024-01-05")
    buf = io.StringIO()
    with redirect_stdout(buf):
        filtered.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters: [" in plan
    assert "p_date" in plan.split("PartitionFilters")[1][:200]
    # and the partition filter actually restricts the rows
    expected = ev.where(F.date_trunc("day", "ts").cast("date") == F.lit("2024-01-05")).count()
    assert filtered.count() == expected
