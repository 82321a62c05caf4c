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


def test_compaction_bounds_files_and_clusters_ranges(spark, tmp_path):
    """64-way fragmented events -> compacted files: file count drops
    to ~rows/target, row fidelity holds, and with a cluster column the
    parquet footer min/max ranges are pairwise disjoint (footer-stat
    pruning works like a coarse index)."""
    import pyarrow.parquet as pq

    from batch_processing_etl_orchestration_spark.warehouse.layout import (
        compact_parquet,
    )

    frag = str(tmp_path / "frag")
    comp = str(tmp_path / "comp")
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    ev.repartition(64).write.parquet(frag)
    n_frag = len([f for f in os.listdir(frag) if f.endswith(".parquet")])
    assert n_frag >= 32  # genuinely fragmented

    n_rows = ev.count()
    target = n_rows // 4
    compact_parquet(spark, frag, comp, target, cluster_col="event_id")
    files = [
        os.path.join(comp, f) for f in os.listdir(comp) if f.endswith(".parquet")
    ]
    assert len(files) <= 8  # ~4 target files, maxRecordsPerFile may split
    back = spark.read.parquet(comp)
    assert back.count() == n_rows
    assert back.select(F.sum("event_id")).first()[0] == ev.select(
        F.sum("event_id")
    ).first()[0]

    ranges = []
    for f in files:
        md = pq.read_metadata(f)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = next(
                md.row_group(rg).column(i)
                for i in range(md.num_columns)
                if md.row_group(rg).column(i).path_in_schema == "event_id"
            )
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping file ranges {hi1} vs {lo2}"
