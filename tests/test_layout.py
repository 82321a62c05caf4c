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


def _file_ranges(path: str, col: str) -> list[tuple]:
    """(min, max) footer stats of `col` per parquet file."""
    import pyarrow.parquet as pq

    out = []
    for f in sorted(os.listdir(path)):
        if not f.endswith(".parquet"):
            continue
        md = pq.read_metadata(os.path.join(path, f))
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            c = next(
                md.row_group(rg).column(i)
                for i in range(md.num_columns)
                if md.row_group(rg).column(i).path_in_schema == col
            )
            mins.append(c.statistics.min)
            maxs.append(c.statistics.max)
        out.append((min(mins), max(maxs)))
    return out


def _n_overlapping(path: str, preds: dict[str, tuple]) -> tuple[int, int]:
    """(#files whose footer ranges overlap ALL predicates, #files) —
    exactly the skip decision stats-based pruning (parquet row groups,
    Delta/Iceberg file skipping) makes from min/max."""
    per_col = {c: _file_ranges(path, c) for c in preds}
    n_files = len(next(iter(per_col.values())))
    n_hit = 0
    for i in range(n_files):
        if all(
            per_col[c][i][0] <= hi and per_col[c][i][1] >= lo
            for c, (lo, hi) in preds.items()
        ):
            n_hit += 1
    return n_hit, n_files


def test_zorder_prunes_both_dims(spark, tmp_path):
    """Z-order vs linear sort on (user_id, value): the linear layout
    prunes only its leading column — a value predicate overlaps every
    file — while the Z-order layout keeps BOTH columns' per-file
    ranges tight enough that either predicate alone skips most files.
    The audit reads the same footer min/max that row-group pruning
    and table-format file skipping consult."""
    from batch_processing_etl_orchestration_spark.warehouse.layout import zorder_by

    ev = load_table(spark, "/root/testdata/sf0.01", "events").select(
        "event_id", "user_id", "value"
    )

    linear = str(tmp_path / "linear")
    (
        ev.repartitionByRange(16, "user_id")
        .write.mode("overwrite").parquet(linear)
    )
    zpath = str(tmp_path / "zorder")
    zorder_by(ev, ["user_id", "value"], 16, bits_per_dim=4).write.mode(
        "overwrite"
    ).parquet(zpath)

    # round-trip correctness: clustering must not lose or change rows
    assert (
        spark.read.parquet(zpath).select(F.sum("event_id")).first()[0]
        == ev.select(F.sum("event_id")).first()[0]
    )
    assert spark.read.parquet(zpath).count() == ev.count()

    # value-only predicate: linear layout can't prune (every file
    # spans nearly the full value range); z-order skips most
    val_pred = {"value": (100.0, 130.0)}
    lin_hit, lin_total = _n_overlapping(linear, val_pred)
    z_hit, z_total = _n_overlapping(zpath, val_pred)
    assert lin_hit == lin_total, "leading-col sort should NOT prune value"
    assert z_hit <= z_total // 2, f"z-order pruned too little: {z_hit}/{z_total}"

    # conjunctive predicate on both dims: z-order prunes to a corner
    both = {"user_id": (10, 20), "value": (100.0, 130.0)}
    zb_hit, _ = _n_overlapping(zpath, both)
    lb_hit, _ = _n_overlapping(linear, both)
    assert zb_hit <= lb_hit
    assert zb_hit <= z_total // 4, f"{zb_hit}/{z_total} files for a 7%x6% box"


def test_dynamic_partition_pruning_fires(spark, tmp_path):
    """Dynamic partition pruning: joining the date-partitioned fact to
    a FILTERED dim prunes fact partitions at RUNTIME from the dim's
    join keys — the partition filter is a dynamicpruning subquery, not
    a static literal. This is the optimizer mechanism that makes
    'fact JOIN dim WHERE dim.attr = x' scan only matching days at
    100 TB; results must equal the unpartitioned join."""
    import io
    from contextlib import redirect_stdout

    fact_path = str(tmp_path / "fact_part")
    ev = load_table(spark, "/root/testdata/sf0.01", "events")
    write_date_partitioned(ev, fact_path, "ts")
    fact = read_date_partitioned(spark, fact_path)

    # dim: one row per day with an attribute; filter selects 3 days
    dim = (
        ev.select(F.date_trunc("day", "ts").cast("date").alias("p_date"))
        .distinct()
        .withColumn("day_kind", F.when(F.dayofmonth("p_date") <= 3, "early").otherwise("late"))
    ).localCheckpoint(eager=True)

    old = spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    try:
        joined = fact.join(dim.where(F.col("day_kind") == "early"), "p_date")
        buf = io.StringIO()
        with redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "dynamicpruning" in plan.lower(), plan[:2000]

        got = joined.agg(
            F.count(F.lit(1)).alias("n"), F.sum("event_id").alias("s")
        ).first()
        want = ev.where(
            F.dayofmonth(F.date_trunc("day", "ts")) <= 3
        ).agg(F.count(F.lit(1)), F.sum("event_id")).first()
        assert (got["n"], got["s"]) == (want[0], want[1])
    finally:
        spark.conf.set(
            "spark.sql.optimizer.dynamicPartitionPruning.enabled", old
        )
