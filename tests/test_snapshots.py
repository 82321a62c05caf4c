"""warehouse/snapshots.py — manifest-versioned tables."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from batch_processing_etl_orchestration_spark.tables import load_table
from batch_processing_etl_orchestration_spark.warehouse.snapshots import (
    VersionedTable,
)


@pytest.fixture()
def table(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    t = VersionedTable.create(
        spark, str(tmp_path / "vt"),
        ev.where(F.col("event_id") % 3 == 0).repartition(4),
    )
    return t, ev


def test_time_travel_is_immutable(spark, table):
    t, ev = table
    v0_sum = t.read(0).agg(F.sum("event_id")).first()[0]
    t.append(ev.where(F.col("event_id") % 3 == 1).repartition(2))
    t.erase(F.col("user_id") % 7 == 2)
    # v0 still reads exactly its original content
    assert t.read(0).agg(F.sum("event_id")).first()[0] == v0_sum
    assert t.versions() == [0, 1, 2]
    # latest has no erased users, v1 still does
    assert t.read().where(F.col("user_id") % 7 == 2).count() == 0
    assert t.read(1).where(F.col("user_id") % 7 == 2).count() > 0


def test_append_then_latest_matches_union(spark, table):
    t, ev = table
    t.append(ev.where(F.col("event_id") % 3 == 1))
    got = t.read().agg(F.count(F.lit(1)), F.sum("event_id")).first()
    want = ev.where(F.col("event_id") % 3 != 2).agg(
        F.count(F.lit(1)), F.sum("event_id")
    ).first()
    assert tuple(got) == tuple(want)


def test_erase_rewrites_only_hit_files(spark, table):
    """Files without matching rows carry over by reference: same
    relative path, same inode. Only hit files disappear from the
    manifest, replaced by rewritten survivors."""
    t, ev = table
    before = {
        f: os.stat(os.path.join(t.path, f)).st_ino
        for f in t._read_manifest(t.latest_version())["files"]
    }
    # erase a single event: at most a few of the 4 files contain it
    t.erase(F.col("event_id") == 9)
    after_files = t._read_manifest(t.latest_version())["files"]
    carried = [f for f in after_files if f in before]
    assert carried, "untouched files must carry over by reference"
    for f in carried:
        assert os.stat(os.path.join(t.path, f)).st_ino == before[f]
    hist = t.history()
    assert hist[-1]["op"] == "erase" and hist[-1]["meta"]["rewritten"] >= 1
    # erased row gone, everything else intact
    assert t.read().where(F.col("event_id") == 9).count() == 0
    assert (
        t.read().count()
        == ev.where(F.col("event_id") % 3 == 0).count() - 1
    )


def test_commit_conflict_raises(spark, table):
    t, _ = table
    with pytest.raises(RuntimeError, match="already committed"):
        t._commit(0, [], "create", {})


def test_erase_predicate_prunes_scan(spark, table):
    """The match scan pushes the predicate into the parquet source
    (PushedFilters), so files whose row-group stats exclude the value
    are skipped before I/O."""
    t, _ = table
    plan = (
        t.read()
        .where(F.col("event_id") == 9)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters: [" in plan and "event_id" in plan.split(
        "PushedFilters"
    )[1][:120]


def test_compact_preserves_rows_and_history(spark, table):
    from batch_processing_etl_orchestration_spark.warehouse.snapshots import (
        VersionedTableMaintenance,
    )

    t, ev = table
    before = sorted(tuple(r) for r in t.read().collect())
    maint = VersionedTableMaintenance(t)
    v = maint.compact(target_rows_per_file=10_000)
    files = t._read_manifest(v)["files"]
    assert len(files) == 1  # ~3.3k rows → one target-sized file
    assert sorted(tuple(r) for r in t.read().collect()) == before
    # pre-compaction version still reads its own (multi-file) layout
    assert sorted(tuple(r) for r in t.read(v - 1).collect()) == before


def test_vacuum_is_reference_counted(spark, table):
    from batch_processing_etl_orchestration_spark.warehouse.snapshots import (
        VersionedTableMaintenance,
    )

    t, ev = table
    t.append(ev.where(F.col("event_id") % 3 == 1).repartition(2))
    latest = sorted(tuple(r) for r in t.read().collect())
    maint = VersionedTableMaintenance(t)
    stats = maint.vacuum(keep_last=1)
    assert stats["pruned_versions"] == 1
    # v0's files are SHARED with v1 (append carries them by
    # reference) — vacuum must not remove them
    assert stats["removed_files"] == 0
    assert t.versions() == [1]
    assert sorted(tuple(r) for r in t.read().collect()) == latest

    # now erase (rewrites some files), vacuum again: the rewritten
    # originals become unreferenced and ARE removed
    t.erase(F.col("user_id") % 5 == 0)
    stats2 = maint.vacuum(keep_last=1)
    assert stats2["removed_files"] > 0
    assert t.read().where(F.col("user_id") % 5 == 0).count() == 0


def test_merge_upsert_insert_delete(spark, table):
    """MERGE semantics against a hand-derived expectation: matched
    rows replaced, unmatched source rows inserted, delete-flagged
    source rows removed from the table (or ignored when unmatched)."""
    t, ev = table
    base = t.read()
    # source: update event 9's value to -1, insert a brand-new id -5,
    # delete event 12, and a delete for an id not in the table (-7)
    src = spark.createDataFrame(
        [
            (9, 999, "upd", -1.0),
            (-5, 999, "new", -5.0),
            (12, 0, "del", 0.0),
            (-7, 0, "del", 0.0),
        ],
        base.schema,
    )
    t.merge(src, ["event_id"], delete_condition=F.col("event_type") == "del")
    got = t.read()
    assert got.where(F.col("event_id") == 9).collect()[0]["value"] == -1.0
    assert got.where(F.col("event_id") == -5).count() == 1
    assert got.where(F.col("event_id").isin(12, -7)).count() == 0
    # row count: -1 (deleted 12) +1 (inserted -5)
    assert got.count() == base.count()
    # everything untouched is byte-identical
    untouched = sorted(
        tuple(r)
        for r in base.where(~F.col("event_id").isin(9, 12, -5, -7)).collect()
    )
    assert (
        sorted(
            tuple(r)
            for r in got.where(~F.col("event_id").isin(9, 12, -5, -7)).collect()
        )
        == untouched
    )
    assert t.history()[-1]["op"] == "merge"


def test_merge_rewrites_only_hit_files(spark, table):
    """Copy-on-write: files without matched keys carry over by
    reference (same inode); pre-merge versions are undisturbed."""
    t, ev = table
    before = {
        f: os.stat(os.path.join(t.path, f)).st_ino
        for f in t._read_manifest(t.latest_version())["files"]
    }
    pre_sum = t.read().agg(F.sum("value")).first()[0]
    src = t.read().where(F.col("event_id") == 9).withColumn(
        "value", F.lit(123.0)
    )
    v = t.merge(src, ["event_id"])
    m = t._read_manifest(v)
    carried = [f for f in m["files"] if f in before]
    assert carried, "untouched files must carry over by reference"
    for f in carried:
        assert os.stat(os.path.join(t.path, f)).st_ino == before[f]
    assert 1 <= m["meta"]["rewritten"] < len(before)
    # time travel to the pre-merge version still sees the old value
    assert t.read(v - 1).agg(F.sum("value")).first()[0] == pre_sum


def test_merge_duplicate_source_key_raises(spark, table):
    t, _ = table
    src = spark.createDataFrame(
        [(9, 1, "a", 1.0), (9, 2, "b", 2.0)], t.read().schema
    )
    with pytest.raises(Exception, match="duplicate key"):
        t.merge(src, ["event_id"])


def test_merge_schema_mismatch_raises(spark, table):
    t, _ = table
    with pytest.raises(ValueError, match="source columns"):
        t.merge(t.read().drop("value"), ["event_id"])


def test_schema_evolution_additive(spark, table):
    """An append carrying a new column evolves the committed schema:
    old files null-fill the column at read time (no rewrite), new rows
    carry values, and the pre-evolution version still reads the old
    schema. Unflagged evolution is rejected."""
    t, ev = table
    extra = (
        ev.where(F.col("event_id") % 3 == 1)
        .withColumn("quality", (F.col("event_id") % 5).cast("double"))
    )
    with pytest.raises(ValueError, match="allow_schema_evolution"):
        t.append(extra)
    n_files_before = len(t._read_manifest(t.latest_version())["files"])
    v = t.append(extra, allow_schema_evolution=True)
    got = t.read()
    assert got.columns == ["event_id", "user_id", "event_type", "value", "quality"]
    old = got.where(F.col("event_id") % 3 == 0)
    new = got.where(F.col("event_id") % 3 == 1)
    assert old.where(F.col("quality").isNotNull()).count() == 0
    assert new.where(F.col("quality").isNull()).count() == 0
    # no rewrite: every pre-evolution file still referenced
    files_after = t._read_manifest(v)["files"]
    assert len(files_after) > n_files_before
    # time travel: the pre-evolution version has no 'quality' column
    assert "quality" not in t.read(v - 1).columns


def test_schema_evolution_type_conflict_raises(spark, table):
    t, ev = table
    bad = ev.where(F.col("event_id") % 3 == 1).withColumn(
        "value", F.col("value").cast("string")
    )
    with pytest.raises(ValueError, match="type"):
        t.append(bad, allow_schema_evolution=True)


def test_schema_survives_erase_and_compact(spark, table):
    """Erase and compact after an evolution keep planning with the
    committed (evolved) schema."""
    from batch_processing_etl_orchestration_spark.warehouse.snapshots import (
        VersionedTableMaintenance,
    )

    t, ev = table
    extra = ev.where(F.col("event_id") % 3 == 1).withColumn(
        "quality", F.lit(1.0)
    )
    t.append(extra, allow_schema_evolution=True)
    t.erase(F.col("event_id") == 9)
    assert "quality" in t.read().columns
    VersionedTableMaintenance(t).compact(target_rows_per_file=100_000)
    assert "quality" in t.read().columns
    assert t.read().where(F.col("event_id") == 9).count() == 0


def test_stream_ingest_exactly_once(spark, sf_dir, tmp_path):
    """A file-source stream drains into the versioned table one
    micro-batch per file; redelivering a batch is a no-op (the
    manifest is the ledger); the final table equals the source."""
    from batch_processing_etl_orchestration_spark.warehouse.snapshots import (
        idempotent_stream_append,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    src = str(tmp_path / "src")
    ev.repartitionByRange(4, "event_id").write.parquet(src)

    t = VersionedTable.create(spark, str(tmp_path / "vt"), ev.limit(0))
    delivered = []

    def sink(batch_df, batch_id):
        appended = idempotent_stream_append(t, batch_df, batch_id)
        delivered.append((batch_id, appended))
        # simulate at-least-once: redeliver every batch immediately
        assert not idempotent_stream_append(t, batch_df, batch_id)

    schema = spark.read.parquet(src).schema
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    assert len(delivered) == 4 and all(ok for _, ok in delivered)
    got = t.read().agg(F.count(F.lit(1)), F.sum("event_id")).first()
    want = ev.agg(F.count(F.lit(1)), F.sum("event_id")).first()
    assert tuple(got) == tuple(want)
    ops = [m["op"] for m in t.history()]
    assert ops == ["create"] + ["stream-append"] * 4


def test_stream_merge_exactly_once(spark, sf_dir, tmp_path):
    """CDC micro-batches MERGE into the table via foreachBatch; every
    batch redelivers immediately and must no-op; the final state
    equals one-shot application of the full CDC set."""
    from batch_processing_etl_orchestration_spark.warehouse.snapshots import (
        idempotent_stream_merge,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    t = VersionedTable.create(spark, str(tmp_path / "vt"), ev.repartition(4))
    # CDC: halve value for event_id % 7 == 0, delete % 7 == 1
    cdc = (
        ev.where(F.col("event_id") % 7 == 0)
        .withColumn("value", F.col("value") / 2)
        .unionByName(
            ev.where(F.col("event_id") % 7 == 1).withColumn(
                "value", F.lit(-1.0)
            )
        )
    )
    src = str(tmp_path / "src")
    cdc.repartitionByRange(3, "event_id").write.parquet(src)

    def sink(batch_df, batch_id):
        assert idempotent_stream_merge(
            t, batch_df, batch_id, ["event_id"],
            delete_condition=F.col("value") == -1.0,
        )
        assert not idempotent_stream_merge(
            t, batch_df, batch_id, ["event_id"],
            delete_condition=F.col("value") == -1.0,
        )

    schema = spark.read.parquet(src).schema
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = t.read()
    assert got.where(F.col("event_id") % 7 == 1).count() == 0
    want_sum = (
        ev.where(F.col("event_id") % 7 != 1)
        .withColumn(
            "value",
            F.when(F.col("event_id") % 7 == 0, F.col("value") / 2).otherwise(
                F.col("value")
            ),
        )
        .agg(F.sum(F.round("value", 6)))
        .first()[0]
    )
    assert abs(got.agg(F.sum(F.round("value", 6))).first()[0] - want_sum) < 1e-6
    assert [m["op"] for m in t.history()].count("stream-merge") == 3


def test_merge_null_delete_condition_updates_not_vanishes(spark, table):
    """A source row whose delete_condition evaluates to NULL is an
    UPDATE, not a silent delete (the ~NULL trap)."""
    t, _ = table
    src = spark.createDataFrame(
        [(9, 999, None, 77.0)], t.read().schema
    )
    t.merge(src, ["event_id"], delete_condition=F.col("event_type") == "del")
    got = t.read().where(F.col("event_id") == 9).collect()
    assert len(got) == 1 and got[0]["value"] == 77.0


def test_merge_type_drift_rejected(spark, table):
    """A source with a retyped column must fail the commit — not
    write files the pinned manifest schema cannot read."""
    t, _ = table
    bad = t.read().withColumn("value", F.col("value").cast("string"))
    n_versions = len(t.versions())
    with pytest.raises(ValueError, match="type"):
        t.merge(bad, ["event_id"])
    assert len(t.versions()) == n_versions  # nothing committed


def test_stream_append_validates_schema(spark, table):
    """idempotent_stream_append rides append()'s schema validation: a
    micro-batch with an extra column fails instead of being silently
    hidden by the pinned schema."""
    from batch_processing_etl_orchestration_spark.warehouse.snapshots import (
        idempotent_stream_append,
    )

    t, ev = table
    extra = ev.limit(5).withColumn("surprise", F.lit(1))
    with pytest.raises(ValueError, match="allow_schema_evolution"):
        idempotent_stream_append(t, extra, batch_id=99)


def test_merge_discovery_scan_prunes_to_keys(spark, table):
    """MERGE's discovery pass reads ONLY the key columns (plus the
    file name): auditing merge()'s OWN _discovery_scan method, so a
    regression in the projection merge executes fails here."""
    t, _ = table
    m = t._read_manifest(t.latest_version())
    df = t._discovery_scan(m["files"], t._schema_of(m), ["event_id"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema:" in plan, plan[:500]
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "event_id" in read_schema
    assert "value" not in read_schema and "event_type" not in read_schema


def test_optimize_zorder_clusters_versioned_table(spark, table):
    """compact(zorder_cols=...) — OPTIMIZE ZORDER BY on the versioned
    table: rows survive exactly, the commit records the clustering,
    and per-file footer ranges on BOTH clustered columns become
    selective (a point box overlaps a strict subset of files), which
    is the file-skipping contract the layout buys."""
    from batch_processing_etl_orchestration_spark.warehouse.snapshots import (
        VersionedTableMaintenance,
    )
    from tests.test_layout import _n_overlapping

    t, ev = table
    before = t.read().agg(F.count(F.lit(1)), F.sum("event_id")).first()
    v = VersionedTableMaintenance(t).compact(
        target_rows_per_file=300, zorder_cols=["user_id", "value"]
    )
    after = t.read().agg(F.count(F.lit(1)), F.sum("event_id")).first()
    assert tuple(after) == tuple(before)
    m = t._read_manifest(v)
    assert m["meta"]["zorder"] == ["user_id", "value"]
    # every data file of v lives in one subdir (fresh write) — audit
    # its footer ranges directly
    subdir = os.path.dirname(os.path.join(t.path, m["files"][0]))
    hit_u, n_files = _n_overlapping(subdir, {"user_id": (5, 5)})
    hit_v, _ = _n_overlapping(subdir, {"value": (100.0, 110.0)})
    assert n_files >= 8
    assert hit_u < n_files and hit_v < n_files  # both dims prune


def test_path_with_space_erase_and_merge(spark, sf_dir, tmp_path):
    """input_file_name() returns a percent-encoded URI; erase/merge
    map it back to manifest entries. A table path containing a space
    (percent-encoded as %20 in the URI) must still resolve — before
    the URL-decode fix the hit files matched no manifest entry, were
    silently kept unrewritten, and the hit-file read failed."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    t = VersionedTable.create(
        spark, str(tmp_path / "my table"),
        ev.where(F.col("event_id") % 3 == 0).repartition(4),
    )
    t.erase(F.col("user_id") % 7 == 2)
    assert t.read().where(F.col("user_id") % 7 == 2).count() == 0
    src = (
        ev.where((F.col("event_id") % 3 == 0) & (F.col("event_id") % 5 == 0))
        .withColumn("value", F.col("value") + 1000)
    )
    t.merge(src, ["event_id"])
    assert t.read().where(
        (F.col("event_id") % 5 == 0) & (F.col("value") >= 1000)
    ).count() > 0


def test_concurrent_reader_sees_one_committed_version(spark, sf_dir, tmp_path):
    """Read-during-merge certification (VERDICT r6 ask #7): a second
    SparkSession reads the table in a loop while this session commits
    merges. Every read must observe EXACTLY one committed version's
    row multiset — never a half-merged mixture. Aggregates are keyed
    so each committed state has a distinct, predictable signature."""
    import threading

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    base = ev.where(F.col("event_id") % 3 == 0).repartition(4)
    t = VersionedTable.create(spark, str(tmp_path / "vt"), base)
    n0 = base.count()

    reader_spark = spark.newSession()
    reader = VersionedTable(reader_spark, t.path)
    observed: list[tuple[int, int]] = []
    errors: list[str] = []
    stop = threading.Event()

    def read_loop() -> None:
        while not stop.is_set():
            try:
                row = reader.read().agg(
                    F.count(F.lit(1)).alias("n"),
                    F.count(F.when(F.col("value") < 0, 1)).alias("neg"),
                ).first()
                observed.append((row["n"], row["neg"]))
            except Exception as e:  # pragma: no cover - failure detail
                errors.append(repr(e))
                break

    th = threading.Thread(target=read_loop)
    th.start()
    try:
        # each merge flips the sign of a disjoint key slice: committed
        # states have neg counts that are exact prefix sums
        slices = []
        for k in range(4):
            s = base.where(F.col("event_id") % 7 == k).withColumn(
                "value", -F.abs(F.col("value")) - 1
            )
            slices.append(s.count())
            t.merge(s, ["event_id"])
    finally:
        stop.set()
        th.join(timeout=120)

    assert not errors, errors
    valid = set()
    acc = 0
    valid.add((n0, 0))
    for c in slices:
        acc += c
        valid.add((n0, acc))
    for obs in observed:
        assert obs in valid, (obs, sorted(valid))


def test_concurrent_commit_loses_exactly_one(spark, table):
    """Two writers committing the same next version: exactly one wins,
    the loser raises, and the winner's manifest is intact (the commit
    is create-exclusive, not check-then-replace — a raced rename would
    silently overwrite the first writer's manifest)."""
    t, ev = table
    v = t.latest_version() + 1
    t._commit(v, t._read_manifest(v - 1)["files"], "test-a", {"who": "a"})
    with pytest.raises(RuntimeError, match="already committed|race"):
        t._commit(v, t._read_manifest(v - 1)["files"], "test-b", {"who": "b"})
    assert t._read_manifest(v)["meta"] == {"who": "a"}
    # no stray .tmp- files left behind by the losing writer
    stray = [f for f in os.listdir(t._mdir) if ".tmp-" in f]
    assert stray == []


def test_restore_is_metadata_only_rollback(spark, table):
    """restore(v) commits a NEW version sharing v's files by
    reference (same relpaths, same inodes — zero data I/O), the
    latest read equals v's content, and the undone versions stay
    time-travel-readable."""
    t, ev = table
    t.append(ev.where(F.col("event_id") % 3 == 1).repartition(2))
    t.erase(F.col("user_id") % 7 == 2)
    erased = t.read().agg(F.sum("event_id")).first()[0]
    v1_files = t._read_manifest(1)["files"]
    inodes_before = {
        f: os.stat(os.path.join(t.path, f)).st_ino for f in v1_files
    }
    v = t.restore(1)
    assert v == 3 and t.versions() == [0, 1, 2, 3]
    m3 = t._read_manifest(3)
    assert m3["op"] == "restore" and m3["meta"]["restored_from"] == 1
    assert m3["files"] == v1_files
    for f in v1_files:
        assert os.stat(os.path.join(t.path, f)).st_ino == inodes_before[f]
    want = t.read(1).agg(F.sum("event_id")).first()[0]
    assert t.read().agg(F.sum("event_id")).first()[0] == want
    # the erased version is still pinned history
    assert t.read(2).agg(F.sum("event_id")).first()[0] == erased


def test_restore_unknown_version_raises(spark, table):
    t, _ = table
    with pytest.raises(FileNotFoundError):
        t.restore(7)
    assert t.versions() == [0]  # nothing committed


def test_vacuum_preserves_files_referenced_by_restore(spark, table):
    """The reference-counting contract under restore: after
    create → append → erase → restore(1), vacuum(keep_last=1) keeps
    ONLY v3 — whose manifest references v1's (= v0's + appended)
    files — so those data files must survive even though the
    versions that INTRODUCED them are pruned, and the table must
    read byte-identical afterwards. An age- or version-based sweep
    would delete them and corrupt the live table."""
    from batch_processing_etl_orchestration_spark.warehouse.snapshots import (
        VersionedTableMaintenance,
    )

    t, ev = table
    t.append(ev.where(F.col("event_id") % 3 == 1).repartition(2))
    t.erase(F.col("user_id") % 7 == 2)
    t.restore(1)
    want = t.read().agg(F.count(F.lit(1)), F.sum("event_id")).first()
    stats = VersionedTableMaintenance(t).vacuum(keep_last=1)
    assert t.versions() == [3]
    assert stats["pruned_versions"] == 3
    live = set(t._read_manifest(3)["files"])
    for f in live:
        assert os.path.isfile(os.path.join(t.path, f))
    # only the erase rewrite's survivor files (unreferenced by v3)
    # may have been deleted; the table reads identically
    assert tuple(t.read().agg(
        F.count(F.lit(1)), F.sum("event_id")).first()) == tuple(want)
    # pruned manifests are gone: time travel now fails loudly
    with pytest.raises(FileNotFoundError):
        t.read(0)
