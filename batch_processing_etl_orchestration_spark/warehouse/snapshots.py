"""Versioned parquet tables: manifests, time travel, and file-level
erasure — the lakehouse mechanism (Delta/Iceberg) in its minimal
honest form.

A table version is a MANIFEST: an immutable JSON file listing exactly
which data files belong to that version. Data files are never
mutated; commits add a new manifest. That one idea buys:

- **Snapshot isolation / time travel**: ``read(version=k)`` plans
  only v_k's files — a later append or erasure cannot disturb it.
- **Appends without read disruption**: new files + a new manifest;
  old manifests still describe consistent tables.
- **Right-to-be-forgotten erasure at partition-rewrite cost**:
  ``erase(predicate)`` scans WITH ``input_file_name()`` to find the
  files that actually contain matching rows (parquet row-group stats
  prune the scan), rewrites ONLY those files without the matching
  rows, and commits untouched files by reference. At 100 TB, erasing
  one user touches the few files their rows land in — not the table.
  (Deletion-vector formats defer even that rewrite; the manifest
  model here is the rewrite flavor, stated plainly.)
- **Atomic commits**: the manifest is written to a temp name and
  ``os.rename``d into place — readers see the old or the new table,
  never half. A crashed commit leaves a temp file and no new
  version. Concurrent committers race on the rename; the loser's
  version file already exists and the commit raises instead of
  silently overwriting (optimistic concurrency, single-writer
  assumption documented).

The reference has no versioning story at all — its Postgres sink is
INSERT-append with duplicates on re-run (SURVEY K1); this module is
what that sink grows into when audits and erasure requests arrive.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class VersionedTable:
    """Manifest-versioned parquet table rooted at `path`."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self._mdir = os.path.join(path, "_manifests")

    # -- manifest plumbing -------------------------------------------------

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self._mdir, f"v{version:08d}.json")

    def versions(self) -> list[int]:
        if not os.path.isdir(self._mdir):
            return []
        out = []
        for f in os.listdir(self._mdir):
            if f.startswith("v") and f.endswith(".json"):
                out.append(int(f[1:-5]))
        return sorted(out)

    def latest_version(self) -> int:
        vs = self.versions()
        if not vs:
            raise ValueError(f"no versions at {self.path}")
        return vs[-1]

    def _read_manifest(self, version: int) -> dict:
        with open(self._manifest_path(version)) as f:
            return json.load(f)

    def _commit(
        self,
        version: int,
        files: list[str],
        op: str,
        meta: dict,
        schema: str | None = None,
    ) -> None:
        """Atomic: temp write + rename. An existing target version
        means a concurrent commit won — raise, never overwrite.
        `schema` (StructType JSON) rides the manifest so readers plan
        with the COMMITTED schema instead of sampling parquet footers —
        Delta's model; after additive evolution, old files null-fill
        the new columns at scan time with zero extra I/O."""
        os.makedirs(self._mdir, exist_ok=True)
        target = self._manifest_path(version)
        if os.path.exists(target):
            raise RuntimeError(
                f"version {version} already committed (concurrent writer?)"
            )
        rec = {"version": version, "files": sorted(files), "op": op,
               "meta": meta}
        if schema is not None:
            rec["schema"] = schema
        tmp = target + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(rec, f)
        try:
            # link is CREATE-EXCLUSIVE where rename would silently
            # replace: two writers that both passed the exists() check
            # race here, and exactly one wins — optimistic concurrency
            # at the manifest, the same contract as a table format's
            # conditional commit.
            os.link(tmp, target)
        except FileExistsError:
            raise RuntimeError(
                f"version {version} already committed (lost the race "
                "to a concurrent writer; re-read and retry the commit)"
            ) from None
        finally:
            try:
                os.unlink(tmp)
            except OSError:
                pass

    def _file_relpath(self, uri: str) -> str:
        """Manifest-relative path for an ``input_file_name()`` value.
        Spark returns a percent-encoded file URI; strip the scheme and
        URL-DECODE before relpath — a table path with encodable
        characters (spaces etc.) otherwise matches no manifest entry,
        hit files silently stay unrewritten, and the follow-up hit-file
        read fails (ADVICE r6). The decoded path must name a manifest
        file; anything else is a corrupted-manifest error, not a miss."""
        from urllib.parse import unquote, urlparse

        p = urlparse(uri)
        local = unquote(p.path) if p.scheme else unquote(uri)
        rel = os.path.relpath(local, self.path)
        if not os.path.isfile(os.path.join(self.path, rel)):
            raise ValueError(
                f"scanned file {uri!r} resolves to {rel!r}, which is not "
                f"under table path {self.path!r} — manifest/scan mismatch"
            )
        return rel

    def _write_files(self, df: DataFrame) -> list[str]:
        """Write df as new immutable data files; return their names."""
        subdir = f"data-{uuid.uuid4().hex[:12]}"
        out = os.path.join(self.path, subdir)
        df.write.mode("errorifexists").parquet(out)
        return [
            f"{subdir}/{f}"
            for f in os.listdir(out)
            if f.endswith(".parquet")
        ]

    # -- operations --------------------------------------------------------

    def _schema_of(self, manifest: dict):
        """Committed schema as a StructType, or None for manifests
        written before schemas rode the manifest (pre-evolution
        tables keep reading footer-sampled, unchanged behavior)."""
        from pyspark.sql.types import StructType

        s = manifest.get("schema")
        return StructType.fromJson(json.loads(s)) if s else None

    @staticmethod
    def create(spark: SparkSession, path: str, df: DataFrame) -> "VersionedTable":
        t = VersionedTable(spark, path)
        files = t._write_files(df)
        t._commit(0, files, "create", {}, schema=df.schema.json())
        return t

    def append(
        self,
        df: DataFrame,
        allow_schema_evolution: bool = False,
        _op: str = "append",
        _meta_extra: dict | None = None,
    ) -> int:
        """Append `df` as new files. If `df` carries columns the table
        doesn't have, the commit is rejected unless
        `allow_schema_evolution=True`, in which case the table schema
        EVOLVES ADDITIVELY: new columns join the committed schema
        (nullable), old files null-fill them at read time via the
        manifest schema — no rewrite, no footer merging. Existing
        columns must keep their exact type (widening is a rewrite-class
        operation, out of scope by design)."""
        base = self.latest_version()
        m = self._read_manifest(base)
        base_schema = self._schema_of(m)
        schema_json = None
        if base_schema is not None:
            from pyspark.sql.types import StructField, StructType

            by_name = {f.name: f for f in base_schema.fields}
            merged = list(base_schema.fields)
            for f in df.schema.fields:
                if f.name in by_name:
                    if f.dataType != by_name[f.name].dataType:
                        raise ValueError(
                            f"append: column {f.name} type "
                            f"{f.dataType.simpleString()} != committed "
                            f"{by_name[f.name].dataType.simpleString()}"
                        )
                elif not allow_schema_evolution:
                    raise ValueError(
                        f"append: new column {f.name} requires "
                        "allow_schema_evolution=True"
                    )
                else:
                    merged.append(StructField(f.name, f.dataType, True))
            schema_json = StructType(merged).json()
        files = m["files"] + self._write_files(df)
        v = base + 1
        # schema_json is None exactly when the base manifest carries no
        # schema (pre-evolution table) — commit None in that case too
        self._commit(
            v, files, _op,
            {"base": base, **(_meta_extra or {})},
            schema=schema_json,
        )
        return v

    def erase(self, predicate: F.Column) -> int:
        """New version WITHOUT rows matching `predicate`. Only files
        that actually contain matching rows are rewritten; the rest
        carry over by reference (inode-pinned in tests). The match
        scan pushes the predicate to parquet, so row-group stats
        prune files that can't contain matches before any I/O."""
        base = self.latest_version()
        m = self._read_manifest(base)
        files, schema = m["files"], self._schema_of(m)
        df = self._read_files(files, schema)
        hit = (
            df.where(predicate)
            .select(F.input_file_name().alias("f"))
            .distinct()
            .collect()  # one row per file containing matches — tiny
        )
        hit_files = {self._file_relpath(r["f"]) for r in hit}
        keep = [f for f in files if f not in hit_files]
        new_files = []
        if hit_files:
            survivors = self._read_files(sorted(hit_files), schema).where(
                ~predicate
            )
            new_files = self._write_files(survivors)
        v = base + 1
        self._commit(
            v, keep + new_files, "erase",
            {"base": base, "rewritten": len(hit_files)},
            schema=schema.json() if schema is not None else None,
        )
        return v

    def merge(
        self,
        source: DataFrame,
        key_cols: list[str],
        delete_condition: F.Column | None = None,
        _op: str = "merge",
        _meta_extra: dict | None = None,
    ) -> int:
        """MERGE INTO, copy-on-write: upsert `source` into the table by
        `key_cols` — matched target rows are REPLACED by their source
        row, unmatched source rows are INSERTED, and source rows
        satisfying `delete_condition` are DELETES (their matched target
        rows vanish; unmatched delete rows are no-ops). This is Delta's
        ``whenMatchedUpdateAll / whenNotMatchedInsertAll`` plus a
        delete clause, built on the same manifest commit as append/
        erase.

        The cost model is the point. A CDC batch touches few keys, so:

        1. **Discovery** scans the current version's KEY COLUMNS only
           (column-pruned parquet read) with ``input_file_name()``,
           left-semi against the BROADCAST source keys — one pass that
           names the files actually containing matched keys.
        2. **Rewrite** reads only those hit files; every other file
           carries into the new version BY REFERENCE (same inode —
           pinned in tests). The new files hold the hit files'
           unmatched rows plus every surviving source row. Matched old
           rows disappear via a broadcast anti-join; replacements and
           inserts are just the source batch itself — no full-outer
           join, no window, one narrow scan of the rewrite set.

        At 100 TB with the table clustered on the merge key
        (layout.zorder_by), parquet footer stats shrink the discovery
        scan and the hit set approaches the true number of touched
        files — MERGE cost tracks the CDC batch, not the table.

        Precondition (same contract as scd2_apply): at most one source
        row per key. Enforced lazily — an assert_true rides a per-key
        count aggregation and fails the job on the first duplicate,
        because a batch with duplicate keys has no well-defined "the"
        replacement row and would silently double rows in the new
        version.

        Reference: the Postgres sink's re-run story (SURVEY K1,
        databaseOperations.py) is append-with-duplicates; idempotent
        re-ingestion at warehouse scale is exactly this MERGE.
        """
        base = self.latest_version()
        _m = self._read_manifest(base)
        files, _schema = _m["files"], self._schema_of(_m)
        cols = (
            [f.name for f in _schema.fields]
            if _schema is not None
            else self._read_files(files).columns
        )
        if set(source.columns) != set(cols):
            raise ValueError(
                f"merge: source columns {sorted(source.columns)} != "
                f"table columns {sorted(cols)}"
            )
        # Types must match the committed schema too: with no hit files
        # the source batch is written verbatim, and a type-drifted
        # column would commit files the pinned manifest schema can't
        # read — an unreadable version that fails only at the NEXT
        # read. Fail the commit instead (append() has the same check).
        if _schema is not None:
            want = {f.name: f.dataType for f in _schema.fields}
            for f in source.schema.fields:
                if f.dataType != want[f.name]:
                    raise ValueError(
                        f"merge: column {f.name} type "
                        f"{f.dataType.simpleString()} != committed "
                        f"{want[f.name].simpleString()}"
                    )

        # Duplicate-key guard riding a marker column (scd2_apply's
        # pattern): hash-agg per key, assert_true raises mid-job on the
        # first duplicate; first() is exact because the assert proves
        # singleton groups.
        src = source.groupBy(*key_cols).agg(
            *[
                F.first(c, ignorenulls=False).alias(c)
                for c in cols
                if c not in key_cols
            ],
            F.coalesce(
                F.assert_true(
                    F.count(F.lit(1)) == 1,
                    F.concat_ws(
                        "",
                        F.lit("merge: duplicate key in source batch: "),
                        *[F.col(c).cast("string") for c in key_cols],
                    ),
                ).cast("boolean"),
                F.lit(True),
            ).alias("_ok"),
        )
        # The marker must stay REFERENCED or column pruning deletes the
        # assert with it: route the first key column through the
        # (always-true) marker — when(_ok, k) ≡ k, but keeps the
        # aggregation's assert_true alive in the plan.
        k0 = key_cols[0]
        src = src.select(
            *[
                F.when(F.col("_ok"), F.col(c)).alias(c) if c == k0 else F.col(c)
                for c in cols
            ]
        )

        src_keys = src.select(*key_cols)
        hit = (
            self._discovery_scan(files, _schema, key_cols)
            .join(F.broadcast(src_keys), key_cols, "left_semi")
            .select("_f")
            .distinct()
            .collect()  # one row per file containing matches — tiny
        )
        hit_files = sorted(self._file_relpath(r["_f"]) for r in hit)
        keep = [f for f in files if f not in set(hit_files)]

        # Surviving source rows: deletes drop out here; their matched
        # target copies drop out via the anti-join below. A NULL
        # condition value is NOT a delete (coalesce to false) — without
        # it, ~NULL would silently drop the row from the upserts while
        # its key still anti-joins the target copy away, vanishing the
        # row instead of updating it.
        upserts = (
            src.where(~F.coalesce(delete_condition, F.lit(False)))
            if delete_condition is not None
            else src
        )
        if hit_files:
            survivors = self._read_files(hit_files, _schema).join(
                F.broadcast(src_keys), key_cols, "left_anti"
            )
            rewrite = survivors.unionByName(upserts)
        else:
            rewrite = upserts
        new_files = self._write_files(rewrite.select(*cols))
        v = base + 1
        self._commit(
            v, keep + new_files, _op,
            {"base": base, "rewritten": len(hit_files), **(_meta_extra or {})},
            schema=_schema.json() if _schema is not None else None,
        )
        return v

    def _discovery_scan(self, files, schema, key_cols: list[str]) -> DataFrame:
        """MERGE's matched-file discovery expression: the key columns
        plus the file name, nothing else — so the scan column-prunes
        to the keys (plan-audited in tests/test_snapshots.py against
        THIS method, the one merge() executes)."""
        return self._read_files(files, schema).select(
            *key_cols, F.input_file_name().alias("_f")
        )

    def _read_files(self, files: list[str], schema=None) -> DataFrame:
        """Plan a scan over manifest files. With a committed schema the
        reader is pinned to it (no footer sampling; files predating an
        additive evolution null-fill the missing columns)."""
        reader = self.spark.read
        if schema is not None:
            reader = reader.schema(schema)
        return reader.parquet(
            *[os.path.join(self.path, f) for f in files]
        )

    def restore(self, version: int) -> int:
        """RESTORE TABLE TO VERSION AS OF — Delta's model: commit a NEW
        version whose file list (and committed schema) are copied from
        the target manifest. Purely metadata: zero data files are
        written or read, so restoring a 100 TB table costs one JSON
        rename however big the rollback is. History is preserved —
        the undone versions stay readable by time travel until
        retention (vacuum) prunes them, and the restore itself is an
        auditable commit (`op=restore`, `restored_from` in meta), not
        a destructive reset."""
        m = self._read_manifest(version)  # raises on unknown version
        v = self.latest_version() + 1
        self._commit(
            v, list(m["files"]), "restore", {"restored_from": version},
            schema=m.get("schema"),
        )
        return v

    def read(self, version: int | None = None) -> DataFrame:
        v = self.latest_version() if version is None else version
        m = self._read_manifest(v)
        return self._read_files(m["files"], self._schema_of(m))

    def history(self) -> list[dict]:
        return [self._read_manifest(v) for v in self.versions()]


class VersionedTableMaintenance:
    """OPTIMIZE/VACUUM for VersionedTable — kept separate so the
    read/write surface stays minimal.

    compact(): the small-files problem is version-management's own
    side effect (every append adds files; erasure rewrites slivers).
    Compaction is just another commit: read latest, rewrite into
    ~target-sized files, commit the new list. Rows are untouched —
    old versions still read their old files.

    vacuum(): data files are immutable and shared across manifests,
    so deletion must be REFERENCE-COUNTED: only files referenced by
    NO kept manifest may go. Pruned versions' manifests are removed
    with their now-unreferenced files; kept versions keep reading
    byte-identical. This is the retention trade Delta's VACUUM makes
    (time travel ends where retention begins), stated explicitly.
    """

    def __init__(self, table: VersionedTable):
        self.t = table

    def compact(
        self,
        target_rows_per_file: int,
        zorder_cols: list[str] | None = None,
    ) -> int:
        """Rewrite the latest version into ~target-sized files;
        with `zorder_cols`, the rewrite clusters rows along the
        Z-order curve over those columns (layout.zorder_by) —
        Delta's ``OPTIMIZE ... ZORDER BY``: one commit both heals
        the small-files debt of appends/merges AND hands every
        clustered dimension tight per-file min/max stats, so point
        and box predicates on any of them skip most files
        (pruning audited in tests/test_snapshots.py)."""
        from batch_processing_etl_orchestration_spark.warehouse.layout import (
            zorder_by,
        )

        t = self.t
        base = t.latest_version()
        df = t.read(base)
        n = df.count()
        n_files = max(1, -(-n // target_rows_per_file))
        laid_out = (
            zorder_by(df, zorder_cols, n_files)
            if zorder_cols
            else df.repartition(n_files)
        )
        files = t._write_files(laid_out)
        v = base + 1
        # compaction materializes the committed schema into every
        # rewritten file, so the schema carries forward unchanged
        sch = t._read_manifest(base).get("schema")
        t._commit(
            v, files, "compact",
            {"base": base, "n_files": n_files,
             "zorder": zorder_cols or []},
            schema=sch,
        )
        return v

    def vacuum(self, keep_last: int = 1) -> dict:
        """Drop all but the newest `keep_last` versions and delete
        data files no kept manifest references. Returns counts."""
        t = self.t
        vs = t.versions()
        kept, pruned = vs[-keep_last:], vs[:-keep_last]
        referenced: set[str] = set()
        for v in kept:
            referenced.update(t._read_manifest(v)["files"])
        removed_files = 0
        for v in pruned:
            for f in t._read_manifest(v)["files"]:
                if f not in referenced:
                    p = os.path.join(t.path, f)
                    if os.path.exists(p):
                        os.remove(p)
                        removed_files += 1
            os.remove(t._manifest_path(v))
        return {"pruned_versions": len(pruned), "removed_files": removed_files}


def idempotent_stream_append(table: VersionedTable, df: DataFrame, batch_id: int) -> bool:
    """foreachBatch sink for a VersionedTable with EXACTLY-ONCE
    semantics: the micro-batch id is recorded in the commit's
    metadata, and a redelivered batch (foreachBatch is at-least-once
    on failure) finds its id in the history and becomes a no-op —
    no marker files, the MANIFEST is the ledger. Returns True if the
    batch was appended, False if it was a duplicate delivery.

    This is the same idempotence the incremental-MV stream gets from
    marker files (q_stream_incremental_mv), upgraded to ride the
    table's own atomic commit: the data files and the batch-id record
    land in one rename, so there is no window where data exists
    without its ledger entry or vice versa."""
    for m in table.history():
        if m["op"] == "stream-append" and m["meta"].get("batch_id") == batch_id:
            return False
    # Delegate to append() so the micro-batch rides the SAME schema
    # validation as a batch append — a stream delivering an extra or
    # retyped column fails the commit instead of silently writing
    # files the pinned manifest schema hides or cannot read.
    table.append(df, _op="stream-append", _meta_extra={"batch_id": batch_id})
    return True


def idempotent_stream_merge(
    table: VersionedTable,
    df: DataFrame,
    batch_id: int,
    key_cols: list[str],
    delete_condition: F.Column | None = None,
) -> bool:
    """foreachBatch sink applying each micro-batch as a copy-on-write
    MERGE with EXACTLY-ONCE semantics — the streaming CDC upsert:
    update/insert/delete rows arrive continuously, and the table
    converges to the same state as applying the batches once each, in
    order, no matter how many times Structured Streaming redelivers a
    batch after a failure (foreachBatch is at-least-once). The
    micro-batch id rides the MERGE commit's metadata; a redelivered id
    is found in the history and becomes a no-op, exactly like
    idempotent_stream_append — the manifest is the ledger, and the
    data files + ledger entry land in one atomic rename.

    This is Delta's `foreachBatch + MERGE` streaming-upsert recipe on
    the manifest table: per batch, cost = discovery scan + hit-file
    rewrite (see VersionedTable.merge), so a steady CDC stream touches
    files proportional to its key churn, never the table. Returns True
    if the batch was merged, False for a duplicate delivery."""
    for m in table.history():
        if m["op"] == "stream-merge" and m["meta"].get("batch_id") == batch_id:
            return False
    table.merge(
        df,
        key_cols,
        delete_condition=delete_condition,
        _op="stream-merge",
        _meta_extra={"batch_id": batch_id},
    )
    return True
