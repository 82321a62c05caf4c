"""Incremental materialized-aggregate maintenance.

The reference recomputes every gold aggregate from the full silver
table on each DAG run (EIA930PipelineHourlyData.py:111-118 re-reads
and re-groups everything); at 100 TB that is a full-corpus shuffle per
refresh. This module maintains a date-partitioned aggregate table
("MV") whose refresh cost is O(|delta| + |MV slice touched|) and —
for algebraically mergeable aggregates — entirely independent of the
fact table's size: new rows are aggregated alone and MERGED into the
stored partials, so history is never re-read.

Two refresh strategies:

- ``delta_refresh`` (the fast path): for SUM / COUNT / MIN / MAX,
  which are commutative monoids. The MV stores *partials* — scaled-
  long sums (exact, order-insensitive; see functions/exact.py) and
  int64 counts — so merge = integer addition, bit-equal no matter how
  arrivals are batched. Late data for old partitions just merges in.
- ``recompute_refresh`` (the general path): for non-mergeable
  aggregates (exact distinct counts, medians), recomputes ONLY the
  partitions present in the delta from fact ∪ delta, a
  partition-pruned scan of the fact.

Both write with dynamic partition overwrite
(``partitionOverwriteMode=dynamic``): only partitions present in the
refresh output are replaced; every other partition's files are
untouched (pinned in tests/test_incremental.py by inode+mtime).

Scale posture: the collected partition list is one value per touched
partition (days, not rows). The MV slice read back for merging is
aggregated rows for touched partitions only — partition-pruned. The
localCheckpoint before the self-overwrite materializes that slice
(required: Spark cannot overwrite files an active plan still reads);
its size is O(groups per touched partition), not O(fact).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from batch_processing_etl_orchestration_spark.functions.exact import SCALE


@dataclass(frozen=True)
class MergeableSpec:
    """Declares a mergeable aggregate MV.

    partition_col: the MV's partition column (already present on the
        fact rows fed in — derive it upstream, e.g. date_trunc).
    group_cols: additional grouping keys inside each partition.
    sum_cols: {output_name: input_column} summed exactly via
        scaled-long (functions/exact.py; same overflow bounds).
    min_cols / max_cols: {output_name: input_column} (exact for any
        orderable type — no FP-order sensitivity).
    hll_cols: {output_name: input_column} distinct-count estimates via
        HyperLogLog++ sketches (Spark's hll_sketch_agg, Apache
        DataSketches). COUNT(DISTINCT) is not a monoid over scalars —
        but it IS over sketches: registers merge by max, so
        union-of-partials ≡ sketch-of-union bit-for-bit (pinned in
        tests). This is what makes distinct-count MVs refreshable
        without the recompute path. finalize() emits the estimate
        (lgConfigK=14 ⇒ ~0.8% relative standard error, 16 KiB/group).
    hist_cols: {output_name: (input_column, lo, hi, n_buckets)} —
        equi-width COUNT HISTOGRAMS, the mergeable answer to
        percentiles (another non-monoid scalar). The partial is an
        int64 count array of n_buckets+2 cells (underflow, buckets,
        overflow); merge = element-wise addition — exact, so a rollup
        histogram equals a direct build bit-for-bit, and any quantile
        estimated from it (hist_quantile) is engine-portable integer
        arithmetic with error ≤ one bucket width for in-range data.
        finalize() emits the array as `<name>`.
    count_name: output name for COUNT(*).
    """

    partition_col: str
    group_cols: tuple[str, ...]
    sum_cols: dict[str, str] = field(default_factory=dict)
    min_cols: dict[str, str] = field(default_factory=dict)
    max_cols: dict[str, str] = field(default_factory=dict)
    hll_cols: dict[str, str] = field(default_factory=dict)
    hist_cols: dict[str, tuple] = field(default_factory=dict)
    count_name: str = "n_rows"
    scale: int = SCALE
    lg_config_k: int = 14

    def _hist_bucket(self, src: str, lo: float, hi: float, n: int) -> F.Column:
        """Cell index 0..n+1: 0 = underflow (x < lo), n+1 = overflow
        (x ≥ hi), else 1 + floor((x−lo)·n/(hi−lo))."""
        x = F.col(src).cast("double")
        raw = F.floor((x - F.lit(lo)) * n / F.lit(hi - lo)).cast("int")
        return (
            F.when(x < lo, F.lit(0))
            .when(x >= hi, F.lit(n + 1))
            .otherwise(raw + 1)
        )

    def _keys(self) -> list[str]:
        return [self.partition_col, *self.group_cols]

    def _partial_aggs(self) -> list[F.Column]:
        """Aggregations producing the stored partial columns."""
        aggs = [
            F.sum(F.round(F.col(src) * F.lit(self.scale)).cast("long")).alias(
                f"{name}__slong"
            )
            for name, src in self.sum_cols.items()
        ]
        aggs += [F.min(src).alias(name) for name, src in self.min_cols.items()]
        aggs += [F.max(src).alias(name) for name, src in self.max_cols.items()]
        aggs += [
            F.hll_sketch_agg(src, self.lg_config_k).alias(f"{name}__hll")
            for name, src in self.hll_cols.items()
        ]
        for name, (src, lo, hi, n) in self.hist_cols.items():
            idx = self._hist_bucket(src, lo, hi, n)
            aggs.append(
                F.array(
                    *[
                        F.sum((idx == i).cast("long")).alias(f"c{i}")
                        for i in range(n + 2)
                    ]
                ).alias(f"{name}__hist")
            )
        aggs.append(F.count(F.lit(1)).alias(self.count_name))
        return aggs

    def _merge_aggs(self) -> list[F.Column]:
        """Aggregations that merge two sets of partials (monoid ops:
        long + long, min of mins, max of maxes, count + count)."""
        aggs = [
            F.sum(f"{name}__slong").alias(f"{name}__slong")
            for name in self.sum_cols
        ]
        aggs += [F.min(name).alias(name) for name in self.min_cols]
        aggs += [F.max(name).alias(name) for name in self.max_cols]
        aggs += [
            F.hll_union_agg(f"{name}__hll").alias(f"{name}__hll")
            for name in self.hll_cols
        ]
        for name, (_, _, _, n) in self.hist_cols.items():
            # element-wise sum of count arrays (exact integer merge)
            aggs.append(
                F.array(
                    *[
                        F.sum(F.element_at(f"{name}__hist", i + 1))
                        for i in range(n + 2)
                    ]
                ).alias(f"{name}__hist")
            )
        aggs.append(F.sum(self.count_name).alias(self.count_name))
        return aggs

    def aggregate(self, rows: DataFrame) -> DataFrame:
        """Fact/delta rows → partial rows (one per group)."""
        return rows.groupBy(*self._keys()).agg(*self._partial_aggs())

    def merge(self, partials: DataFrame, keys: list[str] | None = None) -> DataFrame:
        """Union of partial rows → one merged partial row per group.
        Pass a key subset to ROLL UP across the dropped dimensions
        (e.g. merge daily partials over a date range: monoid partials
        make any coarser grain free — no fact re-read)."""
        return partials.groupBy(*(keys or self._keys())).agg(*self._merge_aggs())

    def finalize(self, partials: DataFrame, keys: list[str] | None = None) -> DataFrame:
        """Partials → user-facing values (scaled-long sums ÷ scale)."""
        cols = [F.col(c) for c in (keys or self._keys())]
        cols += [
            (F.col(f"{name}__slong") / F.lit(float(self.scale))).alias(name)
            for name in self.sum_cols
        ]
        cols += [F.col(name) for name in self.min_cols]
        cols += [F.col(name) for name in self.max_cols]
        cols += [
            F.hll_sketch_estimate(f"{name}__hll").alias(name)
            for name in self.hll_cols
        ]
        cols += [F.col(f"{name}__hist").alias(name) for name in self.hist_cols]
        cols.append(F.col(self.count_name))
        return partials.select(*cols)


_READY = "_MV_READY"
_INTENT = "_REFRESH_INTENT.json"


def pending_refresh(mv_path: str) -> list | None:
    """Partition values (strings, or None for the NULL partition)
    named by an UNFINISHED refresh's intent journal, or None if no
    refresh is pending. A present intent means a dynamic-overwrite
    died between replacing some touched partitions and others — the
    MV slice it names is suspect and must be healed before anyone
    reads it. The journal encodes NULL as JSON null (never str(None)),
    so a string-typed partition literally named 'None' is always
    distinct from the NULL partition (ADVICE r8)."""
    import json
    import os

    path = os.path.join(mv_path, _INTENT)
    if not os.path.isfile(path):
        return None
    try:
        with open(path) as f:
            doc = json.load(f)
        v = doc.get("v")
        if isinstance(v, (int, float)) and v > 2:
            # A FUTURE journal format this code predates. Silently
            # degrading it to "torn → full rebuild" would hide every
            # format bump behind an expensive, wrong heal (ADVICE r9)
            # — fail visibly so the operator upgrades the reader.
            raise RuntimeError(
                f"MV intent journal at {path} has version {v}, newer "
                "than this reader understands (max 2); upgrade before "
                "healing or reading this MV"
            )
        if v != 2:
            # legacy journal (pre-v2 encoded NULL as str(None), which is
            # ambiguous against a partition literally named 'None') —
            # treat as torn: every partition suspect, full heal (safe)
            return []
        return [
            None if v is None else str(v) for v in doc["parts"]
        ]
    except (OSError, ValueError, KeyError):
        return []  # unreadable journal: every partition is suspect


def _check_no_pending(mv_path: str) -> None:
    parts = pending_refresh(mv_path)
    if parts is not None:
        raise RuntimeError(
            f"MV at {mv_path} has an unfinished refresh over partitions "
            f"{parts or '<unknown>'}; run heal_mv(spark, fact, spec, "
            "mv_path) before reading or refreshing"
        )


def _write_intent(mv_path: str, parts: list) -> None:
    """Journal the touched partitions BEFORE the dynamic overwrite —
    the write-ahead intent a crashed refresh leaves behind so recovery
    knows exactly which partitions to recompute. CREATE-EXCLUSIVE
    (link, not rename): two refreshers racing past _check_no_pending's
    read would otherwise both journal and interleave their dynamic
    overwrites into one corrupt MV — the loser must fail HERE, before
    any data write, exactly like VersionedTable's manifest commit. The
    temp file is fully written before the link, so a crash mid-journal
    can't leave a torn intent that reads as valid."""
    import json
    import os
    import uuid

    os.makedirs(mv_path, exist_ok=True)
    target = os.path.join(mv_path, _INTENT)
    tmp = target + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump(
            {"v": 2, "parts": [None if v is None else str(v) for v in parts]},
            f,
        )
    try:
        os.link(tmp, target)  # atomic, FAILS if an intent exists
    except FileExistsError:
        raise RuntimeError(
            f"MV at {mv_path}: another refresh journaled its intent "
            "concurrently; this refresh wrote nothing — retry after it "
            "finishes (or heal_mv if it crashed)"
        ) from None
    finally:
        try:
            os.remove(tmp)
        except OSError:
            pass


def _clear_intent(mv_path: str) -> None:
    import os

    try:
        os.remove(os.path.join(mv_path, _INTENT))
    except OSError:
        pass


_COMMITS = "_commits"


def has_commit(mv_path: str, token: str) -> bool:
    """True iff a delta_refresh carrying `token` fully committed into
    this MV. The foreachBatch idempotence check: `has_commit(mv,
    f"batch_{batch_id}")` before merging a possibly-redelivered batch.

    A token WITHOUT the ready marker does not count (review r12): on
    the bootstrap path the token lands between the data write and
    _READY, so a crash in that window leaves token+data but no ready
    marker. Honoring the bare token would SKIP the redelivered batch
    while the next batch's bootstrap rmtree destroys its data —
    silent loss. Requiring ready makes that interleaving redo the
    bootstrap instead (the aborted dir, token included, is cleared),
    which is idempotent-safe because an unready MV is by definition
    not serveable yet. On the merge path _READY persists from the
    initial build (dynamic overwrite never removes root files), so
    this check degenerates to the plain token test there."""
    import os

    return os.path.isfile(os.path.join(mv_path, _COMMITS, token)) and (
        os.path.isfile(os.path.join(mv_path, _READY))
    )


def _record_commit(mv_path: str, token: str) -> None:
    import os

    d = os.path.join(mv_path, _COMMITS)
    os.makedirs(d, exist_ok=True)
    open(os.path.join(d, token), "w").close()


def _write_partitioned(
    df: DataFrame, spec: MergeableSpec, mv_path: str,
    commit_token: str | None = None,
) -> None:
    (
        df.repartition(F.col(spec.partition_col))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(spec.partition_col)
        .parquet(mv_path)
    )
    # The batch-commit token lands BETWEEN the data write and the
    # ready/intent-clear step, making it part of the MV commit
    # (ADVICE r11 #2): every crash interleaving either leaves the MV
    # not-ready / intent-pending (LOUD — bootstrap rebuilds or heal is
    # demanded) or leaves token + data together — there is no window
    # where the data committed silently without its token, so a
    # redelivered foreachBatch batch can never double-merge. The dual
    # bootstrap hazard — token lands, crash BEFORE the ready marker,
    # redelivery must not skip a batch whose dir the next bootstrap
    # will rmtree — is closed on the READ side: has_commit requires
    # the ready marker (review r12; pinned by
    # test_bootstrap_crash_between_token_and_ready_redoes).
    if commit_token is not None:
        _record_commit(mv_path, commit_token)
    # dynamic-overwrite commits do NOT leave a root _SUCCESS, so the MV
    # carries its own ready marker: its absence means "never completed
    # a build" and delta_refresh must bootstrap, not merge
    import os

    open(os.path.join(mv_path, _READY), "w").close()


def build_mv(fact: DataFrame, spec: MergeableSpec, mv_path: str) -> None:
    """Full build: aggregate the fact once, store partials partitioned
    by spec.partition_col. (Dynamic mode on a fresh path behaves like
    a plain overwrite.)"""
    _write_partitioned(spec.aggregate(fact), spec, mv_path)


def affected_partitions(delta: DataFrame, partition_col: str) -> list:
    """Distinct partition values in the delta. Collected to the driver
    by design: one value per touched partition (e.g. days), bounded by
    the delta's time span, never by row count."""
    return [
        r[0] for r in delta.select(partition_col).distinct().collect()
    ]


def _part_filter(col: F.Column, parts: list) -> F.Column:
    """Null-safe partition membership. `Column.isin` treats NULL as
    unknown, so a NULL partition value in `parts` would silently DROP
    its rows from every scoped read — delta merges would overwrite the
    stored NULL partition with delta-only partials and heal would
    recompute without it (review r8 finding). Accepts either raw
    values or the journal's decoded forms — NULL is Python None in
    BOTH (the journal stores JSON null), so the literal string 'None'
    only ever means a partition actually named 'None' (ADVICE r8)."""
    null_in = any(p is None for p in parts)
    vals = [p for p in parts if p is not None]
    pred = col.isin(vals) if vals else F.lit(False)
    if null_in:
        pred = pred | col.isNull()
    return pred


def delta_refresh(
    spark: SparkSession, delta: DataFrame, spec: MergeableSpec, mv_path: str,
    commit_token: str | None = None,
) -> list:
    """Merge a batch of new fact rows into the MV without touching the
    fact table. Handles late data transparently — a delta row for an
    old partition merges into that partition's stored partials.
    Returns the partition values refreshed.

    `commit_token` (optional) makes the merge IDEMPOTENT per token: a
    token already recorded in the MV returns [] without merging, and a
    fresh token is recorded atomically-enough with the data commit —
    inside the intent-journal window (merge) or before the ready
    marker (bootstrap) — so a crash can never leave merged data
    without its token (ADVICE r11 #2). foreachBatch callers pass
    f"batch_{batch_id}" and get exactly-once merge semantics under
    redelivery with no external marker files."""
    import os
    import shutil

    if commit_token is not None and has_commit(mv_path, commit_token):
        return []  # redelivered batch: already fully committed
    parts = affected_partitions(delta, spec.partition_col)
    if not parts:
        return parts
    if not os.path.isfile(os.path.join(mv_path, _READY)):
        # bootstrap: first delta IS the MV. A dir without the ready
        # marker is an aborted build — clear it so stale partial
        # partitions can't survive next to the fresh ones.
        shutil.rmtree(mv_path, ignore_errors=True)
        _write_partitioned(
            spec.aggregate(delta), spec, mv_path, commit_token=commit_token
        )
        return parts
    _check_no_pending(mv_path)
    old = (
        spark.read.parquet(mv_path)
        .where(_part_filter(F.col(spec.partition_col), parts))  # pruned
        .localCheckpoint(eager=True)  # break lineage: overwriting below
    )
    inc = spec.aggregate(delta)
    merged = spec.merge(old.unionByName(inc))
    # Write-ahead intent: a dynamic overwrite that dies part-way leaves
    # SOME touched partitions merged and others not, with _READY still
    # present — silently serveable. The journal makes the crash loud
    # (reads/refreshes raise) and names the exact partitions heal_mv
    # must recompute from the authoritative fact.
    _write_intent(mv_path, parts)
    _write_partitioned(merged, spec, mv_path, commit_token=commit_token)
    _clear_intent(mv_path)
    return parts


def recompute_refresh(
    spark: SparkSession,
    fact: DataFrame,
    delta: DataFrame,
    spec: MergeableSpec,
    mv_path: str,
    agg_fn=None,
) -> list:
    """General-aggregate path: recompute the touched partitions from
    fact ∪ delta (a partition-pruned fact scan), dynamic-overwrite
    them. agg_fn(rows) -> partial rows defaults to spec.aggregate —
    pass a custom one for non-mergeable aggregates; its output must be
    partitioned by spec.partition_col."""
    parts = affected_partitions(delta, spec.partition_col)
    if not parts:
        return parts
    _check_no_pending(mv_path)
    scoped = (
        fact.unionByName(delta)
        .where(_part_filter(F.col(spec.partition_col), parts))
    )
    out = (agg_fn or spec.aggregate)(scoped)
    _write_intent(mv_path, parts)
    _write_partitioned(out, spec, mv_path)
    _clear_intent(mv_path)
    return parts


def read_mv(spark: SparkSession, spec: MergeableSpec, mv_path: str) -> DataFrame:
    """User-facing view of the MV (partials finalized to values).
    Refuses to serve an MV with an unfinished refresh (see heal_mv)."""
    _check_no_pending(mv_path)
    return spec.finalize(spark.read.parquet(mv_path))


def rollup_mv(
    spark: SparkSession,
    spec: MergeableSpec,
    mv_path: str,
    by: list[str],
    where=None,
) -> DataFrame:
    """Answer a coarser-grain query from stored partials alone: filter
    partitions (partition-pruned when `where` hits partition_col),
    merge the monoid partials grouped by `by`, finalize. A
    distinct-users-last-quarter query touches ~90 partials per group —
    never the fact table. (HLL register-max merge makes even distinct
    counts roll up; pinned equal to a single-shot sketch in tests.)"""
    _check_no_pending(mv_path)
    p = spark.read.parquet(mv_path)
    if where is not None:
        p = p.where(where)
    return spec.finalize(spec.merge(p, keys=by), keys=by)


def heal_mv(
    spark: SparkSession,
    fact: DataFrame,
    spec: MergeableSpec,
    mv_path: str,
    agg_fn=None,
) -> list:
    """Recover from a refresh that died mid-overwrite: recompute the
    partitions the intent journal names from the AUTHORITATIVE fact
    table and clear the journal. Recomputation REPLACES the suspect
    partitions wholesale, so healing is idempotent — running it twice,
    or after a crash during healing itself, converges to the same
    state. An unreadable journal recomputes every fact partition (the
    full-rebuild fallback). No-op (returns []) when nothing is
    pending. This is the lambda-architecture repair contract: the MV
    is always re-derivable from the fact, and the journal bounds how
    much of it must be re-derived."""
    parts = pending_refresh(mv_path)
    if parts is None:
        return []
    scoped = fact
    if parts:  # [] = torn journal: every partition suspect
        scoped = fact.where(
            _part_filter(F.col(spec.partition_col).cast("string"), parts)
        )
    out = (agg_fn or spec.aggregate)(scoped).persist()
    try:
        recomputed = {
            None if r[0] is None else str(r[0])
            for r in out.select(spec.partition_col).distinct().collect()
        }
        _write_partitioned(out, spec, mv_path)
    finally:
        out.unpersist()
    # Dynamic overwrite only REPLACES partitions present in the
    # recomputed output. A journaled partition with ZERO fact rows now
    # (the crashed delta carried a brand-new partition, or fact rows
    # were erased since) would keep its suspect half-written files on
    # disk while the journal is cleared — delete those directories
    # explicitly before declaring the MV healed (ADVICE r7).
    _drop_stale_partitions(mv_path, spec.partition_col, parts, recomputed)
    _clear_intent(mv_path)
    return parts if parts else ["<all>"]


def _drop_stale_partitions(
    mv_path: str, col: str, suspects: list, recomputed: set
) -> None:
    """Remove on-disk partition dirs that are suspect (journaled, or
    all of them for a torn journal) but absent from the healed
    recomputation. Directory names are Hive-escaped (%XX); matching
    decodes the existing names rather than re-implementing escaping."""
    import os
    import shutil
    from urllib.parse import unquote

    prefix = f"{col}="
    try:
        entries = os.listdir(mv_path)
    except OSError:
        return
    for entry in entries:
        if not entry.startswith(prefix):
            continue
        value = unquote(entry[len(prefix):])
        if value == "__HIVE_DEFAULT_PARTITION__":
            # Spark's dir name for a NULL partition value; `recomputed`
            # and the journal carry Python None for NULL — translate
            # before comparing or a freshly healed null partition would
            # read as stale and be deleted (review r8 finding). A
            # partition literally named 'None' keeps its string form.
            value = None
        if value in recomputed:
            continue
        if suspects and value not in suspects:
            continue  # not journaled: untouched, keep
        shutil.rmtree(os.path.join(mv_path, entry), ignore_errors=True)


def hist_quantile(
    hist_col: str, q: float, lo: float, hi: float, n_buckets: int
) -> F.Column:
    """Quantile estimate from an equi-width count-histogram array
    (the hist_cols partial): find the first cell whose cumulative
    count reaches ceil(q·total) and return its UPPER edge. Pure
    integer walk over the array (two JVM higher-order aggregates —
    no UDF, no shuffle), so the estimate is bit-identical across
    engines; for in-range data it is within one bucket width of the
    exact quantile (the true value lies inside the chosen cell).
    Underflow reports lo, overflow hi."""
    width = (hi - lo) / n_buckets
    total = F.aggregate(
        F.col(hist_col), F.lit(0).cast("long"), lambda a, x: a + x
    )
    target = F.ceil(total * F.lit(q)).cast("long")
    # walk: acc = (cum, idx, found) — found = first cell reaching target
    found = F.aggregate(
        F.col(hist_col),
        F.struct(
            F.lit(0).cast("long").alias("cum"),
            F.lit(0).cast("int").alias("idx"),
            F.lit(-1).cast("int").alias("found"),
        ),
        lambda acc, x: F.struct(
            (acc["cum"] + x).alias("cum"),
            (acc["idx"] + 1).alias("idx"),
            F.when(acc["found"] >= 0, acc["found"])
            .when(acc["cum"] + x >= target, acc["idx"])
            .otherwise(F.lit(-1))
            .alias("found"),
        ),
        lambda acc: acc["found"],
    )
    # cell 0 = underflow → lo; cells 1..n → lo + cell·width; n+1 → hi
    return (
        F.when(found <= 0, F.lit(lo))
        .when(found >= n_buckets + 1, F.lit(hi))
        .otherwise(F.lit(lo) + found.cast("double") * F.lit(width))
    )
