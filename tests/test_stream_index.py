"""Streaming index maintenance (q_stream_index_maintain, VERDICT r13
#3): exactly-once segment landing under redelivery, and tombstones
honored mid-drain."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from batch_processing_etl_orchestration_spark.operators.retrieval import (
    PostingsIndex,
)
from batch_processing_etl_orchestration_spark.plans.northstar import (
    index_stream_sink,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id BIGINT, text STRING")


def _served(idx):
    return {r["doc_id"] for r in idx.doclens().select("doc_id").collect()}


def test_redelivered_batch_is_noop(spark, tmp_path):
    """Replay of a committed batch id must change nothing — before
    AND after a compaction folds the segment away (then the landing
    protocol's 'already live' rejection is the committed signal)."""
    path = str(tmp_path / "sidx")
    PostingsIndex.build(
        spark, _docs(spark, []), path
    )
    sink = index_stream_sink(path)
    b0 = _docs(spark, [(1, "hash join"), (2, "scan filter")])
    sink(b0, 0)
    snap = sorted(
        tuple(r)
        for r in PostingsIndex(spark, path).postings().collect()
    )
    sink(b0, 0)  # checkpoint-retry replay: segment dir exists
    idx = PostingsIndex(spark, path)
    assert sorted(tuple(r) for r in idx.postings().collect()) == snap

    # fold the segment into the base, then replay again: the segment
    # dir is gone but the ids are live — still a no-op
    idx.delete_docs(spark.createDataFrame([(999,)], "doc_id BIGINT"))
    idx.compact_segments()
    assert idx._segment_dirs() == []
    sink(b0, 0)
    assert sorted(tuple(r) for r in idx.postings().collect()) == snap


def test_middrain_tombstones_honored(spark, tmp_path):
    """A delete landing BETWEEN micro-batches: later batches still
    ingest, the dead ids stay hidden through the rest of the drain
    and through compaction, and a batch carrying a tombstoned id is
    a REAL conflict (propagates, not swallowed as replay)."""
    path = str(tmp_path / "sidx2")
    PostingsIndex.build(spark, _docs(spark, []), path)
    sink = index_stream_sink(path)
    sink(_docs(spark, [(1, "hash join"), (2, "scan scan")]), 0)

    idx = PostingsIndex(spark, path)
    idx.delete_docs(spark.createDataFrame([(2,)], "doc_id BIGINT"))

    sink(_docs(spark, [(3, "join filter"), (4, "hash probe")]), 1)
    assert _served(PostingsIndex(spark, path)) == {1, 3, 4}

    # a batch redelivering the TOMBSTONED id is a conflict the sink
    # must surface, not a replay to swallow
    with pytest.raises(ValueError, match="tombstoned"):
        sink(_docs(spark, [(2, "scan scan")]), 7)

    idx.compact_segments()
    assert _served(PostingsIndex(spark, path)) == {1, 3, 4}
    # and the pipeline keeps ingesting after the fold
    sink(_docs(spark, [(9, "merge sort")]), 2)
    assert _served(PostingsIndex(spark, path)) == {1, 3, 4, 9}


def test_partial_overlap_batch_fails_loudly(spark, tmp_path):
    """'already live' is only a committed replay when EVERY batch id
    is live. A batch re-emitting one old doc alongside a fresh one
    (at-least-once source weirdness) must fail the stream — swallowing
    it would silently lose the fresh doc (review r14)."""
    path = str(tmp_path / "sidx3")
    PostingsIndex.build(spark, _docs(spark, []), path)
    sink = index_stream_sink(path)
    sink(_docs(spark, [(1, "hash join"), (2, "scan scan")]), 0)

    # full replay with a DIFFERENT batch id after a compaction fold:
    # every id live -> committed, no-op
    idx = PostingsIndex(spark, path)
    idx.delete_docs(spark.createDataFrame([(999,)], "doc_id BIGINT"))
    idx.compact_segments()
    sink(_docs(spark, [(1, "hash join"), (2, "scan scan")]), 5)
    assert _served(PostingsIndex(spark, path)) == {1, 2}

    # partial overlap: id 1 live, id 30 fresh -> must raise
    with pytest.raises(ValueError, match="already live"):
        sink(_docs(spark, [(1, "hash join"), (30, "merge sort")]), 6)
    assert 30 not in _served(PostingsIndex(spark, path))


def test_folded_then_deleted_batch_replay_does_not_resurrect(
    spark, tmp_path
):
    """ADVICE r14: a batch lands, its docs are tombstoned, a
    compaction folds BOTH the segment marker and the tombstones —
    then the checkpoint replays the batch. Without the cumulative
    committed_segments ledger the replay re-lands the batch and
    resurrects the deleted docs; with it the name is known-committed
    and the replay no-ops."""
    path = str(tmp_path / "sidx4")
    PostingsIndex.build(spark, _docs(spark, []), path)
    sink = index_stream_sink(path)
    sink(_docs(spark, [(1, "hash join"), (2, "scan scan")]), 0)
    sink(_docs(spark, [(10, "merge sort"), (11, "sort spill")]), 1)

    idx = PostingsIndex(spark, path)
    idx.delete_docs(
        spark.createDataFrame([(10,), (11,)], "doc_id BIGINT")
    )
    idx.compact_segments()  # folds batch-1's marker AND its tombstones
    assert _served(PostingsIndex(spark, path)) == {1, 2}

    sink(_docs(spark, [(10, "merge sort"), (11, "sort spill")]), 1)
    assert _served(PostingsIndex(spark, path)) == {1, 2}  # stays deleted

    # the ledger survives FURTHER compactions (carried forward)
    idx2 = PostingsIndex(spark, path)
    idx2.delete_docs(spark.createDataFrame([(999,)], "doc_id BIGINT"))
    idx2.compact_segments()
    sink(_docs(spark, [(10, "merge sort"), (11, "sort spill")]), 1)
    assert _served(PostingsIndex(spark, path)) == {1, 2}

    # direct add_segment with a folded name is the loud signature
    import pytest as _pytest

    with _pytest.raises(FileExistsError, match="already\\s+committed"):
        PostingsIndex(spark, path).add_segment(
            _docs(spark, [(50, "fresh doc")]), "batch-1"
        )


def test_empty_batch_lands_no_segment(spark, tmp_path):
    """Empty micro-batches are routine; landing one would write a
    _SUCCESS-only partitioned store that breaks later reads (ADVICE
    r14). The landing protocol no-ops instead — no marker, no dir."""
    path = str(tmp_path / "sidx5")
    PostingsIndex.build(spark, _docs(spark, []), path)
    sink = index_stream_sink(path)
    sink(_docs(spark, []), 0)
    idx = PostingsIndex(spark, path)
    assert idx._segment_dirs() == []
    sink(_docs(spark, [(1, "hash join")]), 1)
    assert _served(PostingsIndex(spark, path)) == {1}


def test_streamed_impact_index_serving_and_geometry(spark):
    """VERDICT r14 #6: after the streamed-impact drain, (a) block-max
    serving over the SEGMENTED index equals the full posting walk
    bit-for-bit, (b) the four segments mint DISJOINT blk ranges, and
    (c) the prune report still drops blocks (per-segment maxima stay
    discriminative)."""
    import os

    from batch_processing_etl_orchestration_spark.operators.retrieval import (
        bm25_topk,
        bm25_topk_blockmax,
    )
    from batch_processing_etl_orchestration_spark.plans.northstar import (
        _BM25_TERMS,
        q_stream_index_maintain_impact,
    )
    from batch_processing_etl_orchestration_spark.tables import (
        fixture_cache_dir,
    )

    sf = "/root/testdata/sf0.01"
    rep = q_stream_index_maintain_impact(spark, sf).first()
    assert rep["n_blocks_kept"] <= rep["n_blocks_total"]
    assert rep["n_postings_bound_kept"] <= rep["n_postings_kept"]

    path = os.path.join(
        fixture_cache_dir(sf, "documents.parquet", "stream_idximp_run"),
        "index",
    )
    idx = PostingsIndex(spark, path)
    segs = idx._segment_dirs()
    assert len(segs) == 4
    spans = []
    for s in segs:
        r = (
            spark.read.parquet(os.path.join(s, "doclens"))
            .agg(F.min("blk").alias("lo"), F.max("blk").alias("hi"))
            .first()
        )
        spans.append((int(r["lo"]), int(r["hi"])))
    spans.sort()
    for (lo_a, hi_a), (lo_b, _) in zip(spans, spans[1:]):
        assert hi_a < lo_b  # disjoint blk ranges across segments

    served = bm25_topk_blockmax(idx, _BM25_TERMS, k=15)
    full = bm25_topk(idx.postings(), idx.doclens(), _BM25_TERMS, k=15)
    assert [tuple(r) for r in served.collect()] == [
        tuple(r) for r in full.collect()
    ]


def test_maybe_compact_threshold_policy(spark, tmp_path):
    """VERDICT r14 #4: maybe_compact is the documented ingest-path
    trigger — no-op below the fan-out threshold, a full fold at it."""
    path = str(tmp_path / "sidx_pol")
    PostingsIndex.build(spark, _docs(spark, []), path)
    idx = PostingsIndex(spark, path)
    for i in range(3):
        idx.add_segment(_docs(spark, [(10 + i, "hash join")]), f"b-{i}")
    assert idx.maybe_compact(max_segments=4) == 0
    assert len(idx._segment_dirs()) == 3
    idx.add_segment(_docs(spark, [(20, "scan filter")]), "b-3")
    assert idx.maybe_compact(max_segments=4) == 4
    assert idx._segment_dirs() == []
    assert _served(PostingsIndex(spark, path)) == {10, 11, 12, 20}


def test_compaction_restores_one_shot_prune_geometry(spark):
    """VERDICT r14 #4: compacting a segmented impact index re-blocks
    GLOBALLY — the nine-column prune report (block count, seed set, θ,
    kept/candidate, bound-kept) becomes IDENTICAL to a one-shot
    impact build over the same corpus, proving the merge policy fully
    restores the one-shot pruning geometry."""
    import tempfile

    from batch_processing_etl_orchestration_spark.plans.northstar import (
        _blockmax_report,
    )
    from batch_processing_etl_orchestration_spark.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents").select(
        "doc_id", "text"
    )
    with tempfile.TemporaryDirectory() as td:
        seg_path, one_path = f"{td}/seg", f"{td}/one"
        PostingsIndex.build(
            spark,
            spark.createDataFrame([], "doc_id BIGINT, text STRING"),
            seg_path,
            impact_ordered=True,
        )
        idx_seg = PostingsIndex(spark, seg_path)
        for b in range(4):
            idx_seg.add_segment(
                docs.where(F.pmod(F.col("doc_id"), F.lit(4)) == b),
                f"batch-{b}",
            )
        def blkmap(i):
            return {
                (r["doc_id"], r["blk"])
                for r in i.doclens().select("doc_id", "blk").collect()
            }

        PostingsIndex.build(spark, docs, one_path, impact_ordered=True)
        idx_one = PostingsIndex(spark, one_path)
        rep_one = _blockmax_report(spark, idx_one).first().asDict()
        # segmented geometry differs from one-shot (per-segment
        # histograms, disjoint bases); at this fixture scale the
        # REPORT can coincide (all blocks kept), so pin the divergence
        # on the doc→blk assignment itself
        assert blkmap(idx_seg) != blkmap(idx_one)

        assert idx_seg.compact_segments() == 4
        # global re-block: assignment AND report equal the one-shot's
        assert blkmap(idx_seg) == blkmap(idx_one)
        rep_after = _blockmax_report(spark, idx_seg).first().asDict()
        assert rep_after == rep_one


def test_rebuild_carries_committed_ledger(spark, tmp_path):
    """Review r15: a fresh build() on a live index (the documented
    retrain workflow) must carry the committed-segments ledger — and
    the still-live segment names — forward, or a checkpoint replay of
    a batch deleted before the rebuild re-lands it (the ADVICE r14
    resurrection through the retrain door)."""
    path = str(tmp_path / "sidx_rb")
    PostingsIndex.build(spark, _docs(spark, []), path)
    sink = index_stream_sink(path)
    sink(_docs(spark, [(1, "hash join"), (2, "scan scan")]), 0)
    sink(_docs(spark, [(10, "merge sort"), (11, "sort spill")]), 1)

    idx = PostingsIndex(spark, path)
    idx.delete_docs(
        spark.createDataFrame([(10,), (11,)], "doc_id BIGINT")
    )
    idx.compact_segments()  # ledger: batch-0, batch-1
    # land one MORE batch that stays a live segment across the rebuild
    sink(_docs(spark, [(20, "hash probe")]), 2)

    # the retrain: rebuild from the surviving corpus on the same path
    PostingsIndex.build(spark, _docs(spark, [(1, "hash join"), (2, "scan scan"), (20, "hash probe")]), path)

    # replay of the deleted-and-folded batch: must NOT resurrect
    sink(_docs(spark, [(10, "merge sort"), (11, "sort spill")]), 1)
    assert _served(PostingsIndex(spark, path)) == {1, 2, 20}
    # replay of the live-at-rebuild batch: write identity spent too
    sink(_docs(spark, [(20, "hash probe"), (21, "fresh doc")]), 2)
    assert 21 not in _served(PostingsIndex(spark, path))
