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
