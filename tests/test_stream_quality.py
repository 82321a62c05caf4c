"""q_stream_quality_filter — streaming model-based quality gate
(VERDICT r12 #3): frozen-weight scoring over micro-batches with an
atomic-rename replay marker. The drained-vs-batch hash equality is the
oracle's job (tests/test_queries_vs_duckdb.py); this file pins the
sink's exactly-once contract and the frozen model's batch parity."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from batch_processing_etl_orchestration_spark.plans.northstar import (
    _nb_train_capped,
    nb_score_frozen,
    nb_stream_sink,
    q_nb_quality_classifier,
)
from batch_processing_etl_orchestration_spark.tables import load_table


def test_replayed_batch_is_skipped(spark, sf_dir, tmp_path):
    """foreachBatch redelivery (retry, checkpoint loss): the same
    batch id must not rewrite its directory — even when the
    redelivered CONTENT differs, the first atomic commit wins."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    head, weights, prior6 = _nb_train_capped(spark, docs)
    out = str(tmp_path / "scores")
    os.makedirs(out)
    sink = nb_stream_sink(out, head, weights, prior6)

    first = docs.select("doc_id", "text").where(F.col("doc_id") < 100)
    sink(first, 0)
    d0 = os.path.join(out, "batch_0")
    assert os.path.isdir(d0)
    rows1 = {
        r["doc_id"]: r["log_odds"]
        for r in spark.read.parquet(d0).collect()
    }
    mtime1 = os.stat(d0).st_mtime_ns

    # redeliver batch 0 with DIFFERENT content: must be a no-op
    sink(docs.select("doc_id", "text").where(F.col("doc_id") >= 100), 0)
    assert os.stat(d0).st_mtime_ns == mtime1
    rows2 = {
        r["doc_id"]: r["log_odds"]
        for r in spark.read.parquet(d0).collect()
    }
    assert rows1 == rows2

    # a NEW batch id still lands, and no _tmp litter survives
    sink(docs.select("doc_id", "text").where(F.col("doc_id") >= 100), 1)
    assert os.path.isdir(os.path.join(out, "batch_1"))
    assert not [d for d in os.listdir(out) if d.startswith("_tmp-")]


def test_frozen_scoring_matches_batch_estimator(spark, sf_dir):
    """Scoring the whole corpus in ONE call with the frozen collected
    model must reproduce the batch estimator row for row — the
    literal-reinjection round trip (train → collect → re-plan) loses
    nothing."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    head, weights, prior6 = _nb_train_capped(spark, docs)
    frozen = {
        r["doc_id"]: (r["n_tokens"], r["log_odds"], r["pred_pos"])
        for r in nb_score_frozen(
            spark, docs.select("doc_id", "text"), head, weights, prior6
        ).collect()
    }
    batch = {
        r["doc_id"]: (r["n_tokens"], r["log_odds"], r["pred_pos"])
        for r in q_nb_quality_classifier(spark, sf_dir).collect()
    }
    assert frozen == batch and len(frozen) > 0
