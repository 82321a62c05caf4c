"""Edge semantics of the round-3 composite queries, on purpose-built
fixtures: funnel milestone ordering must be strict (a click BEFORE the
first view does not convert), and canonical-survivor selection must
tiebreak deterministically when cluster members tie on length."""

from __future__ import annotations

from batch_processing_etl_orchestration_spark.plans.analytics import q_events_funnel
from batch_processing_etl_orchestration_spark.plans.northstar import (
    q_dedup_keep_canonical,
)

HOUR_NS = 3_600 * 1_000_000_000


def _write_events(spark, path, rows):
    spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts long"
    ).write.parquet(f"{path}/events.parquet")


def test_funnel_strict_milestone_ordering(spark, tmp_path):
    sf = str(tmp_path)
    _write_events(
        spark,
        sf,
        [
            # user 1: click BEFORE first view -> that click cannot count;
            # the purchase then has no qualifying click -> not converted
            (1, 1, "click", 0 * HOUR_NS),
            (2, 1, "view", 1 * HOUR_NS),
            (3, 1, "purchase", 2 * HOUR_NS),
            # user 2: proper view -> click -> purchase chain
            (4, 2, "view", 0 * HOUR_NS),
            (5, 2, "click", 1 * HOUR_NS),
            (6, 2, "purchase", 2 * HOUR_NS),
            # user 3: clicks only, never views -> absent from the funnel
            (7, 3, "click", 0 * HOUR_NS),
        ],
    )
    out = {r["user_id"]: r for r in q_events_funnel(spark, sf).collect()}
    assert set(out) == {1, 2}
    assert out[1]["first_click"] is None
    assert out[1]["first_purchase"] is None
    assert not out[1]["converted"]
    assert out[2]["converted"]
    assert out[2]["first_purchase"] is not None


def test_keep_canonical_length_tiebreak(spark, tmp_path):
    sf = str(tmp_path)
    dup = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    uniq = "one two three four five six seven eight nine ten"
    spark.createDataFrame(
        [
            (1, dup, "en", "s", len(dup)),
            (2, dup, "en", "s", len(dup)),  # identical length -> doc_id tiebreak
            (3, uniq, "en", "s", len(uniq)),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{sf}/documents.parquet")
    rows = {r["comp_id"]: r for r in q_dedup_keep_canonical(spark, sf).collect()}
    assert rows[1]["keep_doc_id"] == 1 and rows[1]["cluster_size"] == 2
    assert rows[3]["keep_doc_id"] == 3 and rows[3]["cluster_size"] == 1
