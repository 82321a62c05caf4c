"""functions/text.py unit tests on constructed strings."""

from __future__ import annotations

from pyspark.sql import functions as F

from batch_processing_etl_orchestration_spark.functions.text import (
    argmax_label,
    char_bigram_hits,
    char_bigrams,
    normalized_fingerprint,
    quality_score,
    regex_token_count,
    stopword_hits,
    uniq_token_ratio,
    ws_token_count,
)


def _one(spark, text, expr):
    df = spark.createDataFrame([(text,)], "text STRING")
    return df.select(expr.alias("v")).collect()[0]["v"]


def test_token_counts(spark):
    assert _one(spark, "a b c", ws_token_count("text")) == 3
    # 'ab3!' → [ab][3][!] + [cd] = 4
    assert _one(spark, "ab3! cd", regex_token_count("text")) == 4


def test_uniq_ratio(spark):
    assert _one(spark, "a a b b", uniq_token_ratio("text")) == 0.5


def test_quality_score_bounds(spark):
    long_diverse = " ".join(f"w{i}" for i in range(40))  # >100 chars, 40 uniq tokens
    assert _one(spark, long_diverse, quality_score("text")) == 3
    # short text fails length+token floors but is trivially "diverse"
    assert _one(spark, "tiny", quality_score("text")) == 1
    assert _one(spark, "a a a a a a a a", quality_score("text")) == 0  # ratio 1/8 < 0.15


def test_stopword_hits_multiplicity(spark):
    assert _one(spark, "the cat the dog", stopword_hits("text", ["the"])) == 2


def test_char_bigrams(spark):
    assert _one(spark, "abc", char_bigrams("text")) == ["ab", "bc"]
    assert _one(spark, "ththth", char_bigram_hits("text", ["th"])) == 3


def test_argmax_tiebreak_order(spark):
    df = spark.createDataFrame([(1, 1, 0)], "a INT, b INT, c INT")
    # a and b tie — first key in dict order wins
    pred = argmax_label({"a": "a", "b": "b", "c": "c"})
    assert df.select(pred.alias("p")).collect()[0]["p"] == "a"


def test_normalized_fingerprint_case_insensitive(spark):
    df = spark.createDataFrame([("en", "Hello"), ("en", "hello")], "lang STRING, text STRING")
    fps = [r["f"] for r in df.select(normalized_fingerprint("text", "lang").alias("f")).collect()]
    assert fps[0] == fps[1]


def test_redact_pii_replaces_and_counts(spark):
    from pyspark.sql import functions as F

    from batch_processing_etl_orchestration_spark.functions.text import (
        pii_counts,
        redact_pii,
    )

    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@ex-ample.co.uk or x@y.io, call 123-456-7890"),
            (2, "no pii here, 12-34 is not a phone and a@b is not a mail"),
        ],
        "id LONG, t STRING",
    )
    n_e, n_p = pii_counts("t")
    rows = {
        r["id"]: r
        for r in df.select(
            "id", n_e.alias("e"), n_p.alias("p"), redact_pii("t").alias("red")
        ).collect()
    }
    assert (rows[1]["e"], rows[1]["p"]) == (2, 1)
    assert rows[1]["red"] == "mail [EMAIL] or [EMAIL], call [PHONE]"
    assert (rows[2]["e"], rows[2]["p"]) == (0, 0)
    assert rows[2]["red"] == "no pii here, 12-34 is not a phone and a@b is not a mail"


def test_pack_sequences_invariants(spark, sf_dir):
    """Packing invariants: every doc lands in exactly one bin, bins
    never exceed the budget except single-doc oversized bins, and
    bin indexes are dense per packer."""
    from pyspark.sql import functions as F

    from batch_processing_etl_orchestration_spark.plans.northstar import (
        _PACK_BUDGET,
        q_pack_sequences,
    )
    from batch_processing_etl_orchestration_spark.tables import load_table

    bins = q_pack_sequences(spark, sf_dir).collect()
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    n_docs = d.count()
    total_tokens = d.agg(F.sum("n_tokens")).first()[0]
    assert sum(r["n_docs"] for r in bins) == n_docs  # nothing lost
    assert sum(r["total_tokens"] for r in bins) == total_tokens
    for r in bins:
        if r["total_tokens"] > _PACK_BUDGET:
            assert r["n_docs"] == 1  # only an oversized doc may overflow
    by_packer = {}
    for r in bins:
        by_packer.setdefault(r["packer"], []).append(r["bin_idx"])
    for packer, idxs in by_packer.items():
        assert sorted(idxs) == list(range(len(idxs)))  # dense 0..k-1
    # packing is worthwhile: bins are mostly full (waste < 50%)
    n_bins = len(bins)
    assert n_bins * _PACK_BUDGET < 2 * total_tokens + n_bins  # avg fill > 50%


def test_corpus_assembly_stages_bind(spark, sf_dir):
    """The assembly pipeline must be non-vacuous at every stage:
    dedup, decontamination, the length band, and the temperature mix
    each remove something on the fixture, and the final bins respect
    the budget invariants."""
    from pyspark.sql import functions as F

    from batch_processing_etl_orchestration_spark.plans.northstar import (
        _PACK_BUDGET,
        q_corpus_assembly,
    )
    from batch_processing_etl_orchestration_spark.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    n_train = d.where(F.col("doc_id") % 20 != 0).count()
    bins = q_corpus_assembly(spark, sf_dir).collect()
    assert len(bins) > 0
    n_packed = sum(r["n_docs"] for r in bins)
    # every stage binds: the assembled corpus is a strict subset
    assert 0 < n_packed < n_train
    for r in bins:
        if r["total_tokens"] > _PACK_BUDGET:
            assert r["n_docs"] == 1


def test_pack_sequences_streams_across_batches(spark, sf_dir):
    """The packing walk must be a TRUE stream: results identical when
    every packer group is split across many tiny Arrow batches (so the
    walk's carry-over state crosses batch boundaries constantly) and
    when the shuffle partition count changes. This is the pin against
    re-introducing a full-group materialization — with
    maxRecordsPerBatch=7 a ~600-doc fixture group arrives in ~90
    separate batches, and only O(1) open-bin state can survive that."""
    from batch_processing_etl_orchestration_spark.plans.northstar import (
        q_pack_sequences,
    )

    def snapshot():
        rows = q_pack_sequences(spark, sf_dir).collect()
        return sorted(
            (
                r["packer"],
                r["bin_idx"],
                r["n_docs"],
                r["total_tokens"],
                r["first_doc_id"],
            )
            for r in rows
        )

    baseline = snapshot()
    assert len(baseline) > 10
    conf = spark.conf
    old_batch = conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    old_parts = conf.get("spark.sql.shuffle.partitions")
    try:
        conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
        conf.set("spark.sql.shuffle.partitions", "3")
        assert snapshot() == baseline
    finally:
        conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old_batch)
        conf.set("spark.sql.shuffle.partitions", old_parts)
