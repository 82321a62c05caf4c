"""Gopher heuristic quality rules (VERDICT r12 #4): per-doc quarantine
semantics on adversarial documents that trip each rule — the fixture
corpus only exercises word-count/stopwords, so this pins the rest."""

from __future__ import annotations

from batch_processing_etl_orchestration_spark.operators.expectations import (
    split_expectations,
    stamp_violations,
)
from batch_processing_etl_orchestration_spark.plans.northstar import (
    _gopher_features,
    gopher_rules,
)

# one passing doc plus one violator per rule; every violator still
# satisfies the rules it is not targeting (20+ words, stopwords, etc.)
_PASS = (
    "the quick brown fox jumps of and to in is "
    + " ".join(f"word{i}" for i in range(20))
)
_FILLER = " ".join(f"w{i}x" for i in range(30))  # 3-char alpha words
_DOCS = [
    (1, _PASS, None),
    (2, "the of one short document", "gopher_word_count"),  # 5 words
    (3, "the of " + " ".join(["a"] * 40), "gopher_mean_word_length"),
    (4, "the of " + " ".join(["####"] * 4) + " " + _FILLER,
     "gopher_symbol_ratio"),
    (5, "\n".join(["- bullet the of line"] * 10) + "\n" + _FILLER,
     "gopher_bullet_lines"),
    # the 9 ellipses are also symbols, so the symbol-ratio rule
    # legitimately co-fires — both are listed as expected
    (6, "\n".join(["the of line ends..."] * 9) + "\n" + _FILLER,
     "gopher_ellipsis_lines|gopher_symbol_ratio"),
    (7, "the of " + " ".join(["12345"] * 30), "gopher_alpha_words"),
    (8, _FILLER, "gopher_stopwords"),  # long enough, no stopwords
]


def _feat(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t, _r in _DOCS], "doc_id BIGINT, text STRING"
    )
    return _gopher_features(docs, keep=("doc_id",))


def test_adversarial_docs_trip_their_rule(spark):
    stamped = stamp_violations(_feat(spark), gopher_rules())
    broken = {
        r["doc_id"]: set(r["violated_rules"])
        for r in stamped.select("doc_id", "violated_rules").collect()
    }
    for doc_id, _text, rule in _DOCS:
        if rule is None:
            assert broken[doc_id] == set(), broken[doc_id]
        else:
            # the targeted rule(s) fire, and so does the keep conjunction
            expected = set(rule.split("|"))
            assert expected <= broken[doc_id], (doc_id, rule, broken[doc_id])
            assert "gopher_keep" in broken[doc_id]
            assert broken[doc_id] == expected | {"gopher_keep"}, (
                doc_id,
                broken[doc_id],
            )


def test_quarantine_split_matches_keep_rule(spark):
    """split_expectations' good/bad partition must agree with the
    gopher_keep conjunction: good = docs violating nothing."""
    rules = {
        k: v for k, v in gopher_rules().items() if k != "gopher_keep"
    }
    good, bad = split_expectations(_feat(spark), rules)
    assert {r["doc_id"] for r in good.select("doc_id").collect()} == {1}
    assert good.count() + bad.count() == len(_DOCS)
