"""operators/frequent.py — two-phase exact heavy hitters.

The sf fixtures' vocabularies are small and near-uniform (31 words),
so MG eviction is exercised on a deterministic Zipf stream:
word = floor(N/(id+1)) gives count(v) ≈ N/(v(v+1)) — a fat head, a
long tail, no RNG.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from batch_processing_etl_orchestration_spark.operators.frequent import (
    candidate_keys,
    heavy_hitters,
    top_k_certified,
)
from batch_processing_etl_orchestration_spark.tables import load_table

N = 50_000


@pytest.fixture(scope="module")
def zipf(spark):
    return (
        spark.range(0, N)
        .select(
            F.concat(F.lit("w"), F.floor(F.lit(N) / (F.col("id") + 1))).alias("word")
        )
        .repartition(8)
        .localCheckpoint(eager=True)
    )


def _exact_top(df, k):
    return (
        df.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("word")).limit(k).collect()
    )


def test_zipf_certified_exact_with_eviction(spark, zipf):
    """capacity 256 < vocab (~450): per-partition MG genuinely evicts,
    yet the head clears the n/capacity bar → certified, and the
    recounted top-10 equals the exact full-shuffle answer."""
    vocab = zipf.distinct().count()
    assert vocab > 256, "fixture must exceed capacity to engage eviction"
    got, certified = top_k_certified(zipf, "word", 10, capacity=256)
    assert certified
    assert [tuple(r) for r in got.collect()] == [
        tuple(r) for r in _exact_top(zipf, 10)
    ]


def test_fixture_words_certified_exact(spark, sf_dir):
    """Fixture words (k=10, cap=64): certified and exact — the shape
    q_heavy_hitters_words attests through the driver gate."""
    w = load_table(spark, sf_dir, "documents").select(
        F.explode(F.split("text", " ")).alias("word")
    )
    got, certified = top_k_certified(w, "word", 10, capacity=64)
    assert certified
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in _exact_top(w, 10)]


def test_candidate_volume_bounded(spark, zipf):
    """Phase 1 emits ≤ capacity keys per partition — candidates, not
    the key space."""
    cap = 32
    n_cands = candidate_keys(zipf, "word", capacity=cap).count()
    assert n_cands <= cap * 8
    assert n_cands < zipf.distinct().count()


def test_superset_guarantee_adversarial(spark):
    """Uniform noise + one genuinely heavy key at tiny capacity: the
    heavy key must survive (count > n/capacity ⇒ in candidates) and
    recount exactly."""
    base = spark.range(0, 20_000).select(
        F.concat(F.lit("u"), (F.col("id") % 5000)).alias("word")
    )
    heavy = spark.range(0, 2_000).select(F.lit("HOT").alias("word"))
    df = base.unionByName(heavy).repartition(8)
    rows = heavy_hitters(df, "word", 1, capacity=16).collect()
    assert rows[0]["word"] == "HOT" and rows[0]["n"] == 2_000


def test_uncertified_when_bar_not_cleared(spark):
    """All-uniform data at k beyond the bar: certification must
    honestly report False (the result may still be right, but the MG
    bound can't prove it)."""
    df = spark.range(0, 8_000).select(
        F.concat(F.lit("u"), (F.col("id") % 4000)).alias("word")
    ).repartition(4)
    _, certified = top_k_certified(df, "word", 10, capacity=8)
    assert not certified
