"""Bench-only raw-kernel variants (VERDICT r3 #1).

The registered q_simhash_pairs / q_ann_*_topk queries are ATTESTATION
variants: they recompute an exact twin (full n-gram-Jaccard pair set,
brute-force top-k) in-query so the DuckDB oracle can hash-check a
recall floor. That is the right correctness gate, but the exact twin
dominates their wall-clock, masking perf regressions in the actual
production kernels (operators/dedup.py, operators/similarity.py).

These wrappers run ONLY the production kernel — the code a user would
run at 100 TB — and exist so bench.py can time them as headline
entries. They are deliberately NOT in the driver registry: their
correctness is pinned by the attested twins (same kernels, same
params) plus tests/test_dedup.py, tests/test_similarity.py and
tests/test_determinism.py, and registering oracle-less queries would
reintroduce the rows-only category the catalog eliminated in r3.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from batch_processing_etl_orchestration_spark.operators.dedup import (
    simhash_pairs,
)
from batch_processing_etl_orchestration_spark.operators.similarity import (
    hyperplane_lsh_topk,
    int8_topk,
    ivf_topk,
    pq_rerank_topk,
)
from batch_processing_etl_orchestration_spark.plans.registry import QueryFn
from batch_processing_etl_orchestration_spark.tables import load_table


def _ann_qc(spark: SparkSession, sf_dir: str):
    """Same query/candidate split as northstar_ml._ann_queries_candidates
    (kept in sync so raw timings are comparable to the attested twins)."""
    from pyspark.sql import functions as F

    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    c = e.select(
        F.col("vec_id").alias("cand_id"), F.col("embedding").alias("ce"), "label"
    )
    return q, c


def q_simhash_pairs_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production SimHash kernel alone: signatures -> 16-bit-chunk
    pigeonhole candidates -> exact Hamming <= 8 verify. No exact-
    Jaccard twin."""
    docs = load_table(spark, sf_dir, "documents")
    return simhash_pairs(docs, max_hamming=8)


def q_ann_lsh_topk_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production hyperplane-LSH top-10 alone (no brute-force re-rank)."""
    q, c = _ann_qc(spark, sf_dir)
    return hyperplane_lsh_topk(q, c, k=10)


def q_ann_ivf_topk_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production IVF top-10 alone (8 cells, probe 4)."""
    q, c = _ann_qc(spark, sf_dir)
    return ivf_topk(q, c, k=10, n_cells=8, n_probe=4)


def q_ann_int8_topk_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production asymmetric-int8 top-10 alone (no float re-rank)."""
    q, c = _ann_qc(spark, sf_dir)
    return int8_topk(q, c, k=10)


def q_ann_pq_topk_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production PQ serving shape alone: code-only shortlist-50 +
    exact re-rank (no in-query brute-force attestation twin)."""
    q, c = _ann_qc(spark, sf_dir)
    return pq_rerank_topk(q, c, k=10, shortlist=50)


KERNEL_BENCH: dict[str, QueryFn] = {
    "q_simhash_pairs_raw": q_simhash_pairs_raw,
    "q_ann_lsh_topk_raw": q_ann_lsh_topk_raw,
    "q_ann_ivf_topk_raw": q_ann_ivf_topk_raw,
    "q_ann_int8_topk_raw": q_ann_int8_topk_raw,
    "q_ann_pq_topk_raw": q_ann_pq_topk_raw,
}
