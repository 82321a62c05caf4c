"""Near-dup operators vs brute-force ground truth on constructed docs."""

from __future__ import annotations

import itertools

from batch_processing_etl_orchestration_spark.operators.dedup import (
    exact_jaccard,
    minhash_lsh_pairs,
    shingle_sets,
    simhash_pairs,
)


def _docs(spark):
    base = "the quick brown fox jumps over the lazy dog while rain falls on the green hills of summer"
    near = base.replace("lazy", "sleepy")  # one-word edit → high jaccard
    other = "completely different content about database engines and query optimization with spark"
    dup = base  # exact duplicate
    return spark.createDataFrame(
        [(0, base), (1, near), (2, other), (3, dup)], "doc_id LONG, text STRING"
    )


def _brute_pairs(spark, docs):
    sh = shingle_sets(docs, 3)
    ids = [r[0] for r in docs.select("doc_id").collect()]
    pairs = spark.createDataFrame(
        [(a, b) for a, b in itertools.combinations(sorted(ids), 2)], "doc_a LONG, doc_b LONG"
    )
    return {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in exact_jaccard(pairs, sh).collect()
    }


def test_minhash_lsh_finds_near_dups(spark):
    docs = _docs(spark)
    truth = _brute_pairs(spark, docs)
    assert truth[(0, 3)] == 1.0  # exact dup
    assert truth[(0, 1)] > 0.5  # near dup
    assert truth[(0, 2)] < 0.1  # unrelated

    found = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(docs, threshold=0.5).collect()
    }
    # exact dup must always collide in every band
    assert (0, 3) in found and found[(0, 3)] == 1.0
    # reported jaccard for any found pair equals brute force exactly
    for pair, j in found.items():
        assert truth[pair] == j
    # unrelated pair must never pass the threshold filter
    assert (0, 2) not in found


def test_minhash_deterministic(spark):
    docs = _docs(spark)
    a = sorted(map(tuple, minhash_lsh_pairs(docs, threshold=0.5).collect()))
    b = sorted(map(tuple, minhash_lsh_pairs(docs, threshold=0.5).collect()))
    assert a == b


def test_simhash_exact_dup_distance_zero(spark):
    docs = _docs(spark)
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in simhash_pairs(docs).collect()}
    assert pairs.get((0, 3)) == 0  # identical docs → identical simhash
    # near dup should be within the hamming budget; unrelated should not
    assert (0, 1) in pairs
    assert (0, 2) not in pairs


def test_dup_clusters_transitive_chain(spark):
    """A~B and B~C but A!~C must still land in ONE cluster (label
    propagation crosses the transitive link), and the cluster id is
    the component's minimum doc_id."""
    from batch_processing_etl_orchestration_spark.plans.northstar import (
        q_dup_clusters,
    )

    rows = [r for r in q_dup_clusters(spark, "/root/testdata/sf0.001").collect()]
    by_comp: dict[int, list] = {}
    for r in rows:
        by_comp.setdefault(r["comp_id"], []).append(r)
    for comp_id, members in by_comp.items():
        assert comp_id == min(m["doc_id"] for m in members)
        assert all(m["cluster_size"] == len(members) for m in members)
    # sanity: at least one multi-doc cluster exists in the fixture
    assert any(len(m) >= 2 for m in by_comp.values())
