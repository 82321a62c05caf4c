"""operators/clustering.py — exact-deterministic k-means."""

from __future__ import annotations

from pyspark.sql import functions as F

from batch_processing_etl_orchestration_spark.operators.clustering import (
    exact_kmeans_assign,
)


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")


def test_two_well_separated_groups(spark):
    """Points split around two far seeds converge to the obvious
    clustering after one update."""
    rows = [
        (0, [0.0, 0.0]),
        (1, [10.0, 10.0]),
        (2, [0.1, -0.1]),
        (3, [0.2, 0.0]),
        (4, [9.9, 10.1]),
        (5, [10.2, 9.8]),
    ]
    a = exact_kmeans_assign(_vecs(spark, rows), "vec_id", "embedding", k=2)
    got = {r["vec_id"]: r["cluster"] for r in a.collect()}
    assert got == {0: 0, 2: 0, 3: 0, 1: 1, 4: 1, 5: 1}


def test_result_invariant_to_partitioning(spark):
    """Scaled-long arithmetic means a reshuffled input yields the
    bit-identical assignment — the property float Lloyd lacks."""
    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(200)
    ]
    base = _vecs(spark, rows)
    a1 = sorted(
        tuple(r)
        for r in exact_kmeans_assign(base, "vec_id", "embedding", k=5).collect()
    )
    a2 = sorted(
        tuple(r)
        for r in exact_kmeans_assign(
            base.repartition(13), "vec_id", "embedding", k=5, n_iter=2
        ).collect()
    )
    assert a1 == a2


def test_empty_cluster_keeps_previous_centroid(spark):
    """A seed that captures no members keeps its centroid, so a later
    iteration can still assign to it; cluster ids stay dense."""
    # seeds 0,1,2; every non-seed point sits on top of seed 0 or 1, so
    # cluster 2 is empty after assignment 1 — its centroid must carry.
    rows = [
        (0, [0.0, 0.0]),
        (1, [10.0, 0.0]),
        (2, [100.0, 0.0]),
        (3, [0.0, 0.1]),
        (4, [10.0, 0.1]),
    ]
    a = exact_kmeans_assign(
        _vecs(spark, rows), "vec_id", "embedding", k=3, n_iter=3
    )
    got = {r["vec_id"]: r["cluster"] for r in a.collect()}
    # vec 2 (the far point, itself seed 2) stays with its own centroid
    assert got[2] == 2 and got[0] == 0 and got[1] == 1


def test_tie_breaks_to_lowest_cluster(spark):
    """A point exactly equidistant from two centroids goes to the
    lower cluster id (lexicographic min over (dist, c))."""
    rows = [
        (0, [0.0, 0.0]),
        (1, [2.0, 0.0]),
        (2, [1.0, 0.0]),  # exactly between seeds 0 and 1
    ]
    a = exact_kmeans_assign(
        _vecs(spark, rows), "vec_id", "embedding", k=2, n_iter=1
    )
    got = {r["vec_id"]: r["cluster"] for r in a.collect()}
    assert got[2] == 0


def test_assignment_plan_broadcasts_centroids(spark):
    """The per-iteration assignment must join against a broadcast
    centroid table, never shuffle the corpus on a join key."""
    import random

    rng = random.Random(3)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(4)]) for i in range(50)]
    a = exact_kmeans_assign(
        _vecs(spark, rows), "vec_id", "embedding", k=4, n_iter=2
    )
    plan = a._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    # no centroid-keyed shuffle join: any SortMergeJoin in the plan may
    # only be the per-vector update join on _vid, never on cluster ids
    for line in plan.splitlines():
        if "SortMergeJoin" in line:
            assert "_vid" in line, line
