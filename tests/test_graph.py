"""operators/graph.py — weighted PageRank fixpoint."""

from __future__ import annotations

from pyspark.sql import functions as F

from batch_processing_etl_orchestration_spark.operators.graph import pagerank


def _pr(spark, rows, **kw):
    edges = spark.createDataFrame(rows, "src int, dst int, w bigint")
    return {r["node"]: r["pr"] for r in pagerank(edges, **kw).collect()}


def test_symmetric_cycle_stays_uniform(spark):
    """A 2-cycle's stationary distribution is uniform; the iteration
    must hold it exactly (grid arithmetic, no drift)."""
    got = _pr(spark, [(1, 2, 1), (2, 1, 1)], n_iter=5)
    assert got == {1: 0.5, 2: 0.5}


def test_mass_conserved_with_dangling(spark):
    """a→b with b dangling: redistribution keeps Σpr = 1 (up to the
    1e-12 grid) and b outranks a (it receives a's mass)."""
    got = _pr(spark, [(1, 2, 1)], n_iter=10)
    assert abs(sum(got.values()) - 1.0) < 1e-9
    assert got[2] > got[1] > 0


def test_weighted_split(spark):
    """hub→{b w=3, c w=1}: after one iteration b's rank exceeds c's
    by exactly alpha·(pr_hub)·(3/4 − 1/4)."""
    got = _pr(spark, [(1, 2, 3), (1, 3, 1), (2, 1, 1), (3, 1, 1)], n_iter=1)
    diff = got[2] - got[3]
    expected = 0.85 * (1.0 / 3.0) * (0.75 - 0.25)
    assert abs(diff - expected) < 1e-9
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_hub_attracts_rank(spark):
    """Everyone links node 0; node 0 links back to 1 only: {0, 1}
    must hold the top-2 ranks (the 0↔1 cycle ping-pongs with
    amplitude α^k, so relative order inside the pair needs more
    iterations than the test spends — the stable claim is the set)."""
    edges = [(i, 0, 1) for i in range(1, 6)] + [(0, 1, 1)]
    got = _pr(spark, edges, n_iter=10)
    ranked = sorted(got, key=got.get, reverse=True)
    assert set(ranked[:2]) == {0, 1}
    assert min(got[0], got[1]) > max(got[i] for i in range(2, 6))


def test_triangle_count_k4_plus_pendant(spark):
    """K4 has 4 triangles, every vertex in exactly 3; a pendant node
    joins none. Input arrives directed/duplicated/self-looped to prove
    normalization."""
    from batch_processing_etl_orchestration_spark.operators.graph import (
        triangle_count,
    )

    k4 = [(a, b) for a in range(4) for b in range(4) if a != b]
    edges = spark.createDataFrame(
        k4 + [(0, 0), (3, 4), (4, 3), (0, 1)], "src INT, dst INT"
    )
    got = {r["node"]: r["n_triangles"] for r in triangle_count(edges).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangle_count_hub_star_has_none(spark):
    """A star (hub + leaves) has zero triangles — and the oriented
    formulation generates zero wedges AT the hub (all edges point
    leaf→hub), which is the whole scale argument."""
    from batch_processing_etl_orchestration_spark.operators.graph import (
        triangle_count,
    )

    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 30)], "src INT, dst INT"
    )
    assert triangle_count(edges).count() == 0


# -- bfs_min_hops -----------------------------------------------------------


def _bfs(spark, rows, seeds, k):
    from batch_processing_etl_orchestration_spark.operators.graph import (
        bfs_min_hops,
    )

    edges = spark.createDataFrame(rows, "src int, dst int")
    s = spark.createDataFrame([(x,) for x in seeds], "node int")
    return {
        r["node"]: r["hops"]
        for r in bfs_min_hops(edges, s, max_hops=k).collect()
    }


def test_bfs_chain_hops_and_bound(spark):
    """1→2→3→4→5 from seed 1: hop = distance, and the k bound cuts
    the tail (5 is 4 hops away, absent at k=3)."""
    rows = [(1, 2), (2, 3), (3, 4), (4, 5)]
    assert _bfs(spark, rows, [1], 3) == {1: 0, 2: 1, 3: 2, 4: 3}


def test_bfs_min_over_multiple_paths(spark):
    """Diamond 1→{2,3}→4 plus a long detour 1→5→6→4: node 4 reports
    the SHORT path's 2 hops, not the detour's 3."""
    rows = [(1, 2), (1, 3), (2, 4), (3, 4), (1, 5), (5, 6), (6, 4)]
    got = _bfs(spark, rows, [1], 3)
    assert got[4] == 2 and got[6] == 2


def test_bfs_multi_seed_and_cycle(spark):
    """Two seeds on a 4-cycle 1→2→3→4→1: every node takes the nearer
    seed's distance; the cycle cannot re-lower a visited node."""
    rows = [(1, 2), (2, 3), (3, 4), (4, 1)]
    assert _bfs(spark, rows, [1, 3], 2) == {1: 0, 3: 0, 2: 1, 4: 1}


def test_bfs_seed_reachable_from_seed_stays_zero(spark):
    """A seed that another seed can reach keeps hops=0 (min semantics
    — the anti-join refuses to re-add visited nodes)."""
    rows = [(1, 2), (2, 3)]
    assert _bfs(spark, rows, [1, 2], 2) == {1: 0, 2: 0, 3: 1}
