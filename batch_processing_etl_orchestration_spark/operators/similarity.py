"""Similarity search over embedding columns (array<float>).

- ``brute_force_topk``: exact cosine top-k — the correctness baseline.
  Queries broadcast, candidates streamed once; dot/norm via
  higher-order array functions (JVM codegen, no UDF).
- ``hyperplane_lsh_topk``: the scale path — random-hyperplane LSH
  (Charikar 2002) with L tables × m bits. Each vector lands in one
  bucket per table; only bucket-mates are scored. Recall is tuned by
  (L, m); the structure turns an O(N·Q) scan into O(bucket · Q).

Determinism: hyperplanes come from a fixed LCG (no runtime RNG);
cosine uses double products + decimal sums (see plans/northstar.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# scaled-long fold: exact, order-insensitive, primitive codegen path
# (see plans/northstar.py and functions/exact.py for the rationale)
_SIM_SCALE = 10**14


def _dot(a: str, b: str) -> F.Column:
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"CAST(0 AS BIGINT), (acc, v) -> acc + CAST(ROUND(v * {_SIM_SCALE}) AS BIGINT))"
    ) / F.lit(float(_SIM_SCALE))


def _norm(a: str) -> F.Column:
    return F.sqrt(
        F.expr(
            f"aggregate(transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
            f"CAST(0 AS BIGINT), (acc, v) -> acc + CAST(ROUND(v * {_SIM_SCALE}) AS BIGINT))"
        )
        / F.lit(float(_SIM_SCALE))
    )


def cosine(a: str, b: str) -> F.Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    q_id: str = "query_id",
    c_id: str = "cand_id",
    q_vec: str = "qe",
    c_vec: str = "ce",
) -> DataFrame:
    """Exact cosine top-k per query (excluding self-matches by id)."""
    pairs = F.broadcast(queries).crossJoin(candidates).where(F.col(q_id) != F.col(c_id))
    sims = pairs.withColumn("cosine_sim", cosine(q_vec, c_vec))
    w = Window.partitionBy(q_id).orderBy(F.col("cosine_sim").desc(), F.col(c_id))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .drop(q_vec, c_vec)
    )


# ---------------------------------------------------------------------------
# Hyperplane LSH
# ---------------------------------------------------------------------------


def _hyperplanes(n_tables: int, n_bits: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-0.5, 0.5]^dim via a
    fixed LCG; row t*n_bits+j is plane j of table t."""
    planes = []
    state = 0x9E3779B97F4A7C15
    for _ in range(n_tables * n_bits):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (2**63)
            row.append((state % 1_000_000) / 1_000_000.0 - 0.5)
        planes.append(row)
    return planes


def lsh_bucket_ids(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    n_tables: int = 16,
    n_bits: int = 4,
    dim: int = 64,
) -> DataFrame:
    """(id, table_id, bucket): sign-pattern bucket of each vector in
    each LSH table.

    Formulation: posexplode the vector to (id, pos, val) rows, join the
    broadcast plane-element table on pos, partial-aggregate val·w per
    (id, table, bit), take signs, assemble the bucket int. Every step
    is a primitive codegen expression — measured ~10× faster than the
    equivalent higher-order-function fold, whose lambdas are
    interpreted per element. Row volume is |vectors|·dim·n_planes
    fan-out compressed immediately by the map-side partial agg.
    """
    spark = vectors.sparkSession
    planes = _hyperplanes(n_tables, n_bits, dim)
    elem_rows = [
        (t, j, p, planes[t * n_bits + j][p])
        for t in range(n_tables)
        for j in range(n_bits)
        for p in range(dim)
    ]
    plane_elems = spark.createDataFrame(
        elem_rows, "table_id INT, bit INT, pos INT, w DOUBLE"
    )
    exploded = vectors.select(
        F.col(id_col).alias("_id"), F.posexplode(vec_col).alias("pos", "val")
    )
    dots = (
        exploded.join(F.broadcast(plane_elems), "pos")
        .groupBy("_id", "table_id", "bit")
        .agg(F.sum(F.col("val").cast("double") * F.col("w")).alias("dot"))
    )
    bits = dots.select(
        "_id",
        "table_id",
        F.when(F.col("dot") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), bit)"))
        .otherwise(F.lit(0).cast("long"))
        .alias("term"),
    )
    return (
        bits.groupBy("_id", "table_id")
        .agg(F.sum("term").alias("bucket"))
        .select(F.col("_id").alias(id_col), "table_id", "bucket")
    )


def hyperplane_lsh_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    n_tables: int = 16,
    n_bits: int = 4,
    dim: int = 64,
    q_id: str = "query_id",
    c_id: str = "cand_id",
    q_vec: str = "qe",
    c_vec: str = "ce",
) -> DataFrame:
    """Approximate cosine top-k: score only candidates sharing an LSH
    bucket with the query in ≥1 table. Returns the same shape as
    brute_force_topk (recall measured against it in tests)."""
    # bucket queries and candidates in ONE pass over their union (one
    # plane broadcast, one fan-out job) and cache: the candidate join
    # consumes both halves, and per-job fixed overhead would otherwise
    # double
    allv = queries.select(
        F.lit(0).alias("_side"), F.col(q_id).alias("_vid"), F.col(q_vec).alias("_v")
    ).unionByName(
        candidates.select(
            F.lit(1).alias("_side"), F.col(c_id).alias("_vid"), F.col(c_vec).alias("_v")
        )
    ).withColumn("_key", F.concat(F.col("_side"), F.lit(":"), F.col("_vid")))
    # eager localCheckpoint: the bucket table immediately self-joins
    # (qb ⋈ cb); without materializing first, Catalyst plans both join
    # sides as full recomputations of the bucketing DAG. Checkpoint
    # blocks free when the result DataFrame is garbage-collected.
    buckets = lsh_bucket_ids(allv, "_key", "_v", n_tables, n_bits, dim).localCheckpoint(
        eager=True
    )
    split = F.split("_key", ":")
    qb = buckets.where(split[0] == "0").select(
        split[1].cast("long").alias(q_id), "table_id", "bucket"
    )
    cb = buckets.where(split[0] == "1").select(
        split[1].cast("long").alias(c_id), "table_id", "bucket"
    )
    cand_ids = (
        qb.join(cb, ["table_id", "bucket"])
        .where(F.col(q_id) != F.col(c_id))
        .select(q_id, c_id)
        .distinct()
    )
    scored = (
        cand_ids.join(F.broadcast(queries), q_id)
        .join(candidates, c_id)
        .withColumn("cosine_sim", cosine(q_vec, c_vec))
    )
    w = Window.partitionBy(q_id).orderBy(F.col("cosine_sim").desc(), F.col(c_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .drop(q_vec, c_vec)
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the cell-partitioned scale path
# ---------------------------------------------------------------------------


def _centroid_elems(spark, centroids: list[tuple[int, list[float]]]):
    """Element-wise centroid table (cell_id, pos, w, cnorm) for
    broadcast joins; cnorm precomputed driver-side (n_cells is tiny)."""
    rows = []
    for cell_id, vec in centroids:
        cnorm = sum(x * x for x in vec) ** 0.5 or 1.0
        rows.extend((cell_id, p, float(w), cnorm) for p, w in enumerate(vec))
    return spark.createDataFrame(rows, "cell_id INT, pos INT, w DOUBLE, cnorm DOUBLE")


def _nearest_cells(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    centroid_elems: DataFrame,
    n_probe: int,
) -> DataFrame:
    """(id, cell_id, cell_rank): the n_probe nearest centroids per
    vector by cosine. Since |v| is constant per vector, ranking by
    dot/|c| equals ranking by cosine — no vector-norm pass needed.
    Same posexplode→broadcast-join→partial-agg shape as
    lsh_bucket_ids (primitive codegen; no interpreted lambdas)."""
    exploded = vectors.select(
        F.col(id_col).alias("_id"), F.posexplode(vec_col).alias("pos", "val")
    )
    scores = (
        exploded.join(F.broadcast(centroid_elems), "pos")
        .groupBy("_id", "cell_id")
        .agg(
            (F.sum(F.col("val").cast("double") * F.col("w")) / F.first("cnorm")).alias(
                "_score"
            )
        )
    )
    w = Window.partitionBy("_id").orderBy(F.col("_score").desc(), F.col("cell_id"))
    return (
        scores.withColumn("cell_rank", F.row_number().over(w))
        .where(F.col("cell_rank") <= n_probe)
        .select(F.col("_id").alias(id_col), "cell_id", "cell_rank")
    )


def ivf_build_centroids(
    vectors: DataFrame, id_col: str, vec_col: str, n_cells: int, dim: int
) -> DataFrame:
    """Coarse quantizer: seeds = the n_cells lowest-id vectors
    (deterministic, no RNG), then ONE Lloyd iteration (per-cell mean
    of assigned vectors) to pull centroids toward the data. Returns
    the broadcast-ready element table.

    Driver collects are n_cells and n_cells*dim rows — index
    metadata, not data. At 100 TB the index is built once and reused
    across queries (two passes over the corpus, amortized)."""
    spark = vectors.sparkSession
    seeds = [
        (i, [float(x) for x in r[1]])
        for i, r in enumerate(
            vectors.select(id_col, vec_col).orderBy(id_col).limit(n_cells).collect()
        )
    ]
    seed_elems = _centroid_elems(spark, seeds)
    assign1 = _nearest_cells(vectors, id_col, vec_col, seed_elems, 1)
    exploded = vectors.select(
        F.col(id_col).alias("_vid"), F.posexplode(vec_col).alias("pos", "val")
    )
    means = (
        exploded.join(assign1.select(F.col(id_col).alias("_vid"), "cell_id"), "_vid")
        .groupBy("cell_id", "pos")
        .agg(F.avg(F.col("val").cast("double")).alias("w"))
        .collect()
    )
    by_cell: dict[int, list[float]] = {}
    for r in means:
        by_cell.setdefault(r["cell_id"], [0.0] * dim)[r["pos"]] = r["w"]
    return _centroid_elems(spark, sorted(by_cell.items()))


def ivf_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    n_cells: int = 8,
    n_probe: int = 4,
    dim: int = 64,
    q_id: str = "query_id",
    c_id: str = "cand_id",
    q_vec: str = "qe",
    c_vec: str = "ce",
) -> DataFrame:
    """IVF approximate cosine top-k: candidates are binned to their
    nearest centroid (the inverted lists); each query probes only its
    n_probe nearest cells, so the exact-scoring pass touches
    ~n_probe/n_cells of the corpus instead of all of it.

    Scale: the inverted lists ARE a partitioning — at 100 TB,
    repartition/cluster the corpus by cell_id on write and a probe
    reads only the probed cells' files (partition pruning on cell_id).
    Returns brute_force_topk's shape; recall measured in
    tests/test_similarity.py."""
    cent = ivf_build_centroids(candidates, c_id, c_vec, n_cells, dim)
    cand_cells = _nearest_cells(candidates, c_id, c_vec, cent, 1).select(c_id, "cell_id")
    inverted = candidates.join(cand_cells, c_id).repartition("cell_id")
    q_cells = _nearest_cells(queries, q_id, q_vec, cent, n_probe).select(q_id, "cell_id")
    probe = q_cells.join(F.broadcast(queries), q_id)
    scored = (
        probe.join(inverted, "cell_id")
        .where(F.col(q_id) != F.col(c_id))
        .withColumn("cosine_sim", cosine(q_vec, c_vec))
    )
    w = Window.partitionBy(q_id).orderBy(F.col("cosine_sim").desc(), F.col(c_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(q_id, c_id, "label", "cosine_sim", "rank")
    )
