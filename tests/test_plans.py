"""Physical-plan audits: the 100 TB posture is only real if the plans
show it. These assert on explain() output — broadcast joins where dims
are small, predicate/projection pushdown into the parquet scan, no
unintended cartesian products, whole-stage codegen present."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from batch_processing_etl_orchestration_spark.plans import QUERIES


def _plan(spark, sf_dir, name: str) -> str:
    df = QUERIES[name].fn(spark, sf_dir)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_dim_joins_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q_join_dim_chain")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # dims must not trigger a shuffle join


def test_semi_join_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q_semi_join_dim")
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_anti_join_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q_anti_join_dim")
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_predicate_pushdown_reaches_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q_predicate_filters")
    # returnflag + shipdate predicates must appear as pushed filters on
    # the parquet scan, not only as a post-scan Filter
    assert "PushedFilters: [" in plan
    assert "l_returnflag" in plan.split("PushedFilters")[1][:400]


def test_column_pruning(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q_projection_slice")
    # scan must read only the projected columns (ReadSchema shows 4 cols)
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "c_custkey" in read_schema and "c_mktsegment" not in read_schema


def test_flagship_prunes_columns(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q_hourly_net_by_type")
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "props" not in read_schema and "event_id" not in read_schema


def test_no_unintended_cartesian(spark, sf_dir):
    for name in [
        "q_join_dim_chain",
        "q_semi_join_dim",
        "q_ngram_jaccard_pairs",
        "q_sessionize_users",
    ]:
        plan = _plan(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name


def _n_exchanges(plan: str) -> int:
    import re

    return len(re.findall(r"^\(\d+\) Exchange", plan, re.MULTILINE))


def test_flagship_partial_final_agg_one_shuffle(spark, sf_dir):
    # map-side partial + final hash agg around exactly one shuffle
    plan = _plan(spark, sf_dir, "q_hourly_net_by_type")
    import re

    assert len(re.findall(r"^\(\d+\) HashAggregate", plan, re.MULTILINE)) == 2
    assert _n_exchanges(plan) == 1


def test_pivot_no_value_discovery_pass(spark, sf_dir):
    # explicit pivot value list → the two-level pivot aggregation
    # (≤2 shuffles), never a third pass to discover pivot values
    plan = _plan(spark, sf_dir, "q_pivot_day_type")
    assert _n_exchanges(plan) <= 2


def test_grouping_sets_single_expand_single_shuffle(spark, sf_dir):
    """GROUPING SETS must plan as one Expand + one aggregate exchange —
    a single scan regardless of how many sets are listed (not one job
    per set unioned)."""
    plan = _plan(spark, sf_dir, "q_grouping_sets")
    assert "Expand" in plan
    # the formatted plan prints each node in the tree AND the detail
    # section — assert structure by node kind, not raw counts
    assert "Union" not in plan  # NOT one aggregation job per set
    n_scans = plan.count("(1) Scan parquet")  # node ids are stable: scan is leaf
    assert n_scans == 1


def test_stream_static_join_broadcasts_dim(spark, sf_dir):
    """The stream-static enrichment join must broadcast the customer
    dimension, never shuffle the stream."""
    from batch_processing_etl_orchestration_spark.streaming.events import (
        read_events_stream,
    )
    from batch_processing_etl_orchestration_spark.tables import load_table
    from pyspark.sql import functions as F
    import io
    from contextlib import redirect_stdout

    events = read_events_stream(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = events.join(F.broadcast(cust), "user_id")
    buf = io.StringIO()
    with redirect_stdout(buf):
        joined.explain()
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q6_all_predicates_pushed(spark, sf_dir):
    """Every Q6 predicate must reach the parquet scan as a pushed
    filter — none may survive only as a post-scan Filter."""
    plan = _plan(spark, sf_dir, "q_filter_agg_pushdown")
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed, "no PushedFilters in scan"
    text = " ".join(pushed)
    for col in ["l_shipdate", "l_discount", "l_quantity"]:
        assert col in text, f"{col} not pushed to scan"


# --- round-2 additions: analytics + replay plan shapes ---------------------


def test_promo_and_disjunctive_broadcast_part(spark, sf_dir):
    """part is dim-sized → both Q14/Q19-shaped joins must broadcast it,
    never shuffle lineitem for a sort-merge join."""
    for name in ["q_promo_revenue", "q_disjunctive_revenue"]:
        plan = _plan(spark, sf_dir, name)
        assert "BroadcastHashJoin" in plan, name
        assert "SortMergeJoin" not in plan, name


def test_priority_line_counts_pushdown(spark, sf_dir):
    """The shipdate range predicate must reach the lineitem scan."""
    plan = _plan(spark, sf_dir, "q_priority_line_counts")
    pushed = plan.split("PushedFilters")[1][:400]
    assert "l_shipdate" in pushed


def test_left_join_aggregates_before_join(spark, sf_dir):
    """Q13 shape: orders must aggregate to (custkey, count) BEFORE the
    outer join — the join handles |customers| rows, not |orders|. In
    the formatted tree the count(o_orderkey) aggregate must sit below
    the outer join (higher node ids print deeper = later; the join
    consumes the agg's output)."""
    plan = _plan(spark, sf_dir, "q_left_join_order_counts")
    import re

    join = re.search(
        r"\((\d+)\) BroadcastHashJoin|\((\d+)\) SortMergeJoin", plan
    )
    agg = re.search(r"\((\d+)\) HashAggregate[\s\S]{0,400}?partial_count\(o_orderkey", plan)
    assert join and agg, plan[:600]
    join_id = int(join.group(1) or join.group(2))
    # the pre-join aggregate is an input to the join: its node id is
    # smaller (leaves number first in the formatted plan)
    assert int(agg.group(1)) < join_id, plan[:600]


def test_replay_semi_join_broadcasts(spark, sf_dir):
    """The pipeline replay's BA semi-join must broadcast the 25-row
    nation dim exactly like the standalone J1 query."""
    plan = _plan(spark, sf_dir, "q_pipeline_eia930_net_gen")
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_full_outer_pre_aggregates(spark, sf_dir):
    """Both sides must aggregate to |days| before the full-outer join —
    never an event-grain outer join."""
    plan = _plan(spark, sf_dir, "q_full_outer_daily_types")
    assert "FullOuter" in plan
    import re

    aggs = [int(m) for m in re.findall(r"\((\d+)\) HashAggregate", plan)]
    joins = [int(m) for m in re.findall(r"\((\d+)\) SortMergeJoin", plan)]
    if joins:  # agg nodes sit below the join in the formatted tree
        assert sum(1 for a in aggs if a < max(joins)) >= 2


def test_multimodal_decode_has_no_shuffle(spark, sf_dir):
    """synthesize → decode is two chained ArrowEvalPython/mapInPandas
    stages over the same scan: payload bytes must never cross an
    exchange — at 100 TB the decode is shuffle-free by construction."""
    plan = _plan(spark, sf_dir, "q_multimodal_decode")
    assert "Exchange" not in plan, plan[:800]
    assert "MapInPandas" in plan


def test_brute_force_topk_is_not_cartesian(spark, sf_dir):
    """The exact ANN baseline ships the query matrix inside the Arrow
    closure — the physical plan must contain a MapInPandas scoring
    pass, no CartesianProduct/BroadcastNestedLoopJoin pair blow-up."""
    from pyspark.sql import functions as F

    from batch_processing_etl_orchestration_spark.operators.similarity import (
        brute_force_topk,
    )
    from batch_processing_etl_orchestration_spark.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    c = e.select(F.col("vec_id").alias("cand_id"), F.col("embedding").alias("ce"), "label")
    df = brute_force_topk(q, c, k=10)
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "MapInPandas" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_pivot_replay_shuffle_budget(spark, sf_dir):
    """The de-vacuated A4 replay: bronze fan-out (posexplode/Generate)
    stays in the scan stage, the BA semi-join broadcasts, and the plan
    spends exactly Spark's two-phase-pivot shuffle budget — pre-agg on
    (keys, type), wide agg on keys — plus the output sort. Anything
    beyond 3 shuffles means the fan-out or join started exchanging
    payload rows."""
    plan = _plan(spark, sf_dir, "q_pipeline_eia930_pivot")
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "Generate" in plan  # the ×4 type fan-out, pre-shuffle
    assert "CartesianProduct" not in plan
    assert _n_exchanges(plan) <= 3, plan[:900]


def test_quantize_int8_no_explode_one_rollup(spark, sf_dir):
    """Int8 quantization must quantize/verify inside higher-order
    array functions on the scan: no Generate (an explode would
    shuffle |dims|x the rows) and only the tiny per-label rollup's
    exchange. A second exchange appears solely if AQE splits the
    partial/final agg — both sit on the same small rollup."""
    plan = _plan(spark, sf_dir, "q_embedding_quantize_int8")
    assert "Generate" not in plan
    assert "forall" in plan or "aggregate" in plan
    assert _n_exchanges(plan) <= 2, plan[:900]


def test_funnel_single_shuffle(spark, sf_dir):
    """The three funnel milestones stack as Window nodes over ONE
    user_id Exchange, and the final per-user agg reuses that
    partitioning — funnel depth must not add shuffles (at 100 TB each
    extra shuffle re-moves the whole events table)."""
    plan = _plan(spark, sf_dir, "q_events_funnel")
    assert plan.count("Window") >= 3
    assert _n_exchanges(plan) == 1, plan[:900]


def test_scd2_apply_no_cartesian_single_key_shuffle(spark, sf_dir):
    """The SCD2 merge is one full-outer key join plus column branch
    selects — no cartesian product, no window exchange storm."""
    plan = _plan(spark, sf_dir, "q_scd2_customer_update")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" not in plan


def test_bloom_prefilter_broadcasts_chunk_table(spark, sf_dir):
    """The bloom probes must be a BROADCAST join on the chunk id (the
    m/64-row filter table), never a shuffled join of the gram stream
    against it."""
    plan = _plan(spark, sf_dir, "q_decontaminate_bloom")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_binaryfile_scan_lists_files_not_payloads(spark, sf_dir):
    """Pointer-path scan: the binaryFile source appears as a file scan
    (one split per file); decode is a single mapInPandas with no
    shuffle between scan and Python."""
    plan = _plan(spark, sf_dir, "q_multimodal_binaryfile")
    assert "Exchange" not in plan  # scan → project → mapInPandas, no shuffle


def test_corpus_assembly_composition_plan(spark, sf_dir):
    """Composing the five assembly stages must not introduce a
    cartesian product or a nested-loop join; the decontamination
    anti-join and the mix-threshold join stay broadcast."""
    plan = _plan(spark, sf_dir, "q_corpus_assembly")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    # the only BroadcastNestedLoopJoin allowed is the 1-row n_min
    # scalar crossJoin (metadata-sized); anything larger is a bug.
    # Count tree nodes ("... Cross BuildRight"), not the formatted
    # plan's detail-section repeats.
    assert plan.count("BroadcastNestedLoopJoin Cross") <= 1


def test_aqe_skew_join_split_engages_on_hot_key(spark):
    """SCALE.md claims AQE skew-join splitting covers hot-key joins
    (the join-side complement of the salted-agg pattern). Close the
    loop LIVE: a join where one key holds 75% of the rows must (a)
    return exact results and (b) show AQE actually split the skewed
    partition in the executed adaptive plan — SortMergeJoin(skew=true)
    with an 'AQEShuffleRead ... skewed' child — under thresholds
    scaled down to fixture size (at production scale the defaults
    [256MB advisory, factor 5] fire the same mechanism)."""
    from pyspark.sql import functions as F

    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.adaptive.enabled",
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        conf.set("spark.sql.adaptive.enabled", "true")
        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "65536"
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "65536")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ

        # hot key 0: 300k of 400k rows; keys 1..1000 get ~100 each
        left = spark.range(400_000).select(
            F.when(F.col("id") < 300_000, F.lit(0))
            .otherwise((F.col("id") % 1000) + 1)
            .alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(1001).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("w")
        )
        j = left.join(right, "k").agg(
            F.count(F.lit(1)).alias("n"), F.sum(F.col("v") + F.col("w")).alias("s")
        )
        [row] = j.collect()
        # every left row matches exactly one right row
        assert row["n"] == 400_000
        # sum(v) over all ids + sum(3k per matched row)
        want_s = sum(range(400_000)) + sum(
            3 * ((i % 1000) + 1) for i in range(300_000, 400_000)
        )
        assert row["s"] == want_s

        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:1500]
        assert "skewed" in plan, plan[:1500]
    finally:
        for k, v in saved.items():
            conf.set(k, v)


def test_chunking_is_shuffle_free(spark, sf_dir):
    """Sliding-window chunking must plan as a single narrow
    scan→project→explode stage: zero Exchanges, and the scan reads
    only doc_id + text."""
    plan = _plan(spark, sf_dir, "q_chunk_documents")
    assert _n_exchanges(plan) == 0, plan[:800]
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "text" in read_schema and "lang" not in read_schema


def test_token_budget_prefix_sum_windows_on_buckets(spark, sf_dir):
    """The two-phase prefix sum must never sort a whole source in one
    partition: the corpus-side Window partitions on (source, bucket),
    and the offset table joins back via broadcast."""
    plan = _plan(spark, sf_dir, "q_token_budget_sample")
    # corpus-side running-sum window keyed by source AND bucket
    import re

    win_specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert any("source" in w and "b#" in w for w in win_specs), win_specs
    assert "BroadcastHashJoin" in plan


def test_negative_sampling_prunes_to_doc_id(spark, sf_dir):
    """The corpus scan must read ONLY doc_id — dragging text through a
    renumber + 3x probe explosion would move the whole corpus for an
    id-pair output. All joins are broadcast (offsets + count are
    metadata-sized; the idx join sides are id-only)."""
    plan = _plan(spark, sf_dir, "q_negative_sampling")
    for line in plan.split("ReadSchema:")[1:]:
        schema = line.splitlines()[0]
        assert "text" not in schema and "struct<doc_id:bigint>" in schema, schema


def test_mad_outliers_prunes_and_partitions_by_type(spark, sf_dir):
    """MAD robust outliers: scans read only (event_type, value) — no
    ts/props payload — and every data shuffle is keyed on event_type
    (the median tables move by broadcast, never the fact)."""
    plan = _plan(spark, sf_dir, "q_mad_robust_outliers")
    for line in plan.split("ReadSchema:")[1:]:
        schema = line.splitlines()[0]
        assert "props" not in schema and "ts" not in schema, schema
    import re

    parts = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    assert parts and all("event_type" in p for p in parts), parts
    assert "BroadcastHashJoin" in plan


def test_aqe_skew_split_blocked_by_aggregate_child(spark):
    """Documented AQE limitation (SCALE.md §Skew): OptimizeSkewedJoin
    pattern-matches SortMergeJoin whose children are sort-over-shuffle
    DIRECTLY; a post-shuffle aggregate child — the common
    `dim = fact.select(key).distinct()` idiom — blocks the split and
    the hot partition stays whole. Same data/thresholds as
    test_aqe_skew_join_split_engages_on_hot_key, dim derived via
    distinct instead of independent: results exact, NO skew=true."""
    from pyspark.sql import functions as F

    conf = spark.conf
    keys = (
        "spark.sql.adaptive.enabled",
        "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    )
    saved = {}
    for k in keys:
        try:
            saved[k] = conf.get(k)
        except Exception:
            saved[k] = None
    try:
        conf.set("spark.sql.adaptive.enabled", "true")
        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "65536",
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "65536")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

        left = spark.range(400_000).select(
            F.when(F.col("id") < 300_000, F.lit(0))
            .otherwise((F.col("id") % 1000) + 1)
            .alias("k"),
            F.col("id").alias("v"),
        )
        dim = left.select("k").distinct().withColumn("w", F.col("k") * 3)
        j = left.join(dim, "k").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v") + F.col("w")).alias("s"),
        )
        [row] = j.collect()
        assert row["n"] == 400_000
        want_s = sum(range(400_000)) + sum(
            3 * ((i % 1000) + 1) for i in range(300_000, 400_000)
        )
        assert row["s"] == want_s
        plan = j._jdf.queryExecution().executedPlan().toString()
        # the documented limitation: no split through the aggregate
        assert "skew=true" not in plan, plan[:1200]
    finally:
        for k, v in saved.items():
            if v is not None:
                conf.set(k, v)
            else:
                # originally unset: leaving our '-1' behind would
                # disable adaptive auto-broadcast for every later test
                # in the shared session fixture
                conf.unset(k)


def test_rfm_segments_prunes_and_broadcasts_thresholds(spark, sf_dir):
    """RFM: the orders scan reads only (custkey, orderdate, totalprice);
    the global-max date and the 9 percentile thresholds join back by
    broadcast (single-row tables — never a shuffle of per-customer
    rows against them)."""
    plan = _plan(spark, sf_dir, "q_rfm_segments")
    for line in plan.split("ReadSchema:")[1:]:
        schema = line.splitlines()[0]
        assert "o_orderpriority" not in schema and "o_orderstatus" not in schema, schema
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_markov_transitions_single_user_shuffle(spark, sf_dir):
    """Markov: one data shuffle keyed on user_id for the lag window;
    the per-(prev,next) counts and |types|-row totals join broadcast.
    Scan prunes props/value."""
    import re

    plan = _plan(spark, sf_dir, "q_markov_transitions")
    for line in plan.split("ReadSchema:")[1:]:
        schema = line.splitlines()[0]
        assert "props" not in schema and "value" not in schema, schema
    parts = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    data_parts = [p for p in parts if "user_id" in p]
    assert data_parts, parts
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def test_attribution_prunes_and_windows_on_user(spark, sf_dir):
    """Attribution: scan prunes props; the IGNORE-NULLS carry runs in
    the user_id window shuffle (no self-join — a range self-join would
    appear as SortMergeJoin or a cartesian)."""
    import re

    plan = _plan(spark, sf_dir, "q_attribution_last_touch")
    for line in plan.split("ReadSchema:")[1:]:
        schema = line.splitlines()[0]
        assert "props" not in schema, schema
    parts = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    assert any("user_id" in p for p in parts), parts
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_key_skew_report_reads_keys_only(spark, sf_dir):
    """Skew report: each source scan reads ONLY its key column (the
    whole point is a metadata-cost diagnostic — dragging payloads
    through the count shuffle would defeat it); the stats row joins
    back by broadcast."""
    plan = _plan(spark, sf_dir, "q_key_skew_report")
    for line in plan.split("ReadSchema:")[1:]:
        schema = line.splitlines()[0]
        assert ("struct<o_custkey:bigint>" in schema
                or "struct<l_suppkey:bigint>" in schema), schema
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_value_drift_prunes_and_keys_on_type(spark, sf_dir):
    """Drift TVD: scan prunes props/user_id; the timeline-bounds row
    broadcasts; grouped aggs key on (event_type[, bucket]) — the fact
    never shuffles on anything else."""
    import re

    plan = _plan(spark, sf_dir, "q_value_drift_tvd")
    for line in plan.split("ReadSchema:")[1:]:
        schema = line.splitlines()[0]
        assert "props" not in schema and "user_id" not in schema, schema
    parts = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    assert parts and all("event_type" in p for p in parts), parts
    assert "SortMergeJoin" not in plan


def test_corr_matrix_one_scan_no_joins(spark, sf_dir):
    """Exact corr matrix: ONE lineitem scan reading only the four
    measures, one partial+final agg to a single moment row, and the 6
    pair rows explode from it — no join, no re-scan, no per-pair
    pass."""
    plan = _plan(spark, sf_dir, "q_corr_matrix_exact")
    # formatted explain names each scan once in the tree and once in
    # the detail section — one real scan shows exactly one Location:
    assert plan.count("Location: InMemoryFileIndex") == 1, plan[:800]
    for line in plan.split("ReadSchema:")[1:]:
        schema = line.splitlines()[0]
        assert "l_orderkey" not in schema and "l_shipdate" not in schema, schema
    for op in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct"):
        assert op not in plan, op


def test_late_ship_priority_semi_join_with_residual(spark, sf_dir):
    """Q4 shape: the EXISTS decorrelates to ONE LeftSemi join (no
    aggregate-distinct materialization of lineitem); both the order
    window and the implied shipdate bound reach their scans as pushed
    filters; the non-equi residual never degrades to a cartesian."""
    plan = _plan(spark, sf_dir, "q_late_ship_priority")
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan
    pushed = [
        ln for ln in plan.splitlines() if "PushedFilters" in ln
    ]
    assert any("o_orderdate" in ln for ln in pushed), pushed
    assert any("l_shipdate" in ln for ln in pushed), pushed


def test_important_parts_semi_broadcast_and_scalar_total(spark, sf_dir):
    """Q11 shape: the nation supplier list broadcasts as a LeftSemi
    INTO the lineitem scan; the global total joins back as a
    single-row broadcast (BNLJ), never a shuffle; lineitem reads only
    the four needed columns."""
    plan = _plan(spark, sf_dir, "q_important_parts")
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    for line in plan.split("ReadSchema:")[1:]:
        schema = line.splitlines()[0]
        if "l_partkey" in schema:
            assert "l_tax" not in schema and "l_quantity" not in schema, schema


def test_top_revenue_supplier_pushdown_and_broadcasts(spark, sf_dir):
    """Q15 shape: the quarter window pushes to the lineitem scan; the
    global max joins back as a one-row broadcast and the supplier dim
    broadcasts — no shuffle join anywhere."""
    plan = _plan(spark, sf_dir, "q_top_revenue_supplier")
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("l_shipdate" in ln for ln in pushed), pushed
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_part_supplier_variety_broadcasts_and_one_distinct(spark, sf_dir):
    """Q16 shape: the filtered part dim and the blacklist broadcast
    (one hash, one anti); the COUNT(DISTINCT supplier) runs as
    distinct-tuple partial aggregation — no Expand node, no shuffle
    join."""
    plan = _plan(spark, sf_dir, "q_part_supplier_variety")
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan
    assert "Expand" not in plan


def test_dominant_suppliers_prunes_and_broadcasts_parts(spark, sf_dir):
    """Q20 shape: the 'small%' part list broadcasts into the filtered
    lineitem scan (shipdate pushed); the fraction-of-group join runs
    between two already-aggregated (output-sized) relations and the
    supplier dim broadcasts; no cartesian anywhere."""
    plan = _plan(spark, sf_dir, "q_dominant_suppliers")
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("l_shipdate" in ln for ln in pushed), pushed
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_df_capped_pair_join_plan_shape(spark, sf_dir):
    """r9 df-cap (VERDICT r8 #1): the hot-shingle set must BROADCAST
    into both the cold split (LeftAnti) and the hot-array membership
    join — its size is corpus-size-independent (≤ Σdf/cap entries) —
    and the only shuffle joins are the candidate self-join and the
    candidate-sized recombination joins. No cartesian anywhere."""
    plan = _plan(spark, sf_dir, "q_ngram_containment_pairs")
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    # the 1-row df_cap relation enters via a broadcast nested loop,
    # never a shuffle
    assert "BroadcastNestedLoopJoin" in plan


def _nodes(plan: str, op: str) -> int:
    """Count physical NODES of a type in explain('formatted') output —
    each node prints twice (tree line + '(N) Op' detail header), so
    substring counts double-count; the detail header is unambiguous."""
    import re

    return len(re.findall(rf"^\(\d+\) {op}\b", plan, flags=re.M))


def test_bpe_token_count_single_exchange(spark, sf_dir):
    """r10 (review): source rides THROUGH the Arrow kernel, so the
    plan has exactly one scan of documents, no join of any kind, and
    the per-source aggregate's shuffle is the only exchange."""
    plan = _plan(spark, sf_dir, "q_bpe_token_count")
    assert _nodes(plan, "Scan parquet") == 1
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert _nodes(plan, "Exchange") == 1


def test_pack_sequences_bpe_one_shuffle(spark, sf_dir):
    """The BPE-budget packing walk keeps the whitespace variant's
    scale shape: one hash exchange on packer feeding the streaming
    mapInPandas walk — the BPE kernel adds NO shuffle of its own."""
    plan = _plan(spark, sf_dir, "q_pack_sequences_bpe")
    assert _nodes(plan, "Exchange") == 1
    assert _nodes(plan, "Scan parquet") == 1
    assert "Join" not in plan and "CartesianProduct" not in plan


def test_adversarial_skew_report_broadcast_scalars(spark, sf_dir):
    """The cap and hot-user scalars enter as broadcast 1-row
    relations (BroadcastNestedLoopJoin), never a shuffle join or a
    plan-time collect; the corpus-sized work is the shingle df groupBy
    and the (user, day) block groupBy only."""
    plan = _plan(spark, sf_dir, "q_adversarial_skew_report")
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_bpe_encode_ids_zero_shuffle(spark, sf_dir):
    """The sampled token-id stream is a pure flatMap: no Exchange, no
    join, one scan. The modulo sample predicate is NOT pushable into
    parquet (review r10 caught the earlier claim that it was) — assert
    what is actually true: it applies as a Filter node between the
    single scan and the kernel, and the scan reads only (doc_id,
    text)."""
    plan = _plan(spark, sf_dir, "q_bpe_encode_ids")
    assert _nodes(plan, "Exchange") == 0
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert _nodes(plan, "Scan parquet") == 1
    assert _nodes(plan, "Filter") == 1 and "% 97" in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "text" in read_schema and "source" not in read_schema


def test_bpe_encode_ids_satvocab_zero_shuffle(spark, sf_dir):
    """r11: the saturated-table id stream must keep the same plan
    shape as q_bpe_encode_ids — the 8x merge table rides the task
    closure, never the plan: no Exchange, no join, one pruned
    (doc_id, text) scan, the mod-89 sample as a post-scan Filter."""
    plan = _plan(spark, sf_dir, "q_bpe_encode_ids_satvocab")
    assert _nodes(plan, "Exchange") == 0
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert _nodes(plan, "Scan parquet") == 1
    assert _nodes(plan, "Filter") == 1 and "% 89" in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "text" in read_schema and "source" not in read_schema


def test_bpe_proxy_drift_single_exchange(spark, sf_dir):
    """r11: the fertility audit keeps q_bpe_token_count's shape —
    source rides through the Arrow kernel (no join-back), and the
    per-source aggregate is the plan's only exchange."""
    plan = _plan(spark, sf_dir, "q_bpe_proxy_drift")
    assert _nodes(plan, "Scan parquet") == 1
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert _nodes(plan, "Exchange") == 1


def test_vocab_growth_bucketed_prefix(spark, sf_dir):
    """r12 (VERDICT r11 #2): the Heaps-curve running totals must be the
    two-phase bucketed prefix sum — the per-document window partitions
    on the range bucket `_b`, and the only unpartitioned Window in the
    plan runs over the 256-row per-bucket offsets table."""
    import re

    plan = _plan(spark, sf_dir, "q_vocab_growth")
    segs = [s for s in plan.split("\n\n")
            if re.match(r"\(\d+\) Window\b", s.strip())]
    assert len(segs) == 2
    for seg in segs:
        inp = re.search(r"Input \[\d+\]: \[([^\]]*)\]", seg).group(1)
        if "doc_id" in inp:
            # per-document window: MUST be bucket-partitioned
            assert "windowspecdefinition(_b#" in seg
        else:
            # offsets window: unpartitioned is fine — input is the
            # 256-row bucket-total table (_b, _bt, _bv), nothing else
            cols = [c.strip().split("#")[0] for c in inp.split(",")]
            assert set(cols) == {"_b", "_bt", "_bv"}


def test_hybrid_rrf_windows_rank_topk_only(spark, sf_dir):
    """r12 (VERDICT r11 #3): both RRF rank windows must sit directly
    above a TakeOrderedAndProject — row_number never sees more than
    the top-50 list, so no task ranks the full embeddings table."""
    import re

    plan = _plan(spark, sf_dir, "q_hybrid_search_rrf")
    tree = plan.split("\n\n")[0].splitlines()
    win_lines = [i for i, l in enumerate(tree) if re.search(r"\bWindow \(\d+\)", l)]
    assert len(win_lines) == 2
    for i in win_lines:
        assert "TakeOrderedAndProject" in tree[i + 1], tree[i : i + 2]


def test_zipf_fit_bucketed_rank(spark, sf_dir):
    """r12 (VERDICT r11 #3 rider, tightened by the r12 review): the
    vocab rank is three-level — the per-word row_number partitions on
    (n_w, _wb) prefix buckets, the grouped offsets table's cumulative
    partitions on its range id (_pid), and the ONLY unpartitioned
    Window anywhere runs over the constant 256-row per-range totals
    (_pid, _pt) — never over a corpus-dependent relation."""
    import re

    plan = _plan(spark, sf_dir, "q_zipf_fit")
    segs = [s for s in plan.split("\n\n")
            if re.match(r"\(\d+\) Window\b", s.strip())]
    assert len(segs) == 3
    n_unpartitioned = 0
    for seg in segs:
        inp = re.search(r"Input \[\d+\]: \[([^\]]*)\]", seg).group(1)
        cols = {c.strip().split("#")[0] for c in inp.split(",")}
        if "w" in cols:  # per-word rank window: MUST be bucket-partitioned
            assert re.search(r"windowspecdefinition\(n_w#\d+L?, _wb#", seg)
        elif "_c" in cols:  # range-local offsets cumulative: by _pid
            assert re.search(r"windowspecdefinition\(_pid#", seg)
        else:  # the one global window: constant 256-row range totals
            assert cols == {"_pid", "_pt"}
            n_unpartitioned += 1
    assert n_unpartitioned == 1


def test_nb_classifier_broadcast_scoring_plan(spark, sf_dir):
    """q_nb_quality_classifier (r13, VERDICT r12 #1): the weight
    relation must be CONSTANT-BOUNDED. The query trains once
    (collecting the ≤ K+B model — asserted directly on the collected
    rows) and scores with literal-reinjected weights, so the SCORING
    plan is one scan + broadcast joins + one per-doc aggregation —
    never a shuffle join on words, never a global sort; the TRAINING
    head cap compiles to TakeOrderedAndProject (per-partition top-K
    over the df aggregate). The r12 revision broadcast a vocab-sized
    table that grew with the corpus (15.47× cold at the sf100
    decade); this pins its replacement's shape."""
    import io
    import re
    from contextlib import redirect_stdout

    from batch_processing_etl_orchestration_spark.plans.northstar import (
        _NB_HEAD_K,
        _NB_TAIL_B,
        _nb_head_df,
        _nb_train_capped,
    )
    from batch_processing_etl_orchestration_spark.tables import load_table
    from pyspark.sql import functions as F

    plan = _plan(spark, sf_dir, "q_nb_quality_classifier")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # no global Sort anywhere in the scoring plan
    assert not re.search(r"\bSort\b(?!MergeJoin)", plan)

    d = load_table(spark, sf_dir, "documents")
    # the collected model IS the bound — stronger than a plan string
    head, weights, _prior = _nb_train_capped(
        spark, d.select("doc_id", "lang", "text")
    )
    assert len(head) <= _NB_HEAD_K
    assert len(weights) <= _NB_HEAD_K + _NB_TAIL_B
    # the training head cap: TakeOrderedAndProject, never sort+limit
    buf = io.StringIO()
    with redirect_stdout(buf):
        _nb_head_df(d.select("doc_id", "text")).explain("formatted")
    hplan = buf.getvalue()
    assert "TakeOrderedAndProject" in hplan
    assert not re.search(r"\bSort\b(?!MergeJoin)", hplan)


def test_dsir_shortlist_is_take_ordered(spark, sf_dir):
    """q_dsir_importance_weights (r12): the constant-width (B=64)
    ratio table broadcasts, and the resampling shortlist must compile
    to TakeOrderedAndProject (per-partition top-N) — a global Sort
    over the per-doc domain is the single-task anti-pattern the
    catalog retired in r12."""
    plan = _plan(spark, sf_dir, "q_dsir_importance_weights")
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan


def test_gopher_rules_single_scan(spark, sf_dir):
    """q_gopher_quality_rules (r13, VERDICT r12 #4): all eight rules
    (seven + keep conjunction) must be conditional sums in ONE
    aggregation over ONE parquet scan — rule count never multiplies
    I/O."""
    plan = _plan(spark, sf_dir, "q_gopher_quality_rules")
    # node ids are stable: the single scan is the leaf node (1); the
    # formatted plan repeats node text in the detail section, so count
    # the id-pinned form
    assert plan.count("(1) Scan parquet") == 1, plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
