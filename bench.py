#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": N, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Execution is forced with the noop sink (full pipeline runs, nothing
collected to the driver) — the same way a cluster job would be bound
by the write stage, not driver materialization.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from batch_processing_etl_orchestration_spark.plans import QUERIES  # noqa: E402
from batch_processing_etl_orchestration_spark.plans.kernels import KERNEL_BENCH  # noqa: E402
from batch_processing_etl_orchestration_spark.session import get_spark  # noqa: E402

BENCH_QUERIES = [
    "q_pricing_summary",
    "q_hourly_net_by_type",
    "q_pivot_user_type_complete",
    "q_join_dim_chain",
    "q_join_fact_fact",
    "q_semi_join_dim",
    "q_grouped_stats",
    "q_sessionize_users",
    "q_window_lag",
    "q_dedup_exact_hash",
    "q_text_stats",
    "q_cosine_topk_bruteforce",
    # r4 (VERDICT r3 #1): headline-time the PRODUCTION kernels, not the
    # attestation variants whose exact-twin recompute dominated r3's
    # numbers. The attested q_simhash_pairs / q_ann_*_topk stay in the
    # driver correctness gate; these _raw entries resolve via
    # plans/kernels.py (KERNEL_BENCH), not the registry.
    "q_ann_lsh_topk_raw",
    "q_minhash_lsh_pairs",  # already kernel-only (oracle runs in DuckDB)
    "q_simhash_pairs_raw",
    # r2 breadth (VERDICT r1 #8): iterative, IVF, and streaming paths
    "q_dup_clusters",
    "q_ann_ivf_topk_raw",
    "q_ann_int8_topk_raw",
    "q_stream_hourly_window",
    "q_pipeline_eia930_net_gen",
    # r2 widened-coverage representatives: Expand reshape + broadcast ratio agg
    "q_unpivot_measures",
    "q_promo_revenue",
    # r3: full-DAG pivot replay (de-vacuated) + stdlib media decode
    "q_pipeline_eia930_pivot",
    "q_multimodal_decode",
    # r3 training-pipeline breadth: quality scoring over the word stream,
    # zero-shuffle int8 quantization, cluster-survivor resolution
    "q_unigram_logprob_quality",
    "q_embedding_quantize_int8",
    "q_dedup_keep_canonical",
    # r3 event analytics: one-shuffle funnel + cohort matrix
    "q_events_funnel",
    "q_cohort_retention",
    # r3 multimodal feature chain
    "q_audio_features",
    "q_image_channel_stats",
    # r5: SCD2 dimension merge, bloom-prefiltered decontamination,
    # streaming capped-session recurrence, PQ shortlist+rerank kernel,
    # sequence packing, image resize, snapshot CDC
    "q_scd2_customer_update",
    "q_decontaminate_bloom",
    "q_stream_sessionize_capped",
    "q_ann_pq_topk_raw",
    "q_pack_sequences",
    "q_image_resize_thumb",
    "q_corpus_snapshot_diff",
    "q_corpus_assembly",
    # r6: warehouse maintenance + quality operators — incremental MV
    # (full scenario: build + 2 merge refreshes), HLL-partial rollup,
    # streaming MV drain, one-pass profiler, z-order lookup (cold run
    # pays the clustering write), MG heavy hitters, DQ audit, FK audit
    "q_incremental_mv_refresh",
    "q_hll_mv_distinct_users",
    "q_stream_incremental_mv",
    "q_profile_events",
    "q_zorder_pointlookup",
    "q_heavy_hitters_words",
    "q_dq_expectations",
    "q_referential_integrity",
    "q_bm25_topk",
    "q_hybrid_search_rrf",
    "q_lambda_serving",
    "q_histogram_mv_quantiles",
    "q_fuzzy_join_names",
    "q_pagerank_orders",
    "q_time_travel_read",
    "q_gdpr_erase_versioned",
    # r6 (cont.): copy-on-write MERGE commit (build + merge, cold),
    # shuffle-free sliding-window chunking, two-phase prefix-sum
    # token-budget sampling
    "q_merge_versioned",
    "q_chunk_documents",
    "q_token_budget_sample",
    # r6 (cont.): exact-deterministic Lloyd iterations (2 rounds, k=8),
    # cluster-representative semantic dedup, manifest-schema evolution
    "q_semantic_kmeans",
    "q_semantic_dedup_keep",
    "q_schema_evolution_read",
    # r6 (cont.): oriented triangle counting + cluster-keyed split,
    # prefix-sum sharding, positional phrase retrieval
    "q_triangle_count",
    "q_leakage_safe_split",
    "q_training_shards",
    "q_phrase_search",
    # r6 (cont.): incremental batch-vs-corpus LSH dedup, histogram
    # winsorization, grid-blocked spatial radius join
    "q_dedup_delta_batch",
    "q_winsorize_values",
    "q_geo_radius_join",
    # r6 (cont.): exactly-once streaming CDC upsert via MERGE,
    # NEAR/k proximity retrieval, per-dim embedding z-scoring
    "q_stream_merge_upserts",
    "q_proximity_search",
    "q_embedding_standardize",
    # r6 (cont.): version CDF diff + ES weighted sampling, per-group
    # OLS sufficient statistics, segmented index maintenance
    "q_table_changes",
    "q_weighted_sample_tokens",
    "q_trend_slope_by_type",
    "q_index_segment_add",
    # r6 (cont.): end-to-end exact cluster-routed ANN, tombstone
    # deletes on the posting index
    "q_ann_cluster_route",
    "q_index_delete_docs",
    # r6 (cont.): decorrelated Q21-shape + masking view, doubling
    # closure hierarchy rollup
    "q_sole_blame_supplier",
    "q_masked_customers",
    "q_hierarchy_rollup",
    "q_sequence_pattern",
    "q_hll_overlap_users",
    # r6 (cont.): perceptual image + acoustic dedup (4th/5th modality)
    "q_image_neardup_ahash",
    "q_audio_neardup_fp",
    "q_chisq_type_dow",
    "q_decile_lift",
    "q_bigram_logprob_quality",
    "q_freshness_audit",
    # r7: exact EWMA over the aggregated day domain, sort-scan skyline,
    # skew-safe two-phase time-weighted average, end-to-end entity
    # resolution (deletion-neighborhood match + pointer-jump CC)
    "q_ewma_daily_value",
    "q_pareto_frontier_parts",
    "q_time_weighted_avg",
    "q_entity_resolution",
    # r8: segmented skew-safe sessionization (hot-user window bound),
    # hash-ring negative sampling over the dense renumber, median+MAD
    # robust outliers
    "q_sessionize_skew_safe",
    "q_negative_sampling",
    "q_mad_robust_outliers",
    # r8 (cont.): bounded BFS reachability, metadata-only RESTORE +
    # reference-counted VACUUM, exact 5-gram span dedup
    "q_khop_reach",
    "q_restore_versioned",
    "q_vacuum_versioned",
    "q_exact_span_dedup",
    # r8 (cont.): customer-analytics / distribution-diagnostics family
    "q_rfm_segments",
    "q_markov_transitions",
    "q_attribution_last_touch",
    "q_key_skew_report",
    "q_value_drift_tvd",
    "q_corr_matrix_exact",
    # r8 (cont.): basket-bounded association self-join, Benford
    # first-digit forensics, asymmetric containment near-dup
    "q_market_basket_lift",
    "q_benford_deviation",
    "q_ngram_containment_pairs",
    # r8 (cont.): gaps-and-islands interval coverage, k-anonymity audit
    "q_interval_islands",
    "q_k_anonymity_audit",
    # r8 (cont.): Q2-shape groupwise argmin (window, no join-back)
    "q_min_cost_supplier",
    # r8 (cont.): engagement stickiness, Heaps-law vocabulary growth
    "q_dau_wau_stickiness",
    "q_vocab_growth",
    # r8 (cont.): two-sided integer-exact CUSUM change-point walk
    "q_cusum_changepoint",
    # r8 (cont.): the four remaining classic TPC-H join shapes
    "q_market_share",
    "q_product_type_profit",
    "q_returned_items",
    "q_customer_order_distribution",
    # r8 (cont.): Kaplan-Meier survival, weekday seasonal decomposition
    "q_survival_km",
    "q_seasonal_dow_decompose",
    # r8 (cont.): Welch A/B readout, soft-dedup reweighting,
    # cross-source 3-gram contamination matrix
    "q_ab_welch_ttest",
    "q_dedup_soft_reweight",
    "q_cross_source_overlap",
    # r8 (cont.): the five remaining TPC-H subquery shapes
    "q_late_ship_priority",
    "q_important_parts",
    "q_top_revenue_supplier",
    "q_part_supplier_variety",
    "q_dominant_suppliers",
    # r9: df-cap attestation row for the capped shingle pair joins
    "q_shingle_df_cap_report",
    # r10: tokenizer-exact BPE counting + BPE-budget packing (VERDICT
    # r9 #2), inline adversarial-shape attestation (r9 #6)
    "q_bpe_token_count",
    "q_pack_sequences_bpe",
    "q_adversarial_skew_report",
    "q_bpe_encode_ids",
    # r11: id stream under the saturated 383-merge sf1-trained table,
    # and the per-source tokenizer-fertility (proxy-drift) audit
    "q_bpe_encode_ids_satvocab",
    "q_bpe_proxy_drift",
    # r12: id stream under the sf10-trained 3,263-merge table (the
    # first organically multi-thousand-merge table; VERDICT r11 #4)
    "q_bpe_encode_ids_sf10vocab",
    # r12: model-based data selection — closed-form NB quality
    # classifier and DSIR hashed-feature importance resampling
    "q_nb_quality_classifier",
    "q_dsir_importance_weights",
    # r13: block-max BM25 pruning attestation, streaming quality gate,
    # Gopher heuristic rule audit
    "q_bm25_blockmax_prune_report",
    "q_stream_quality_filter",
    "q_gopher_quality_rules",
    # r14: impact-ordered pruning attestation, vector-index lifecycle,
    # streaming index maintenance, gated corpus assembly
    # (VERDICT r13 #1/#2/#3/#6)
    "q_bm25_impact_prune_report",
    "q_ann_ivf_lifecycle",
    "q_stream_index_maintain",
    "q_corpus_assembly_v2",
    # r15: streaming vector-index maintenance (VERDICT r14 #2) and
    # streamed impact-ordered text-index maintenance (VERDICT r14 #6)
    "q_stream_ivf_maintain",
    "q_stream_index_maintain_impact",
    # r15: hybrid RRF served from the persisted indexes (VERDICT r14 #3)
    "q_hybrid_search_rrf_served",
]

# Queries whose WORKLOAD changed since the newest committed BENCH_r*.json
# (baseline timing no longer comparable). Prune entries once a BENCH
# file recorded under the NEW workload becomes the baseline. The r5
# exemptions (q_dup_clusters pointer jumping, q_dedup_keep_canonical
# persisted labels) were pruned in r6: BENCH_r05 already times the
# changed workloads, so the guard now covers them again.
BASELINE_EXEMPT: set[str] = set()
# (r13's q_nb_quality_classifier and q_adversarial_skew_report
# exemptions were pruned in r14: the committed r13 BENCH_LOCAL.json
# baseline already times the capped-NB and grown-skew workloads, so
# the guard covers both again — VERDICT r13 #5.)
# (r9's q_ngram_containment_pairs exemption — df-capped candidate
# generation changed the workload — was pruned the same round: the
# promoted BENCH_LOCAL.json baseline already times the capped shape.)
# (r7's q_fuzzy_join_names exemption was pruned the same round: the
# committed BENCH_LOCAL.json baseline is already recorded under the
# deletion-neighborhood scheme.)


def _baseline(sf: float, here: str | None = None) -> tuple[
    dict[str, float], float | None, float | None, dict[str, int]
]:
    """(per-query seconds, scan-probe seconds, shuffle-probe seconds,
    per-query output row counts) from the newest committed BENCH
    artifact whose sf matches; absent fields → None / {}. The
    committed BENCH_LOCAL.json (full result written by the previous
    round's bench run) is preferred as newest — the driver's
    BENCH_r*.json tail-capture can truncate the queries dict (r6
    landed parsed=null) while the local file always carries the
    complete object. Falls back to the newest parseable BENCH_r*.json
    ({"parsed": {...}} driver shape); rounds before r6 predate the
    probes and rounds before r10 predate the shuffle probe and row
    counts."""
    import glob
    import re

    def _unpack(rec):
        p = rec.get("probe_sec")
        ps = rec.get("probe_shuffle_sec")
        rows = rec.get("rows")
        return (
            rec["queries"],
            float(p) if isinstance(p, (int, float)) and p > 0 else None,
            float(ps) if isinstance(ps, (int, float)) and ps > 0 else None,
            rows if isinstance(rows, dict) else {},
        )

    if here is None:
        here = os.path.dirname(os.path.abspath(__file__))
    try:
        with open(os.path.join(here, "BENCH_LOCAL.json")) as f:
            rec = json.load(f)
        if rec.get("sf") == sf and isinstance(rec.get("queries"), dict):
            return _unpack(rec)
    except (OSError, ValueError):
        pass

    best: tuple = ({}, None, None, {})
    best_round = -1
    for path in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m or int(m.group(1)) <= best_round:
            continue
        try:
            with open(path) as f:
                rec = json.load(f)
        except (OSError, ValueError):
            continue
        parsed = rec.get("parsed") or {}
        if rec.get("sf") == sf and isinstance(parsed.get("queries"), dict):
            best, best_round = _unpack(parsed), int(m.group(1))
    return best


def _row_regressions(
    row_counts: dict[str, int],
    base_rows: dict[str, int],
    exempt: set[str],
) -> list[str]:
    """Row-count guard core (VERDICT r9 next #3), pure so tests can pin
    it: counts at a fixed sf are deterministic (test_determinism.py),
    so a single row of drift vs the baseline is a correctness
    regression. Equality check — no calibration, no slack. Queries
    absent from the baseline (new this round) and BASELINE_EXEMPT
    (workload changed) are skipped; they enter the baseline on the
    next guarded promotion. Baseline queries ABSENT from the current
    run also fail (ADVICE r10 #1): a headline query accidentally
    dropped from BENCH_QUERIES (or a name typo) must not silently
    vanish from the guard and promote a shrunken baseline — removing
    one on purpose requires a BASELINE_EXEMPT entry until the new
    baseline lands."""
    deltas = [
        f"{name}: {row_counts[name]} rows vs baseline {base_rows[name]}"
        for name in row_counts
        if name in base_rows
        and name not in exempt
        and row_counts[name] != base_rows[name]
    ]
    dropped = [
        f"{name}: in baseline ({base_rows[name]} rows) but absent from "
        "this run — dropped from BENCH_QUERIES?"
        for name in base_rows
        if name not in row_counts and name not in exempt
    ]
    return deltas + dropped


def _tail_queries(per_query: dict[str, float], budget: int = 1350) -> dict[str, float]:
    """Compact per-query dict for the driver's stdout tail window
    (VERDICT r15 next #1): the driver archives only the LAST ~2000
    characters of bench stdout and parses the final JSON line, so the
    full 148-entry dict (~4 KB) physically cannot reach it. Emit the
    most-expensive-first prefix that fits a fixed character budget —
    regressions worth seeing live at the top of the bill, and the
    driver's per-query comparison gets a real intersection instead of
    an empty one. The COMPLETE dict still goes to stdout's first line
    and to BENCH_LOCAL.candidate.json unchanged."""
    out: dict[str, float] = {}
    used = 2  # braces
    for name, t in sorted(per_query.items(), key=lambda kv: (-kv[1], kv[0])):
        frag = len(name) + len(f"{t:.2f}") + 6  # "name": 1.23,
        if used + frag > budget:
            break
        out[name] = round(t, 2)
        used += frag
    return out


def _should_promote(
    baseline_sf, baseline_cpus, sf: float, cpus: int
) -> bool:
    """Baseline-promotion gate, pure so tests can pin it (VERDICT r15
    next #1b): a guard-green run may replace the committed regression
    baseline ONLY at the same sf AND the same core count. The r15
    driver's $SPARK_GRAFT_CPUS=8 scaling run passed the probe-
    calibrated guard (the shuffle probe scales with cores, so
    calibration absorbed the slowdown) and installed its 279 s 8-core
    numbers over the 32-core baseline — loosening every next-round
    comparison ~1.2x. Missing fields on an old baseline default to the
    documented headline shape (sf0.1, 32 cores) so a legacy baseline
    is only ever replaced by a run of that shape."""
    if baseline_sf is None:
        baseline_sf = 0.1
    if baseline_cpus is None:
        baseline_cpus = 32
    return baseline_sf == sf and baseline_cpus == cpus


def _calibration_probe(spark) -> float:
    """Fixed-work host-speed probe (VERDICT r5 #3): a pinned-size
    JVM-side aggregation (xxhash64 over 2e8 longs, 32 splits) whose
    cost depends only on host CPU throughput, never on query plans or
    data. The guard calibrates by probe_now / probe_baseline, which
    separates machine drift from plan regressions MECHANICALLY: a
    loaded host slows probe and queries alike (ratio cancels), while a
    bad session config or plan change slows queries but not the probe
    and trips the guard. Best-of-3 discards transient scheduler
    noise."""
    from pyspark.sql import functions as F

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(0, 200_000_000, 1, 32).agg(
            F.sum(F.xxhash64("id"))
        ).collect()
        times.append(time.perf_counter() - t0)
    return round(min(times), 4)


def _calibration_probe_shuffle(spark) -> float:
    """Second fixed-work probe, SHUFFLE-shaped (VERDICT r9 next #4):
    a pinned-size groupBy over generated strings (20M rows → 1M
    distinct keys, 32 splits) that exercises hash-shuffle write/read,
    string hashing, and hash aggregation — the stage mix most headline
    queries actually spend their time in, which the scan-shaped
    xxhash64 probe does not touch. r9 showed the failure mode of a
    single probe shape: the scan probe moved 8% faster while the mixed
    workload stayed flat, so every probe-calibrated comparison read
    ~1.10x "slower" uniformly. With both shapes the guard flags a
    query only when it regresses under the MORE generous calibration
    (see main) — a real plan regression is probe-independent, while
    probe/workload divergence moves one shape but not both.
    Best-of-3 discards transient scheduler noise."""
    from pyspark.sql import functions as F

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        (
            spark.range(0, 20_000_000, 1, 32)
            .select(F.concat(F.lit("k"), F.col("id") % 1_000_000).alias("k"))
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("n"))
            .write.mode("overwrite")
            .format("noop")
            .save()
        )
        times.append(time.perf_counter() - t0)
    return round(min(times), 4)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bpeo-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm EVERY headline query once at the smallest SF so the timed
    # pass measures the plan, not first-run overheads: whole-stage
    # codegen JIT, Python worker spawn (an applyInPandas(WithState)
    # query pays ~5-7s of worker + Arrow + state-store init the first
    # time — measured 9.6s cold vs 2.2s warm on an idle host), and
    # shuffle/broadcast machinery. Warm-cache timing is only ever ≤
    # cold timing, so pre-probe baselines recorded colder stay a
    # conservative bar.
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        for name in BENCH_QUERIES:
            fn = QUERIES[name].fn if name in QUERIES else KERNEL_BENCH.get(name)
            if fn is not None:
                fn(spark, warm_dir).write.mode("overwrite").format("noop").save()

    # Build-once cache visibility (VERDICT r15 next #6): persisted
    # artifact families (postings/impact/IVF indexes, the bigram LM,
    # MVs, scenario stores) are built once per fixture generation under
    # .tmp and survive across bench runs, so their queries time SERVING
    # only once warm. Print which families this run found warm vs built
    # cold (with the cold build's seconds) so a cold host's numbers are
    # explicable and a regression in build cost cannot hide. The warm
    # pass above already forced every family to resolve.
    from batch_processing_etl_orchestration_spark import tables as _tables

    print(json.dumps({"build_cache": _tables.BUILD_ONCE_STATS}))

    probe_sec = _calibration_probe(spark)
    probe_shuffle_sec = _calibration_probe_shuffle(spark)

    per_query: dict[str, float] = {}
    for name in BENCH_QUERIES:
        if name in QUERIES:
            fn = QUERIES[name].fn
        elif name in KERNEL_BENCH:
            fn = KERNEL_BENCH[name]
        else:
            continue
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        per_query[name] = round(time.perf_counter() - t0, 3)

    # Row-count pass (VERDICT r9 next #3): an UNTIMED .count() per
    # headline query, recorded beside the wall times and guarded
    # against the baseline. Row counts at a fixed sf are deterministic
    # (test_determinism.py), so ANY delta is a correctness regression
    # — the class bench was blind to until now (the r8 pathGlobFilter
    # bug silently drained 9 streams empty with rc=0, caught only by
    # the next sf1 oracle sweep). Separate pass so the timed numbers
    # keep measuring the plan's own write-bound execution, not a
    # count's pruned twin.
    row_counts: dict[str, int] = {}
    for name in per_query:
        fn = QUERIES[name].fn if name in QUERIES else KERNEL_BENCH[name]
        row_counts[name] = fn(spark, sf_dir).count()

    # Regression guard (VERDICT r2 #7): fail if any query runs >1.5x its
    # newest committed same-sf baseline AFTER normalizing for machine-
    # speed drift. The baseline was recorded under that run's host
    # conditions; comparing absolute seconds across different load makes
    # every query flake together.
    #
    # Primary calibration (VERDICT r5 #3): the FIXED-WORK probe ratio
    # probe_now / probe_baseline. Unlike the query-median fallback, the
    # probe cannot be moved by the code under test, so a genuine
    # everything-slower change (bad session config) still trips the
    # guard while true host drift cancels. Fallback when the baseline
    # round predates the probe: the median slowdown across guarded
    # NON-EXEMPT queries (exempt ones changed workload by definition —
    # including them would inflate the median and loosen the guard for
    # everyone). The +0.75s absolute slack keeps sub-second queries
    # from flaking on scheduler noise.
    baseline, base_probe, base_probe_shuffle, base_rows = _baseline(sf)
    # Two probe shapes, one rule (VERDICT r9 next #4): calibrate by
    # the MORE generous of the two probe ratios. A genuine plan
    # regression slows the query without moving either probe, so it
    # exceeds the threshold under both; a probe/workload divergence
    # (r9: the scan probe alone sped up 8%) moves one shape only and
    # no longer taints every comparison. Baselines recorded before r10
    # carry no shuffle probe — the scan ratio then stands alone, as
    # before.
    ratios = []
    if base_probe:
        ratios.append(probe_sec / base_probe)
    if base_probe_shuffle:
        ratios.append(probe_shuffle_sec / base_probe_shuffle)
    if ratios:
        med = max(ratios)
        how = "probe x" + "/".join(f"{r:.2f}" for r in ratios)
    else:
        env = sorted(
            t / baseline[name]
            for name, t in per_query.items()
            if name in baseline
            and name not in BASELINE_EXEMPT
            and baseline[name] > 0
        )
        med = env[len(env) // 2] if env else 1.0
        how = f"env median x{med:.2f}"
    calib = max(1.0, med)  # a faster machine must not loosen the guard

    def _over(name: str, t: float) -> bool:
        return t > max(
            1.5 * calib * baseline[name], calib * baseline[name] + 0.75
        )

    suspects = [
        name
        for name, t in per_query.items()
        if name in baseline and name not in BASELINE_EXEMPT and _over(name, t)
    ]
    if suspects:
        # Re-time suspects before flagging: a genuine plan regression
        # reproduces on retry, while a transient host spike (this VM's
        # neighbors move the fixed-work probe itself by 2x between
        # runs) does not. min-of-2 is the standard noise-robust
        # estimator; the retried time replaces the spiked sample in
        # the emitted JSON too, so a spike can't poison the next
        # round's baseline. A fresh probe taken WITH the retries
        # rescales the threshold to host speed at retry time — a
        # minutes-long slow phase covering both samples widens the
        # bar instead of reading as a regression (a real plan change
        # slows queries without moving the probe).
        for name in suspects:
            fn = QUERIES[name].fn if name in QUERIES else KERNEL_BENCH[name]
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            per_query[name] = min(per_query[name], round(time.perf_counter() - t0, 3))
        scale = max(
            _calibration_probe(spark) / probe_sec,
            _calibration_probe_shuffle(spark) / probe_shuffle_sec,
        )
        calib = max(calib, med * scale)

    total = round(sum(per_query.values()), 3)
    result = {
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": per_query,
        "rows": row_counts,
        "sf": sf,
        "cpus": cpus,
        "probe_sec": probe_sec,
        "probe_shuffle_sec": probe_shuffle_sec,
        # Final cache state: includes families built cold INSIDE the
        # timed region at this run's sf (the warm pass only resolves
        # the sf0.001 tags).
        "build_cache": _tables.BUILD_ONCE_STATS,
    }
    print(json.dumps(result))
    # The driver archives only a tail window of this output, and the
    # full per-query dict no longer fits in it (BENCH_r06.json landed
    # with parsed=null, VERDICT r6 Missing #2). Two mitigations:
    # (1) persist the complete object to BENCH_LOCAL.candidate.json —
    # promoted to BENCH_LOCAL.json (the committed regression baseline)
    # ONLY after the regression guard passes, so a run that trips the
    # guard cannot install its own slow numbers as next round's
    # baseline and self-ratify (ADVICE r7 medium) — and (2) finish
    # stdout with a SHORT summary line — guaranteed to sit whole
    # inside any tail window — that carries the headline numbers plus
    # a pointer.
    here = os.path.dirname(os.path.abspath(__file__))
    candidate_path = os.path.join(here, "BENCH_LOCAL.candidate.json")
    try:
        with open(candidate_path, "w") as f:
            json.dump(result, f, indent=1)
            f.write("\n")
    except OSError:
        pass
    spark.stop()
    # Final summary line — guaranteed to sit whole inside the driver's
    # ~2000-char stdout tail. It now carries a compact per-query dict
    # (most-expensive-first prefix that fits the window, seconds
    # rounded to 2 decimals) so PERF_r*'s per-query comparison and
    # geomean are populated again (VERDICT r15 next #1a); the COMPLETE
    # 148-entry dict is on stdout's first JSON line and in
    # BENCH_LOCAL.candidate.json, values unchanged.
    tail_q = _tail_queries(per_query)
    print(
        json.dumps(
            {
                "metric": result["metric"],
                "value": total,
                "unit": "sec",
                "sf": sf,
                "cpus": cpus,
                "probe_sec": probe_sec,
                "probe_shuffle_sec": probe_shuffle_sec,
                "n_queries": len(per_query),
                "queries": tail_q,
                "n_queries_in_tail": len(tail_q),
                "queries_file": "BENCH_LOCAL.json",
            },
            separators=(",", ":"),
        )
    )

    regressions = [
        f"{name}: {per_query[name]:.3f}s vs baseline {baseline[name]:.3f}s ({how})"
        for name in suspects
        if _over(name, per_query[name])
    ]
    # Row-count guard (VERDICT r9 next #3): fail hard, never promote.
    row_regressions = _row_regressions(row_counts, base_rows, BASELINE_EXEMPT)
    if regressions or row_regressions:
        if regressions:
            print(
                "BENCH REGRESSION: " + "; ".join(regressions), file=sys.stderr
            )
        if row_regressions:
            print(
                "BENCH ROW-COUNT REGRESSION: " + "; ".join(row_regressions),
                file=sys.stderr,
            )
        sys.exit(1)
    # Guard passed: promote this run's full result to the committed
    # baseline file (atomic rename — a crash mid-promote leaves the
    # old baseline intact). Only at the SAME sf AND the same core
    # count as the current baseline (_should_promote): an sf0.01
    # iteration run must not clobber the sf0.1 baseline, and the
    # driver's 8-core scaling run must not clobber the 32-core one
    # (it did in r15 — the probe calibration absorbed the core-count
    # slowdown, so the guard alone could not refuse it).
    local_path = os.path.join(here, "BENCH_LOCAL.json")
    try:
        with open(local_path) as f:
            _b = json.load(f)
        baseline_sf, baseline_cpus = _b.get("sf"), _b.get("cpus")
    except (OSError, ValueError):
        baseline_sf, baseline_cpus = None, None
    if _should_promote(baseline_sf, baseline_cpus, sf, cpus):
        try:
            os.replace(candidate_path, local_path)
        except OSError:
            pass


if __name__ == "__main__":
    main()
