"""Registry ordering contract: un-attested queries lead, and the
attested green tail rotates with the round number so the driver's
fixed-size correctness window re-attests every query periodically
(VERDICT r2 #3 / ADVICE r2)."""

from __future__ import annotations

from batch_processing_etl_orchestration_spark.plans import registry as R


def test_unattested_queries_lead():
    green = R._attested_names()
    names = R.ordered_names()
    n_pending = sum(1 for n in names if n not in green)
    assert all(n not in green for n in names[:n_pending])
    assert set(names) == set(R.QUERIES)


def test_green_tail_rotation_tiles_catalog():
    """Simulated successive rounds must push every registered query
    through a 50-row prefix within a bounded number of rounds."""
    green = R._attested_names()
    if len(green) < 10:
        return  # nothing meaningful to rotate yet
    names = list(R.QUERIES)
    pending = [n for n in names if n not in green]
    tail = [n for n in names if n in green]
    stride = max(1, 50 - len(pending))
    seen: set[str] = set()
    for rnd in range(1, 6):
        k = (rnd * stride) % len(tail)
        window = (pending + tail[k:] + tail[:k])[:50]
        seen |= set(window)
    assert seen == set(names), sorted(set(names) - seen)


def test_oracle_map_subset_of_queries():
    from batch_processing_etl_orchestration_spark.plans.registry import (
        all_oracle_sql,
        all_queries,
    )

    qs, osql = all_queries(), all_oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) == len(R.QUERIES)


def test_kernel_bench_entries_are_unregistered_and_runnable(spark):
    """Bench-only raw kernels (VERDICT r3 #1) must not leak into the
    driver registry (catalog stays 100% oracled) and must build plans."""
    from batch_processing_etl_orchestration_spark.plans import QUERIES
    from batch_processing_etl_orchestration_spark.plans.kernels import KERNEL_BENCH

    assert set(KERNEL_BENCH).isdisjoint(QUERIES)
    for fn in KERNEL_BENCH.values():
        df = fn(spark, "/root/testdata/sf0.001")
        assert df.columns  # plan builds; execution covered by bench/tests
