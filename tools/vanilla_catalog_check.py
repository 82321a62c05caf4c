"""Run EVERY registered query on a bare, driver-like SparkSession.

The driver's verify harness builds its own SparkSession without any of
session.get_spark's tuned confs (ANSI flag, UTC timezone, Arrow,
python.filterPushdown, nanosAsLong, broadcast threshold). A query that
silently assumes one of those confs passes the local pytest suite but
reddens on the driver — exactly how `q_python_datasource_project`
failed in round 6 (VERDICT r6 Wrong #1). This script is the 5-second
reproduction: execute every catalog entry on a session configured with
nothing but master/parallelism/housekeeping, and report the failures.

Run in a SUBPROCESS (fresh JVM) — in-process, getOrCreate() would
reuse the tuned session and prove nothing. tests/test_vanilla_session.py
wraps it.

Usage: python tools/vanilla_catalog_check.py [sf_dir] [name_filter...]
Exit 0 iff every query plans and executes.
"""

from __future__ import annotations

import json
import os
import sys
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    # Housekeeping only — NO semantic confs. Mirrors the driver's bare
    # session; anything a query needs it must set itself.
    spark = (
        SparkSession.builder.appName("vanilla-catalog-check")
        .master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "6g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )

    from batch_processing_etl_orchestration_spark.plans import QUERIES

    failures: dict[str, str] = {}
    # Overlap independent queries from a small driver thread pool
    # (optimization guide §2.6): the catalog is ~250 independent tiny
    # jobs whose cost is per-action latency, not throughput — run
    # sequentially this check was the single slowest test in the suite
    # (343 s of the driver's ~30 min pytest window; VERDICT r15 next
    # #2). Safe to overlap: query fns are pure plan builders, every
    # session-conf mutation in the package is a one-way idempotent
    # same-value set (the _blk_df convention), temp-view registrations
    # are same-content replaces of the same fixture tables, scenario
    # run-dirs are per-query, and tables.build_once serializes
    # same-family builds behind a per-name lock.
    def _run_one(item):
        name, spec = item
        try:
            n = len(spec.fn(spark, sf_dir).collect())
            print(f"ok   {name}: {n} rows", flush=True)
            return name, None
        except Exception:
            print(f"FAIL {name}", flush=True)
            return name, traceback.format_exc(limit=30)

    from concurrent.futures import ThreadPoolExecutor

    todo = [
        (n, s) for n, s in QUERIES.items() if not only or n in only
    ]
    n_run = len(todo)
    workers = max(1, int(os.environ.get("SPARK_GRAFT_CHECK_THREADS", "6")))
    with ThreadPoolExecutor(max_workers=workers) as pool:
        for name, tb in pool.map(_run_one, todo):
            if tb is not None:
                failures[name] = tb

    print(json.dumps({"run": n_run, "failed": sorted(failures)}))
    if failures:
        for name, tb in failures.items():
            sys.stderr.write(f"\n===== {name} =====\n{tb}\n")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
