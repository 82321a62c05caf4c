#!/usr/bin/env python
"""Per-job wall-clock attribution for one or more registered queries
(r15 optimization round, guide §1: measure first).

Runs each named query once at $SPARK_GRAFT_SF_DIR with the noop sink
on a session whose UI is ENABLED, then scrapes the UI REST API
(/api/v1/applications/<id>/jobs) and prints every Spark job the query
submitted — duration, stage count, task count, description — so the
expensive phase inside a multi-job query (index build, stream drain,
attestation scan) is named instead of guessed. Loopback only; the
bench itself keeps the UI off.

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
        python tools/profile_query.py q_stream_index_maintain_impact
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from batch_processing_etl_orchestration_spark.plans import QUERIES  # noqa: E402
from batch_processing_etl_orchestration_spark.plans.kernels import (  # noqa: E402
    KERNEL_BENCH,
)
from batch_processing_etl_orchestration_spark.session import get_spark  # noqa: E402


def _jobs(ui: str, app_id: str, after: int) -> list[dict]:
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/jobs?status=succeeded", timeout=10
    ) as r:
        rows = json.load(r)
    out = [j for j in rows if j["jobId"] > after]
    out.sort(key=lambda j: j["jobId"])
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:]
    spark = get_spark(
        "profile-query", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    for name in names:
        fn = QUERIES[name].fn if name in QUERIES else KERNEL_BENCH[name]
        # warm pass at the smallest sf mirrors bench.py's methodology
        warm = "/root/testdata/sf0.001"
        if os.path.isdir(warm):
            fn(spark, warm).write.mode("overwrite").format("noop").save()
        before = _jobs(ui, app_id, -1)
        last = before[-1]["jobId"] if before else -1
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        wall = time.perf_counter() - t0
        jobs = _jobs(ui, app_id, last)
        print(f"\n=== {name}: {wall:.3f}s wall, {len(jobs)} jobs ===")
        tot = 0.0
        agg: dict[str, list[float]] = {}
        for j in jobs:
            t_sub = time.strptime(j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S")
            t_end = time.strptime(j["completionTime"][:19], "%Y-%m-%dT%H:%M:%S")
            # second resolution is fine for ranking; use numTasks for size
            dur = time.mktime(t_end) - time.mktime(t_sub)
            # fall back to ms fields when present
            try:
                ms = (
                    int(j["completionTime"][20:23])
                    - int(j["submissionTime"][20:23])
                ) / 1000.0
                dur += ms
            except (ValueError, IndexError):
                pass
            tot += dur
            desc = (j.get("description") or j.get("name") or "")[:110]
            agg.setdefault(desc.split("\n")[0], []).append(dur)
            print(
                f"  job {j['jobId']:>4}  {dur:7.3f}s  "
                f"tasks={j.get('numTasks', '?'):>5}  {desc}"
            )
        print(f"  -- sum of job wall times: {tot:.3f}s "
              "(gaps to query wall = driver-side/planning time)")
        print("  -- by description (sum, n):")
        for d, ts in sorted(agg.items(), key=lambda kv: -sum(kv[1])):
            print(f"     {sum(ts):7.3f}s  n={len(ts):>3}  {d[:100]}")
    spark.stop()


if __name__ == "__main__":
    main()
