"""Third scaling decade spot-check (VERDICT r9 stretch #7): time the
three heaviest LINEAR-claimed document queries — q_minhash_lsh_pairs,
q_exact_span_dedup, q_decontaminate_bloom — at sf10 and sf100 and
print warm sf10→sf100 ratios for BENCH_SF10.md.

All three read ONLY the documents table, so the sf100 fixture is
docs-only (~4 GB parquet instead of ~16 GB for all tables): 1000
key-offset replicas of the sf0.1 documents with the SAME
every-3rd-word replica-token transform as make_sf1 (cross-replica
Jaccard ≈ 0, constant near-dup density — imported from
tools/make_sf1.doc_transform so the construction cannot drift).
Replicas are written in chunks of 50 (appended) — a single 1000-way
union makes one enormous plan; 20 × 50-way unions keep planning flat.

Usage: python tools/bench_sf100.py [--build-only|--bench-only]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

REPLICAS = 1000
CHUNK = 50
SF100 = "/root/repo/.tmp/sf100"
SF10 = "/root/repo/.tmp/sf10"
MARKER = os.path.join(SF100, "_BUILD_OK")

QUERIES_3 = ["q_minhash_lsh_pairs", "q_exact_span_dedup", "q_decontaminate_bloom"]


def build(spark) -> None:
    from tools.make_sf1 import SRC, doc_transform

    from batch_processing_etl_orchestration_spark.tables import load_table

    if os.path.isfile(MARKER):
        print("sf100 docs already built")
        return
    base = load_table(spark, SRC, "documents")
    doc_off = base.agg(F.max("doc_id")).first()[0] + 1
    dest = os.path.join(SF100, "documents.parquet")
    import shutil

    shutil.rmtree(dest, ignore_errors=True)
    os.makedirs(SF100, exist_ok=True)
    t0 = time.perf_counter()
    for lo in range(0, REPLICAS, CHUNK):
        reps = []
        for r in range(lo, min(lo + CHUNK, REPLICAS)):
            df = base.withColumn("doc_id", F.col("doc_id") + F.lit(r * doc_off))
            reps.append(doc_transform(df, r))
        out = reps[0]
        for df in reps[1:]:
            out = out.unionByName(df)
        out.write.mode("append").parquet(dest)
        print(f"  replicas {lo}..{lo + len(reps) - 1} written", flush=True)
    n = spark.read.parquet(dest).count()
    with open(MARKER, "w") as f:
        f.write(f"{n}\n")
    print(f"sf100 documents: {n} rows in {time.perf_counter() - t0:.0f}s")


def bench(spark) -> None:
    from batch_processing_etl_orchestration_spark.plans import QUERIES

    results: dict[str, dict] = {}
    for name in QUERIES_3:
        fn = QUERIES[name].fn
        fn(spark, "/root/testdata/sf0.01").count()  # plan/JIT warm
        row: dict = {}
        for sf_key, sf_dir in (("sf10", SF10), ("sf100", SF100)):
            t0 = time.perf_counter()
            n = fn(spark, sf_dir).count()
            cold = time.perf_counter() - t0
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            warm = time.perf_counter() - t0
            row[sf_key] = {
                "rows": n, "cold": round(cold, 2), "warm": round(warm, 2)
            }
        row["ratio_warm"] = round(
            row["sf100"]["warm"] / max(0.01, row["sf10"]["warm"]), 2
        )
        row["ratio_cold"] = round(
            row["sf100"]["cold"] / max(0.01, row["sf10"]["cold"]), 2
        )
        results[name] = row
        print(f"RESULT {name} {json.dumps(row)}", flush=True)
    print("SUMMARY " + json.dumps(results), flush=True)


def main() -> None:
    from batch_processing_etl_orchestration_spark.session import get_spark

    spark = get_spark(
        "bench-sf100",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_conf={
            "spark.sql.shuffle.partitions": "128",
            "spark.driver.memory": "64g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    if "--bench-only" not in sys.argv:
        build(spark)
    if "--build-only" not in sys.argv:
        bench(spark)
    spark.stop()


if __name__ == "__main__":
    main()
