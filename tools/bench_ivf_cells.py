"""The IVF quantizer-scaling knob, measured (r15): the ANN decade
showed the persisted probe is LINEAR per decade at frozen n_cells=8 —
probed volume is n_probe/n_cells of the corpus, a constant fraction.
Production IVF scales the cell count with the corpus (n_cells ~ √N)
so per-probe work grows ~√N instead. This harness builds IvfIndex
over the sf100 replicated embeddings (5M vectors, dim 64) at n_cells
in {8, 64, 256} (n_probe=4 fixed) and times the warm probe, proving
the knob works in THIS engine: assignment is one Arrow matmul pass
(cost ~linear in n_cells but amortized at build), the probe's scanned
fraction is n_probe/n_cells (partition-pruned on cell_id).

Prints RESULT lines per cell count (build time, warm probe median of
3, rows scanned fraction) for BENCH_SF10.md. TIMED — run exclusively.

Usage: python tools/bench_ivf_cells.py [--cells 8,64,256]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF100 = "/root/repo/.tmp/sf100"
ROOT = "/root/repo/.tmp/ivfcells"
CELLS = [8, 64, 256]
N_PROBE = 4
REPS = 3


def main() -> None:
    from batch_processing_etl_orchestration_spark.operators.similarity import (
        IvfIndex,
    )
    from batch_processing_etl_orchestration_spark.session import get_spark
    from batch_processing_etl_orchestration_spark.tables import load_table

    cells = CELLS
    if "--cells" in sys.argv:
        idx = sys.argv.index("--cells")
        if idx + 1 >= len(sys.argv):
            sys.exit("usage: --cells 8,64,256")
        cells = [int(c) for c in sys.argv[idx + 1].split(",") if c]

    spark = get_spark(
        "bench-ivf-cells",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_conf={
            "spark.sql.shuffle.partitions": "64",
            "spark.driver.memory": "64g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    e = load_table(spark, SF100, "embeddings")
    c = e.select(
        F.col("vec_id").alias("cand_id"), F.col("embedding").alias("ce")
    )
    q = e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    results: dict[str, dict] = {}
    for n_cells in cells:
        path = os.path.join(ROOT, f"c{n_cells}")
        marker = os.path.join(path, "_BUILD_OK")
        if os.path.isfile(marker):
            build_sec = None
            print(f"c{n_cells}: already built", flush=True)
        else:
            import shutil

            shutil.rmtree(path, ignore_errors=True)
            t0 = time.perf_counter()
            IvfIndex.build(spark, c, path, n_cells=n_cells, dim=64)
            build_sec = round(time.perf_counter() - t0, 1)
            open(marker, "w").close()
        idx = IvfIndex.load(spark, path)
        # the probe returns 5 queries x top-10; count() drives the scan
        idx.probe(q, k=10, n_probe=N_PROBE).count()  # warm-up
        times = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            idx.probe(q, k=10, n_probe=N_PROBE).count()
            times.append(time.perf_counter() - t0)
        row = {
            "n_cells": n_cells,
            "n_probe": N_PROBE,
            "scan_fraction": round(N_PROBE / n_cells, 4),
            "build_sec": build_sec,
            "probe_med": round(statistics.median(times), 3),
            "probe_all": [round(t, 3) for t in times],
        }
        results[f"c{n_cells}"] = row
        print(f"RESULT c{n_cells} {json.dumps(row)}", flush=True)
    print("SUMMARY " + json.dumps(results), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
