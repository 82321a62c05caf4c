"""Catalog-wide row-count tripwire for the NON-headline queries
(VERDICT r10 next #4): bench.py's row guard covers the BENCH_QUERIES
headline set; the other ~100 registered queries previously had no
between-sweep tripwire, so a silent empty-result regression in one of
them was invisible until the next full sf1 oracle sweep.

This tool runs an UNTIMED .count() for every registered query NOT in
BENCH_QUERIES at a fixed sf (counts at fixed sf are deterministic —
tests/test_determinism.py) and diffs against the committed store
ROWCOUNTS.json. Any delta, any missing query, and any stored query no
longer registered exits nonzero — the same no-slack equality contract
as bench's guard. bench.py's BASELINE_EXEMPT is honored for queries
whose workload deliberately changed this round.

Usage:
    python tools/rowcount_guard.py            # guard (exit 1 on drift)
    python tools/rowcount_guard.py --update   # re-record the store
    SPARK_GRAFT_SF_DIR=... overrides the fixture dir (default sf0.1,
    matching bench; the store records which dir it was built from and
    the guard refuses to compare across dirs).

Round protocol: run the guard each round beside bench.py; after
registering new queries (or an exempted workload change), verify them,
then --update and commit ROWCOUNTS.json in the same change.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STORE = os.path.join(REPO, "ROWCOUNTS.json")


def main() -> None:
    sys.path.insert(0, REPO)
    import bench
    from batch_processing_etl_orchestration_spark.plans import QUERIES
    from batch_processing_etl_orchestration_spark.session import get_spark

    update = "--update" in sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = [n for n in QUERIES if n not in set(bench.BENCH_QUERIES)]

    spark = get_spark("bpeo-rowcount-guard")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.perf_counter()
    counts: dict[str, int] = {}
    for name in names:
        try:
            counts[name] = QUERIES[name].fn(spark, sf_dir).count()
        except Exception as exc:  # a query that ERRORS is a regression too
            counts[name] = -1
            print(f"ERROR {name}: {exc}", file=sys.stderr)
    elapsed = round(time.perf_counter() - t0, 1)
    spark.stop()

    if update:
        # Refuse BEFORE writing: serializing an erroring query's -1
        # would make every later guard run compare -1 == -1 and print
        # OK — permanently masking the exact regression class this
        # tool exists to catch (review r11).
        bad = sorted(n for n, c in counts.items() if c < 0)
        if bad:
            print(f"REFUSING to bless erroring queries (store untouched): "
                  f"{bad}", file=sys.stderr)
            sys.exit(1)
        with open(STORE, "w") as f:
            json.dump(
                {"v": 1, "sf_dir": sf_dir,
                 "counts": {k: counts[k] for k in sorted(counts)}},
                f, indent=1,
            )
            f.write("\n")
        print(f"recorded {len(counts)} non-headline counts to {STORE} "
              f"({elapsed}s)")
        return

    try:
        with open(STORE) as f:
            doc = json.load(f)
    except (OSError, ValueError):
        print(f"no readable store at {STORE} — run with --update first",
              file=sys.stderr)
        sys.exit(1)
    if doc.get("sf_dir") != sf_dir:
        print(f"store was recorded at {doc.get('sf_dir')}, this run is "
              f"{sf_dir} — counts are not comparable; re-run with the "
              "store's dir or --update", file=sys.stderr)
        sys.exit(1)
    base = doc.get("counts", {})
    exempt = bench.BASELINE_EXEMPT
    # An EXECUTION ERROR (count -1) fails the guard even for exempted
    # queries — exemption excuses a count delta from a deliberate
    # workload change, never a query that started raising (ADVICE r11).
    problems = [
        f"{n}: raised during count() — exemption does not cover errors"
        for n in counts if counts[n] < 0
    ]
    problems += [
        f"{n}: {counts[n]} rows vs recorded {base[n]}"
        for n in counts
        if n in base and n not in exempt and counts[n] != base[n]
        and counts[n] >= 0
    ]
    problems += [
        f"{n}: registered but not in the store — run --update"
        for n in counts if n not in base and n not in exempt
    ]
    problems += [
        f"{n}: in the store but no longer registered (renamed/removed?)"
        for n in base if n not in counts and n not in exempt
    ]
    if problems:
        print("ROWCOUNT REGRESSION: " + "; ".join(problems), file=sys.stderr)
        sys.exit(1)
    print(f"rowcount guard OK: {len(counts)} non-headline queries stable "
          f"({elapsed}s)")


if __name__ == "__main__":
    main()
