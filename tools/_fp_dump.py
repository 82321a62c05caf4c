"""Subprocess helper for tools/record_fingerprints.py: fingerprint
every registered query in a HISTORICAL git tree.

Usage: python tools/_fp_dump.py <tree_dir> <fingerprint_py>

``tree_dir`` is an extracted `git archive` of the commit whose code a
driver round actually attested; ``fingerprint_py`` is the CURRENT
repo's plans/fingerprint.py, loaded BY PATH so the same algorithm runs
against old code (the old tree predates the module). The script is
invoked as a file, so sys.path[0] is tools/ — the current repo's
package is NOT importable here and cannot shadow the historical one.
Prints one JSON object {query_name: fingerprint} on stdout.
"""

from __future__ import annotations

import importlib.util
import json
import sys


def main() -> None:
    tree_dir, fingerprint_py = sys.argv[1], sys.argv[2]
    sys.path.insert(0, tree_dir)

    spec = importlib.util.spec_from_file_location("_fp_algo", fingerprint_py)
    algo = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(algo)

    from batch_processing_etl_orchestration_spark.plans import QUERIES

    fps = {}
    for name, qspec in QUERIES.items():
        try:
            fps[name] = algo.query_fingerprint(qspec.fn, qspec.oracle)
        except Exception as exc:  # never let one bad fn sink the dump
            print(f"WARN {name}: {exc}", file=sys.stderr)
    json.dump(fps, sys.stdout)


if __name__ == "__main__":
    main()
