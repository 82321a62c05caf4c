"""THE pre-commit-of-record command (VERDICT r11 next #6): one script,
one exit code, running every round gate in order. The round protocol
was five tools held together by README discipline — drift-prone, as
the recorder-tripwire incident proved. Run this before the round's
final commit (and ideally before any milestone commit):

    python tools/round_gate.py               # everything
    python tools/round_gate.py --fast        # skip the sf1 sweep
    python tools/round_gate.py --only bench  # one gate by name

Gates, in order (each prints PASS/FAIL and timings; first failure
does NOT stop later gates — you want the full picture — but any
failure exits 1):

  fingerprints  tools/record_fingerprints.py (idempotent; at round
                start this clears the newest driver artifact's rows)
  pytest        python -m pytest tests/ -x -q  (~15 min)
  bench         python bench.py with its timing + rowcount guards
                (rc from bench itself, not a pipe stage)
  rowcounts     tools/rowcount_guard.py (non-headline count tripwire)
  sweep         tools/sweep_sf1.py (~30 min; skipped by --fast;
                requires .tmp/sf1 — build with tools/make_sf1.py)
  sweep-structural  tools/verify_sf1_structural.py (~15 min; also
                skipped by --fast) — `--only sweep` runs ONLY the
                main sweep; name this gate explicitly to run it alone

Never run two gates concurrently with other Spark work: contended
timings poison bench baselines (round-practices memory, r9/r11).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GATES: list[tuple[str, list[str]]] = [
    ("fingerprints", [sys.executable, "tools/record_fingerprints.py"]),
    ("pytest", [sys.executable, "-m", "pytest", "tests/", "-x", "-q"]),
    ("bench", [sys.executable, "bench.py"]),
    ("rowcounts", [sys.executable, "tools/rowcount_guard.py"]),
    ("sweep", [sys.executable, "tools/sweep_sf1.py"]),
    ("sweep-structural", [sys.executable, "tools/verify_sf1_structural.py"]),
]

SLOW = {"sweep", "sweep-structural"}


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--fast", action="store_true",
                    help="skip the ~45 min sf1 sweep gates")
    ap.add_argument("--only", action="append", default=[],
                    help="run only the named gate(s)")
    args = ap.parse_args()

    selected = [
        (name, cmd) for name, cmd in GATES
        if (not args.only or name in args.only)
        and not (args.fast and name in SLOW)
    ]
    if args.only:
        unknown = set(args.only) - {n for n, _ in GATES}
        if unknown:
            print(f"unknown gate(s): {sorted(unknown)}", file=sys.stderr)
            sys.exit(2)
    if not selected:
        # contradictory flags (e.g. --fast --only sweep) must be a
        # usage error, not a vacuous PASS: a gate that verifies
        # nothing and exits 0 is the silent-protocol-drift failure
        # mode this tool exists to close (review r12)
        print("no gates selected (contradictory --fast/--only?)",
              file=sys.stderr)
        sys.exit(2)

    results: list[tuple[str, int, float]] = []
    for name, cmd in selected:
        print(f"== gate {name}: {' '.join(cmd)}", flush=True)
        t0 = time.perf_counter()
        # rc from the process itself — no pipes to launder it
        rc = subprocess.run(cmd, cwd=REPO).returncode
        dt = time.perf_counter() - t0
        results.append((name, rc, dt))
        print(f"== gate {name}: {'PASS' if rc == 0 else f'FAIL rc={rc}'} "
              f"[{dt:.1f}s]", flush=True)

    print("\n== round gate summary ==")
    worst = 0
    for name, rc, dt in results:
        print(f"  {'PASS' if rc == 0 else 'FAIL'}  {name:<16} "
              f"rc={rc} {dt:7.1f}s")
        worst = worst or rc
    sys.exit(1 if worst else 0)


if __name__ == "__main__":
    main()
