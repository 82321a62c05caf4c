"""Local replica of the driver's DuckDB-oracle comparison: run a
registered query on Spark and its oracle SQL on DuckDB over the same
parquet, compare row count, column names, and order-insensitive
values. Exact equality for ints/strings; floats must agree to 1e-9
relative (the engine's decimal-exact aggregation should make them
bit-identical — the tolerance only cushions the comparison itself).
"""

from __future__ import annotations

import math
import os

import duckdb

# STRICT (default ON; ORACLE_STRICT=0 to relax while iterating) —
# floats must match bit-for-bit AND every cell must match in type
# class and repr, with the oracle's pandas rendering cross-checked.
# Python `==` alone is type-blind (2 == 2.0, Decimal('40.0') == 40.0,
# 0.0 == -0.0): exactly the blind spot that let 12 driver-reproducible
# hash mismatches (DuckDB HUGEINT → float64, signed zeros) stay
# invisible through two rounds of local verification (VERDICT r7 #3).
STRICT = os.environ.get("ORACLE_STRICT", "1") != "0"

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    import os

    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            # Spark-written table (e.g. the sf1 scale-up fixture):
            # a directory of part files, globbed
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _normalize(rows, columns):
    """Sort columns by name, then rows; floats rounded to 9 sig-ish
    decimals for the sort key only."""
    idx = sorted(range(len(columns)), key=lambda i: columns[i])

    def key(row):
        out = []
        for i in idx:
            v = row[i]
            if isinstance(v, float):
                out.append(("f", round(v, 9)))
            elif v is None:
                out.append(("n",))
            else:
                out.append(("v", str(v)))
        return out

    return sorted([tuple(r[i] for i in idx) for r in rows], key=lambda r: key([*r])), [
        columns[i] for i in idx
    ]


def compare_query(spark, sf_dir: str, fn, sql: str, allow_empty: bool = False) -> None:
    """Compare a Spark query to its DuckDB oracle. A 0-row match is a
    VACUOUS pass (both engines can agree while the dataflow under test
    never runs), so emptiness fails unless the query is explicitly
    tagged empty-ok in the registry (allow_empty=True)."""
    sdf = fn(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = list(sdf.columns)
    assert srows or allow_empty, (
        "query returned 0 rows — a vacuous oracle match; tag the query "
        "'empty-ok' in the registry if emptiness is genuinely expected "
        "at this scale factor"
    )

    con = duckdb_con(sf_dir)
    try:
        rel = con.sql(sql)  # lazy: columns/types come from the PLAN
        ocols = list(rel.columns)
        otypes = [str(t) for t in rel.types]
        orows = [tuple(r) for r in rel.fetchall()]  # ONE execution
    finally:
        con.close()
    float_rendering_cols = None
    if STRICT:
        # The driver's value hash is computed from a PANDAS rendering
        # of the oracle result, where DuckDB HUGEINT (uncast SUM of
        # integers) and DECIMAL become float64 and diverge from
        # Spark's bigint even though fetchall()'s Python ints compare
        # == — the exact blind spot that kept 12 driver reds invisible
        # locally through r6/r7. The DuckDB result types (from the
        # SAME execution — no second oracle run) identify the columns
        # pandas would render as float64; only NULL-FREE int columns
        # matter (a nullable BIGINT also renders float64 via NaN, and
        # driver evidence says those hash fine — q_window_lag etc.).
        float_rendering_cols = set()
        for i, (c, t) in enumerate(zip(ocols, otypes)):
            base = t.split("(", 1)[0].upper()
            if base in ("HUGEINT", "DOUBLE", "FLOAT", "DECIMAL", "REAL"):
                if not any(r[i] is None for r in orows):
                    float_rendering_cols.add(c)

    assert sorted(scols) == sorted(ocols), (
        f"column mismatch: spark={sorted(scols)} oracle={sorted(ocols)}"
    )
    assert len(srows) == len(orows), (
        f"row count mismatch: spark={len(srows)} oracle={len(orows)}"
    )

    snorm, cols = _normalize(srows, scols)
    onorm, _ = _normalize(orows, ocols)
    n_float_diff = 0
    max_rel = 0.0
    for i, (sr, orow) in enumerate(zip(snorm, onorm)):
        for c, (sv, ov) in zip(cols, zip(sr, orow)):
            if isinstance(sv, float) and isinstance(ov, float):
                if sv != ov:
                    if math.isnan(sv) and math.isnan(ov):
                        continue
                    denom = max(abs(sv), abs(ov), 1e-12)
                    rel = abs(sv - ov) / denom
                    max_rel = max(max_rel, rel)
                    n_float_diff += 1
                    limit = 0.0 if STRICT else 1e-9
                    assert rel <= limit, (
                        f"row {i} col {c}: spark={sv!r} oracle={ov!r} rel={rel}"
                    )
            else:
                assert sv == ov, f"row {i} col {c}: spark={sv!r} oracle={ov!r}"
            if STRICT:
                _assert_repr_strict(i, c, sv, ov, float_rendering_cols)
    if n_float_diff:
        print(f"  note: {n_float_diff} float cells differed (max rel {max_rel:.2e})")


def _assert_repr_strict(i, c, sv, ov, float_rendering_cols) -> None:
    """Driver-faithful strict cell check: Python `==` is type-blind
    (2 == 2.0, Decimal('40.0') == 40.0, 0.0 == -0.0) — precisely the
    divergences the driver's rendering hash catches. Assert same type
    class, same repr for floats (catches -0.0), and that an integral
    Spark value is not rendered float64 by the oracle's pandas
    conversion (catches HUGEINT / uncast SUM oracles)."""
    if sv is None or ov is None:
        assert sv is None and ov is None, (
            f"row {i} col {c}: null mismatch spark={sv!r} oracle={ov!r}"
        )
        return
    # bool is an int subclass — keep the classes genuinely distinct
    s_cls = type(sv)
    o_cls = type(ov)
    assert s_cls is o_cls, (
        f"row {i} col {c}: type class mismatch spark={s_cls.__name__}"
        f"({sv!r}) oracle={o_cls.__name__}({ov!r}) — oracle likely "
        f"needs an explicit CAST (HUGEINT/DECIMAL render differently "
        f"through the driver's pandas hash)"
    )
    if isinstance(sv, float):
        assert repr(sv) == repr(ov), (
            f"row {i} col {c}: repr mismatch spark={sv!r} oracle={ov!r} "
            f"(signed zero / rendering divergence the driver hash "
            f"catches)"
        )
    if isinstance(sv, int) and not isinstance(sv, bool):
        assert not (
            float_rendering_cols and c in float_rendering_cols
        ), (
            f"row {i} col {c}: Spark emits int but the oracle column's "
            f"DuckDB type renders as float64 through pandas (HUGEINT/"
            f"DECIMAL?) — add CAST(... AS BIGINT) to the oracle"
        )
