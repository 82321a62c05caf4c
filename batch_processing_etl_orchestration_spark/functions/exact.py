"""Exact (order-insensitive) aggregation helpers.

Why this exists: Spark executes aggregations partially per partition
then merges (partial+final hash agg), so a double SUM's floating-point
addition order differs run-to-run and engine-to-engine. The driver's
correctness gate hashes values against a single-threaded DuckDB oracle,
so every double aggregate a verified query emits must be
order-insensitive AND cheap.

Mechanism: **scaled-long arithmetic**. Each double is rounded to a
fixed decimal scale (default 6) and converted to int64; int64 addition
is exact and order-insensitive, and stays on Tungsten's primitive
fast path (whole-stage codegen, no boxing) — measured ~15× faster than
DECIMAL(38,6) aggregation, which falls off the long-backed decimal
path. The final division back to double is a single deterministic IEEE
op, so Spark-at-any-parallelism and DuckDB agree bit-for-bit.

Overflow bounds: |Σ round(x·scale)| must stay below 2^63 ≈ 9.2e18.
At the default scale 1e6 that allows sums of |x| ≈ 1e5 over ~10^8 rows
per group. Call sites with bigger magnitudes pass a smaller scale (the
SQL twin must use the same). For unbounded magnitudes use
``decimal_sum`` (exact but slow) — the 100 TB fallback.

Mean and sample standard deviation are derived from exact scaled sums
(ddof=1 matches the reference's pd.Series.std,
OpenMeteoWeatherPipelineHourlyData.py:100). The final
n·Σx² − (Σx)² combination is a fused-multiply-add candidate (engines
may differ by 1 ulp), so std is rounded to 6 decimals on both sides.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,6)"
DEC2 = "decimal(38,12)"
SCALE = 1_000_000


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _scaled_long_sum(c: Column, scale: int) -> Column:
    """Σ round(x·scale) as int64 — exact, order-insensitive, primitive."""
    return F.sum(F.round(c * F.lit(scale)).cast("long"))


def exact_sum(col: Column | str, scale: int = SCALE) -> Column:
    """Order-insensitive SUM(double) → double via scaled-long."""
    c = _c(col)
    return _scaled_long_sum(c, scale) / F.lit(float(scale))


def exact_avg(col: Column | str, scale: int = SCALE) -> Column:
    """AVG as exact-sum / count — deterministic double division."""
    c = _c(col)
    return (_scaled_long_sum(c, scale) / F.lit(float(scale))) / F.count(c)


def exact_std(col: Column | str, scale: int = SCALE, scale2: int = SCALE) -> Column:
    """Sample stddev (ddof=1) from exact scaled sums, rounded to 6dp.

    scale2 scales the squared terms: pick it so
    max(x²)·scale2·rows_per_group < 9.2e18. Returns null for groups of
    size < 2 (stddev_samp/pandas semantics).
    """
    c = _c(col)
    n = F.count(c).cast("double")
    sx = _scaled_long_sum(c, scale) / F.lit(float(scale))
    sxx = _scaled_long_sum(c * c, scale2) / F.lit(float(scale2))
    var = (n * sxx - sx * sx) / (n * (n - F.lit(1.0)))
    return F.when(
        n > 1, F.round(F.sqrt(F.greatest(var, F.lit(0.0))), 6)
    ).otherwise(F.lit(None))


def decimal_sum(col: Column | str) -> Column:
    """Unbounded-magnitude exact SUM via DECIMAL(38,6) — slower (boxed
    decimal aggregation); use when scaled-long could overflow."""
    return F.sum(_c(col).cast(DEC)).cast("double")


# --- DuckDB-side twins (oracle SQL builders) -------------------------------


def sql_exact_sum(expr: str, scale: int = SCALE) -> str:
    return (
        f"(CAST(SUM(CAST(ROUND(({expr}) * {scale}) AS BIGINT)) AS DOUBLE)"
        f" / {float(scale)})"
    )


def sql_exact_avg(expr: str, scale: int = SCALE) -> str:
    return f"({sql_exact_sum(expr, scale)} / COUNT({expr}))"


def sql_exact_std(expr: str, scale: int = SCALE, scale2: int = SCALE) -> str:
    n = f"CAST(COUNT({expr}) AS DOUBLE)"
    sx = sql_exact_sum(expr, scale)
    sxx = sql_exact_sum(f"({expr}) * ({expr})", scale2)
    var = f"(({n} * {sxx} - {sx} * {sx}) / ({n} * ({n} - 1.0)))"
    return (
        f"CASE WHEN COUNT({expr}) > 1 "
        f"THEN ROUND(SQRT(GREATEST({var}, 0.0)), 6) ELSE NULL END"
    )


def ts_str(col: Column | str) -> Column:
    """Render a timestamp as 'yyyy-MM-dd HH:mm:ss' string. Verified
    queries emit timestamps as strings so the comparison is independent
    of engine/session timezone and datetime-object representations."""
    return F.date_format(_c(col), "yyyy-MM-dd HH:mm:ss")


SQL_TS_STR = "strftime({expr}, '%Y-%m-%d %H:%M:%S')"


def sql_ts_str(expr: str) -> str:
    return SQL_TS_STR.format(expr=expr)
