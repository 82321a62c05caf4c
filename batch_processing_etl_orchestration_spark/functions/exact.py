"""Exact (order-insensitive) aggregation helpers.

Why this exists: Spark executes aggregations partially per partition
then merges (partial+final hash agg), so a double SUM's floating-point
addition order differs run-to-run and engine-to-engine. The driver's
correctness gate hashes values against a single-threaded DuckDB oracle,
and our own tests do the same — so every double aggregate the engine
emits for a verified query goes through DECIMAL(38,6) (exact, base-10,
order-insensitive addition) and is cast back to double at the end.
Both engines round a double to DECIMAL(38,6) identically and convert
the exact decimal sum back to the nearest double identically, so the
results match bit-for-bit regardless of parallelism.

This is also the right 100 TB posture: decimal partial aggregation is
still map-side-combined and codegen'd; the overhead vs double sum is
small and it buys run-to-run reproducibility.

Mean and sample standard deviation are derived from exact sums
(ddof=1 matches the reference's pd.Series.std,
OpenMeteoWeatherPipelineHourlyData.py:100), so they are deterministic
too: stddev_samp = sqrt((n*Σx² − (Σx)²) / (n(n−1))) evaluated in
double from exact decimal Σ.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,6)"
DEC2 = "decimal(38,12)"  # for products / squared terms


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def exact_sum(col: Column | str) -> Column:
    """Order-insensitive SUM(double) → double."""
    return F.sum(_c(col).cast(DEC)).cast("double")


def exact_avg(col: Column | str) -> Column:
    """AVG as exact-sum / count — deterministic double division."""
    c = _c(col)
    return (F.sum(c.cast(DEC)).cast("double") / F.count(c)).alias("avg")


def exact_std(col: Column | str) -> Column:
    """Sample stddev (ddof=1) from exact sums, rounded to 6 decimals.

    Matches pandas default ddof=1 (A7 in SURVEY §2.5). Returns null for
    groups of size < 2, same as stddev_samp/pandas. The sums are exact
    (decimal), but the n·Σx² − (Σx)² combination is a fused-multiply-add
    candidate — engines may differ by 1 ulp — so the result is rounded
    to a precision where that ulp cannot flip the value.
    """
    c = _c(col)
    n = F.count(c).cast("double")
    sx = F.sum(c.cast(DEC)).cast("double")
    sxx = F.sum((c * c).cast(DEC2)).cast("double")
    var = (n * sxx - sx * sx) / (n * (n - F.lit(1.0)))
    return F.when(
        n > 1, F.round(F.sqrt(F.greatest(var, F.lit(0.0))), 6)
    ).otherwise(F.lit(None))


def sql_exact_sum(expr: str) -> str:
    """DuckDB-side twin of exact_sum for oracle SQL strings."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(38,6))) AS DOUBLE)"


def sql_exact_avg(expr: str) -> str:
    return f"(CAST(SUM(CAST(({expr}) AS DECIMAL(38,6))) AS DOUBLE) / COUNT({expr}))"


def sql_exact_std(expr: str) -> str:
    n = f"CAST(COUNT({expr}) AS DOUBLE)"
    sx = f"CAST(SUM(CAST(({expr}) AS DECIMAL(38,6))) AS DOUBLE)"
    sxx = f"CAST(SUM(CAST((({expr}) * ({expr})) AS DECIMAL(38,12))) AS DOUBLE)"
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
