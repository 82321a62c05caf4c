"""As-of (nearest-previous) join — the time-series join the reference's
gold layer would need for aligning hourly feeds with lagging dimensions
(SURVEY §2.4 'not present' row names it as part of the engine's join
surface).

Spark has no ASOF JOIN operator, so this composes one from built-ins
using the union + last(ignore nulls) running-window technique:

  1. Tag right rows 0 and left rows 1, union on (key, ts, tag).
  2. Sort within each key by (ts, tag) — right rows sort before left
     rows at equal timestamps, giving '>=' (backward-inclusive)
     semantics.
  3. last(right_payload, ignorenulls) over rows-unbounded-preceding
     carries the most recent right row forward onto each left row.

Scale: one shuffle on the key, one in-partition sort — same cost
profile as a sort-merge join, no range explosion. Skewed keys behave
like any window: AQE/salting applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    right_ts ≤ left_ts within the same `on` key group (backward
    as-of, inclusive). Right columns come back suffixed; unmatched
    left rows keep nulls (LEFT ASOF semantics)."""
    rpay = F.struct(*[F.col(c) for c in right_cols]).alias("_rpay")
    # Deterministic tiebreak: if several right rows share (key, ts), keep the
    # struct-max payload (lexicographic over right_cols order) so the carried
    # match is stable run-to-run — every sort in the engine has a unique-key
    # tiebreak, including this implicit one. Also shrinks the window input.
    r = (
        right.select(*on, F.col(right_ts).alias("_ts"), rpay)
        .groupBy(*on, "_ts")
        .agg(F.max("_rpay").alias("_rpay"))
        .withColumn("_side", F.lit(0))
    )
    lpay = F.struct(*[F.col(c) for c in left.columns]).alias("_lpay")
    l = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        lpay,
        F.lit(1).alias("_side"),
    )
    combined = r.select(*on, "_ts", "_side", "_rpay", F.lit(None).alias("_lpay")).unionByName(
        l.select(*on, "_ts", "_side", F.lit(None).alias("_rpay"), "_lpay"),
        allowMissingColumns=False,
    )
    w = (
        Window.partitionBy(*on)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = combined.withColumn("_match", F.last("_rpay", ignorenulls=True).over(w))
    out = carried.where(F.col("_side") == 1).select(
        *[F.col("_lpay")[c].alias(c) for c in left.columns],
        *[F.col("_match")[c].alias(f"{c}{suffix}") for c in right_cols],
    )
    return out
