"""Skew-safe gap sessionization: segmented scan over (user, block).

The plain sessionize (plans/parity.py q_sessionize_users, the batch
twin of the reference's visit-stitching) windows on ``user_id`` — one
shuffle, perfect until one user owns a large share of the stream. A
window partition is ONE task in Spark: AQE's skew handling splits
skewed *join* partitions, never window partitions, so an 80%-hot user
turns the lag/running-sum stage into a single straggler task holding
80% of the data (and at 100 TB, an OOM).

``sessionize_blocked`` is the associative fix — a two-phase segmented
scan, the same trick as exact.py's partial/final split:

1. **Within-block pass**: events are windowed on ``(user, block)``
   where ``block = floor(epoch_us / block_us)``. The hot user is now
   spread over (time-range / block_us) partitions, so per-task width
   is bounded by the user's events *per block*, not their lifetime
   total. Within each block, the ordinary lag + running-sum yields a
   1-based within-block session index ``s`` and a new-session marker
   count ``w``.
2. **Cross-block stitch**: per (user, block), a 3-column summary
   (markers ``w``, first/last event micros). Per user, a window over
   these summaries — rows = blocks-per-user, i.e. days, metadata-
   sized — decides for each block whether its first session MERGES
   with the previous non-empty block's last session (boundary gap ≤
   gap_us) and assigns each block an exclusive running offset of
   global sessions before it. The global id is then the uniform
   ``offset + s - merged``.
3. The summaries join back onto the block-partitioned events on the
   SAME (user, block) keys — no re-shuffle of the big side, and AQE
   broadcasts the summary side at runtime whenever it is small.

Exactness: session boundaries depend only on per-pair gaps, and every
gap is either inside a block (seen by pass 1) or across a block
boundary (seen by pass 2 via first/last micros — empty blocks are
skipped by lag over existing summaries). Equivalence with the plain
window sessionize is pinned by tests on uniform AND 80%-hot
distributions (tests/test_sessionize.py).

Cost: two narrow shuffles of the event stream — (user, block) for the
windows, then nothing (the stitch side joins on those same keys) —
versus the plain version's one; the price of bounding the widest task
by rows-per-block. Pick ``block_us`` ≫ gap_us (default: 1 day vs 30 min)
so block summaries stay tiny while sessions rarely span blocks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DAY_US = 24 * 60 * 60 * 1_000_000


def sessionize_blocked(
    ev: DataFrame,
    gap_us: int,
    block_us: int = _DAY_US,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """(user, tiebreak, ts, session_id) with session_id numbered
    1..n_sessions per user in time order — bit-identical to the plain
    single-window sessionize, computed without any per-user-width
    task. ``block_us`` must exceed ``gap_us`` (a gap can span at most
    one block boundary only if blocks are longer than the gap... it
    can span several EMPTY blocks, which the stitch handles; the
    constraint simply keeps summaries per user small)."""
    if block_us <= gap_us:
        raise ValueError("block_us must exceed gap_us")
    # Gap semantics are WALL-CLOCK IN THE SESSION TIMEZONE — exactly
    # what `timestampdiff(MICROSECOND, lag(ts), ts)` computes in the
    # plain window and the DuckDB oracle (Spark's timestampdiff diffs
    # LOCAL datetime fields, not instants, for TIMESTAMP inputs; for
    # TIMESTAMP_NTZ wall time IS the timeline). The NTZ cast below
    # reproduces that for both types, keeping the two variants
    # bit-equivalent — including across a DST fall-back, where BOTH
    # read a 45-real-minute gap as -15 wall minutes
    # (test_sessionize.py pins the agreement). Run the session in UTC
    # (session.py's default) if instant semantics are required.
    us = F.expr(
        f"timestampdiff(MICROSECOND, "
        f"cast(timestamp'1970-01-01 00:00:00' as timestamp_ntz), "
        f"cast({ts_col} as timestamp_ntz))"
    )
    e = ev.select(
        user_col,
        tiebreak_col,
        ts_col,
        us.alias("__us"),
        F.floor(us / F.lit(int(block_us))).alias("__blk"),
    )
    wb = Window.partitionBy(user_col, "__blk").orderBy(ts_col, tiebreak_col)
    gap = F.col("__us") - F.lag("__us").over(wb)
    marked = e.select(
        user_col,
        tiebreak_col,
        ts_col,
        "__us",
        "__blk",
        F.when(gap.isNull() | (gap > gap_us), 1).otherwise(0).alias("__new"),
    )
    sess = marked.withColumn(
        "__s",
        F.sum("__new").over(wb.rowsBetween(Window.unboundedPreceding, 0)),
    )

    # Boundary wall times must be the ORDER-adjacent events' (the
    # plain window's cross-block gap is last-event-in-order →
    # first-event-in-order): under a non-monotonic wall clock (DST
    # fall-back with caller-chosen sub-day blocks) min/max can pick a
    # DIFFERENT event than the order-first/-last one and move a
    # session boundary the plain variant keeps (review r8 finding).
    order_key = F.struct(ts_col, tiebreak_col)
    summary = marked.groupBy(user_col, "__blk").agg(
        F.sum("__new").alias("__w"),
        F.min_by("__us", order_key).alias("__first_us"),
        F.max_by("__us", order_key).alias("__last_us"),
    )
    wu = Window.partitionBy(user_col).orderBy("__blk")
    prev_last = F.lag("__last_us").over(wu)
    stitched = summary.select(
        user_col,
        "__blk",
        F.when(
            prev_last.isNotNull()
            & (F.col("__first_us") - prev_last <= gap_us),
            1,
        )
        .otherwise(0)
        .alias("__merged"),
        "__w",
    )
    offsets = stitched.select(
        user_col,
        "__blk",
        "__merged",
        F.coalesce(
            F.sum(F.col("__w") - F.col("__merged")).over(
                wu.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("__offset"),
    )

    # NO broadcast hint: offsets is one row per ACTIVE (user, block) —
    # small next to the event stream but users × days at the high end,
    # past any broadcast budget. The join keys equal the stream
    # window's partitioning, so the big side does not re-shuffle, and
    # AQE still converts to broadcast at runtime whenever offsets is
    # actually small.
    return (
        sess.join(offsets, [user_col, "__blk"])
        .select(
            user_col,
            tiebreak_col,
            ts_col,
            (F.col("__offset") + F.col("__s") - F.col("__merged")).alias(
                "session_id"
            ),
        )
    )
