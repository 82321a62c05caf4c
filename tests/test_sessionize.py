"""Segmented (skew-safe) sessionization vs the plain window version.

The blocked variant exists because a window partition is ONE task:
AQE splits skewed join partitions, never window partitions, so a hot
user is a straggler/OOM in the plain plan. These tests pin (a)
per-event equivalence of the two algorithms on real fixture data, (b)
equivalence on an 80%-hot-key distribution, (c) the boundary cases
the stitch phase exists for (sessions spanning block edges, empty
blocks between events), and (d) that phase 1 really partitions by
(user, block) — the property that bounds task width.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from batch_processing_etl_orchestration_spark.operators.sessionize import (
    sessionize_blocked,
)
from batch_processing_etl_orchestration_spark.plans.parity import (
    SESSION_GAP_US,
)
from batch_processing_etl_orchestration_spark.tables import load_table

_HOUR_US = 3_600 * 1_000_000


def _plain(ev):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.expr(
        "timestampdiff(MICROSECOND, "
        "lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts)"
    )
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(gap.isNull() | (gap > SESSION_GAP_US), 1)
        .otherwise(0)
        .alias("is_new"),
    ).withColumn(
        "session_id",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    ).select("user_id", "event_id", "ts", "session_id")


def _assign(df):
    return {
        (r["user_id"], r["event_id"]): r["session_id"] for r in df.collect()
    }


def test_blocked_equals_plain_on_fixture(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts"
    )
    got = _assign(sessionize_blocked(ev, gap_us=SESSION_GAP_US))
    want = _assign(_plain(ev))
    assert got == want


def test_blocked_equals_plain_on_hot_key(spark, sf_dir):
    """80% of events remapped onto ONE user — the distribution that
    makes the plain window a single straggler task. Assignments must
    still match per event."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts"
    )
    hot = ev.select(
        F.when(F.col("event_id") % 5 < 4, F.lit(7))
        .otherwise(F.col("user_id") + 1000)
        .alias("user_id"),
        "event_id",
        "ts",
    )
    got = _assign(sessionize_blocked(hot, gap_us=SESSION_GAP_US))
    want = _assign(_plain(hot))
    assert got == want
    # sanity: the hot user really is hot and spans many blocks
    n_hot = sum(1 for (u, _e) in got if u == 7)
    assert n_hot >= 0.7 * len(got)


def test_stitch_boundary_cases(spark):
    """Hand-built stream for one user with every boundary class:
    in-block gaps, a session CONTINUING across a block edge, a session
    ending exactly at the gap threshold, and an empty block between
    events (multi-block silence)."""
    base = datetime.datetime(2024, 3, 1, 23, 0, 0)

    def at(minutes):
        return base + datetime.timedelta(minutes=minutes)

    rows = [
        # session 1: before midnight, continues past the block edge
        (1, 1, at(0)),       # 23:00 day 1
        (1, 2, at(45)),      # 23:45 day 1  (45min gap > 30min → new? no: 45 > 30 yes!)
        (1, 3, at(70)),      # 00:10 day 2  (25min gap → same session, crosses edge)
        # exactly-at-threshold gap: 30min is NOT > 30min → same session
        (1, 4, at(100)),     # 00:40 day 2
        # multi-day silence: empty block(s) between events
        (1, 5, at(100 + 60 * 24 * 2)),  # 00:40 day 4
        (1, 6, at(100 + 60 * 24 * 2 + 10)),
    ]
    ev = spark.createDataFrame(
        rows, "user_id BIGINT, event_id BIGINT, ts TIMESTAMP"
    )
    got = _assign(sessionize_blocked(ev, gap_us=SESSION_GAP_US))
    want = _assign(_plain(ev))
    assert got == want
    # independent expectation: ids 1 | 2,3,4 | 5,6
    assert got[(1, 1)] == 1
    assert got[(1, 2)] == got[(1, 3)] == got[(1, 4)] == 2
    assert got[(1, 5)] == got[(1, 6)] == 3


def test_phase1_partitions_by_user_and_block(spark, sf_dir):
    """The scale property itself: the event-stream window must hash-
    partition on (user_id, __blk) — NOT user_id alone — so a hot
    user's width is bounded by events-per-block."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts"
    )
    plan = sessionize_blocked(
        ev, gap_us=SESSION_GAP_US
    )._jdf.queryExecution().executedPlan().toString()
    assert "__blk" in plan
    import re

    parts = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    assert any(
        "user_id" in p and "__blk" in p for p in parts
    ), parts


def test_block_must_exceed_gap(spark):
    ev = spark.createDataFrame(
        [(1, 1, datetime.datetime(2024, 1, 1))],
        "user_id BIGINT, event_id BIGINT, ts TIMESTAMP",
    )
    with pytest.raises(ValueError, match="block_us"):
        sessionize_blocked(ev, gap_us=10, block_us=5)


def test_blocked_equals_plain_randomized_tight_blocks(spark):
    """Stress the stitch: block_us barely above gap_us (maximal
    cross-block traffic — nearly every session spans blocks) over 40
    users × deterministic pseudo-random gap patterns that straddle
    the threshold. Per-event assignments must match the plain window
    exactly."""
    import random

    rng = random.Random(8)
    rows = []
    eid = 0
    gap_us = 100 * 1_000_000       # 100 s threshold
    block_us = 150 * 1_000_000     # 150 s blocks — barely legal
    for u in range(40):
        t = rng.randrange(0, 10**9)  # epoch seconds-ish start
        for _ in range(rng.randrange(5, 60)):
            eid += 1
            rows.append((u, eid, datetime.datetime.utcfromtimestamp(t)))
            # gaps clustered around the threshold: 50–200 s, with
            # exact-threshold and 1-s-over cases mixed in
            t += rng.choice([50, 99, 100, 101, 150, 200])
    ev = spark.createDataFrame(
        rows, "user_id BIGINT, event_id BIGINT, ts TIMESTAMP"
    )
    got = _assign(sessionize_blocked(ev, gap_us=gap_us, block_us=block_us))
    want = _assign(_plain_gap(ev, gap_us))
    assert got == want


def _plain_gap(ev, gap_us):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.expr(
        "timestampdiff(MICROSECOND, "
        "lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts)"
    )
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(gap.isNull() | (gap > gap_us), 1).otherwise(0).alias("is_new"),
    ).withColumn(
        "session_id",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    ).select("user_id", "event_id", "ts", "session_id")


def test_blocked_matches_plain_across_dst_fallback(spark):
    """TIMESTAMP inputs under a DST session timezone: Spark's
    timestampdiff — the plain window's gap, mirrored by the DuckDB
    oracle — diffs LOCAL datetime fields, so across America/
    Los_Angeles's 2024-11-03 fall-back two events 45 REAL minutes
    apart read as a -15 wall-minute gap and stay one session. The
    blocked variant must reproduce that wall-clock semantic exactly
    (the operator documents UTC sessions for instant semantics;
    session.py pins UTC by default)."""
    tz0 = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
        # 2024-11-03 08:30:00 UTC = 01:30 PDT; 09:15 UTC = 01:15 PST
        ev = spark.sql(
            """
            SELECT * FROM VALUES
              (1L, 1L, to_timestamp('2024-11-03 08:30:00 UTC',
                                    'yyyy-MM-dd HH:mm:ss zzz')),
              (1L, 2L, to_timestamp('2024-11-03 09:15:00 UTC',
                                    'yyyy-MM-dd HH:mm:ss zzz'))
              AS t(user_id, event_id, ts)
            """
        )
        got = _assign(sessionize_blocked(ev, gap_us=SESSION_GAP_US))
        want = _assign(_plain(ev))
        assert got == want
        # wall-clock gap -15 min <= 30-min threshold: ONE session,
        # in BOTH variants (the agreement is the contract)
        assert got[(1, 1)] == 1 and got[(1, 2)] == 1
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)


def test_dst_fold_near_subday_block_edge(spark):
    """The 3-event construction from the r8 review: hourly blocks with
    the DST fold inside gap_us of a block edge. Walls run 01:50 (PDT),
    01:05 (PST), 02:10 (PST) for instants t1<t2<t3 — the plain
    window's cross-boundary gap is 02:10−01:05 = 65 min (new
    session); a min/max stitch would compare against 01:50 and merge.
    Order-adjacent boundary times must keep the variants identical."""
    tz0 = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
        ev = spark.sql(
            """
            SELECT * FROM VALUES
              (1L, 1L, to_timestamp('2024-11-03 08:50:00 UTC',
                                    'yyyy-MM-dd HH:mm:ss zzz')),
              (1L, 2L, to_timestamp('2024-11-03 09:05:00 UTC',
                                    'yyyy-MM-dd HH:mm:ss zzz')),
              (1L, 3L, to_timestamp('2024-11-03 10:10:00 UTC',
                                    'yyyy-MM-dd HH:mm:ss zzz'))
              AS t(user_id, event_id, ts)
            """
        )
        got = _assign(
            sessionize_blocked(
                ev, gap_us=SESSION_GAP_US, block_us=3_600 * 1_000_000
            )
        )
        want = _assign(_plain(ev))
        assert got == want
        # walls: 01:50 / 01:05 (gap -45m, same session) / 02:10
        # (gap +65m from the ORDER-previous event, new session)
        assert got[(1, 1)] == got[(1, 2)] == 1 and got[(1, 3)] == 2
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)
