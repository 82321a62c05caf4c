"""as-of join operator edge cases (the oracle query covers the bulk)."""

from __future__ import annotations

from batch_processing_etl_orchestration_spark.operators.asof import asof_join


def _ts(s):
    from datetime import datetime

    return datetime.fromisoformat(s)


def test_asof_basic_and_unmatched(spark):
    left = spark.createDataFrame(
        [
            (1, "u", _ts("2024-01-01T10:00:00")),
            (2, "u", _ts("2024-01-01T12:00:00")),
            (3, "v", _ts("2024-01-01T08:00:00")),  # before any right row
        ],
        "id LONG, key STRING, ts TIMESTAMP_NTZ",
    )
    right = spark.createDataFrame(
        [
            ("u", _ts("2024-01-01T09:00:00"), 100.0),
            ("u", _ts("2024-01-01T11:00:00"), 200.0),
            ("v", _ts("2024-01-01T09:30:00"), 300.0),
        ],
        "key STRING, ts TIMESTAMP_NTZ, v DOUBLE",
    )
    out = {
        r["id"]: r["v_right"]
        for r in asof_join(
            left, right, on=["key"], left_ts="ts", right_ts="ts", right_cols=["v"]
        ).collect()
    }
    assert out == {1: 100.0, 2: 200.0, 3: None}


def test_asof_equal_timestamp_inclusive(spark):
    left = spark.createDataFrame(
        [(1, "u", _ts("2024-01-01T09:00:00"))], "id LONG, key STRING, ts TIMESTAMP_NTZ"
    )
    right = spark.createDataFrame(
        [("u", _ts("2024-01-01T09:00:00"), 42.0)], "key STRING, ts TIMESTAMP_NTZ, v DOUBLE"
    )
    row = asof_join(
        left, right, on=["key"], left_ts="ts", right_ts="ts", right_cols=["v"]
    ).collect()[0]
    assert row["v_right"] == 42.0  # ts >= semantics: equal timestamps match


def test_asof_tied_right_rows_deterministic(spark):
    """Two right rows sharing (key, ts): the carried match must be the
    struct-max payload (deterministic) — not whichever row the shuffle
    happened to order last (ADVICE r1)."""
    left = spark.createDataFrame(
        [(1, 100, "L")], "k LONG, ts LONG, tag STRING"
    )
    right = spark.createDataFrame(
        [(1, 50, "a", 10.0), (1, 50, "b", 20.0), (1, 50, "a", 30.0)],
        "k LONG, ts LONG, rid STRING, val DOUBLE",
    )
    for _ in range(3):  # stable across repeated executions
        out = asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="ts",
            right_cols=["rid", "val"],
        ).collect()
        assert len(out) == 1
        # struct-max over (rid, val): 'b' > 'a' lexicographically
        assert out[0]["rid_right"] == "b" and out[0]["val_right"] == 20.0
