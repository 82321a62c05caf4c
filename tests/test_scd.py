"""SCD2 semantics on constructed dimensions: close/reopen, inserts,
NULL-valued tracked updates, untracked-attribute inheritance, and
version chaining across successive applies."""

from __future__ import annotations

from pyspark.sql import functions as F

from batch_processing_etl_orchestration_spark.warehouse.scd import (
    HIGH_DATE,
    scd2_apply,
    scd2_as_of,
    scd2_init,
)


def _dim(spark):
    return spark.createDataFrame(
        [(1, "alice", 100.0), (2, "bob", 200.0), (3, "carol", 300.0)],
        "id LONG, name STRING, bal DOUBLE",
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_scd2_close_reopen_insert_passthrough(spark):
    hist = scd2_init(_dim(spark))
    upd = spark.createDataFrame(
        [(1, 150.0), (4, 400.0)], "id LONG, bal DOUBLE"
    )
    out = scd2_apply(hist, upd, ["id"], ["bal"], "2024-06-01")
    got = {
        (r["id"], r["bal"], str(r["valid_from"]), str(r["valid_to"]), r["is_current"])
        for r in out.collect()
    }
    assert (1, 100.0, "1970-01-01", "2024-06-01", False) in got  # closed
    assert (1, 150.0, "2024-06-01", HIGH_DATE, True) in got  # reopened
    assert (2, 200.0, "1970-01-01", HIGH_DATE, True) in got  # passthrough
    assert (4, 400.0, "2024-06-01", HIGH_DATE, True) in got  # inserted
    assert len(got) == 5
    # untracked attribute inherited onto the reopened version
    reopened = out.where((F.col("id") == 1) & F.col("is_current")).first()
    assert reopened["name"] == "alice"
    # inserted key has no inherited attributes
    assert out.where(F.col("id") == 4).first()["name"] is None


def test_scd2_unchanged_update_is_noop(spark):
    hist = scd2_init(_dim(spark))
    upd = spark.createDataFrame([(2, 200.0)], "id LONG, bal DOUBLE")
    out = scd2_apply(hist, upd, ["id"], ["bal"], "2024-06-01")
    assert _rows(out) == _rows(hist)


def test_scd2_null_tracked_update_counts_as_change(spark):
    hist = scd2_init(_dim(spark))
    upd = spark.createDataFrame([(3, None)], "id LONG, bal DOUBLE")
    out = scd2_apply(hist, upd, ["id"], ["bal"], "2024-06-01")
    vers = out.where(F.col("id") == 3).collect()
    assert len(vers) == 2
    open_v = [r for r in vers if r["is_current"]][0]
    assert open_v["bal"] is None and str(open_v["valid_from"]) == "2024-06-01"


def test_scd2_successive_applies_chain_versions(spark):
    hist = scd2_init(_dim(spark))
    h1 = scd2_apply(
        hist,
        spark.createDataFrame([(1, 150.0)], "id LONG, bal DOUBLE"),
        ["id"],
        ["bal"],
        "2024-06-01",
    )
    h2 = scd2_apply(
        h1,
        spark.createDataFrame([(1, 175.0)], "id LONG, bal DOUBLE"),
        ["id"],
        ["bal"],
        "2024-09-01",
    )
    vers = sorted(
        (str(r["valid_from"]), str(r["valid_to"]), r["bal"], r["is_current"])
        for r in h2.where(F.col("id") == 1).collect()
    )
    assert vers == [
        ("1970-01-01", "2024-06-01", 100.0, False),
        ("2024-06-01", "2024-09-01", 150.0, False),
        ("2024-09-01", HIGH_DATE, 175.0, True),
    ]
    # point-in-time resolves each era to its version
    assert scd2_as_of(h2, "2024-07-15").where(F.col("id") == 1).first()["bal"] == 150.0
    assert scd2_as_of(h2, "2020-01-01").where(F.col("id") == 1).first()["bal"] == 100.0
    assert scd2_as_of(h2, "2025-01-01").where(F.col("id") == 1).first()["bal"] == 175.0


def test_scd2_matches_reference_model_random_batches(spark):
    """Property: two successive random update batches applied through
    scd2_apply equal a dict-based reference SCD2 model — full history,
    not just current state."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    keys = st.integers(min_value=1, max_value=8)
    bals = st.integers(min_value=0, max_value=3)  # small domain → collisions

    @settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
    @given(
        base=st.dictionaries(keys, bals, min_size=1, max_size=6),
        upd1=st.dictionaries(keys, bals, max_size=6),
        upd2=st.dictionaries(keys, bals, max_size=6),
    )
    def run(base, upd1, upd2):
        hist = scd2_init(
            spark.createDataFrame(
                [(k, float(v)) for k, v in sorted(base.items())],
                "id LONG, bal DOUBLE",
            )
        )
        # reference model: key -> list of [bal, valid_from, valid_to, current]
        model = {
            k: [[float(v), "1970-01-01", HIGH_DATE, True]] for k, v in base.items()
        }
        for eff, upd in (("2024-06-01", upd1), ("2024-09-01", upd2)):
            if not upd:
                continue
            hist = scd2_apply(
                hist,
                spark.createDataFrame(
                    [(k, float(v)) for k, v in sorted(upd.items())],
                    "id LONG, bal DOUBLE",
                ),
                ["id"],
                ["bal"],
                eff,
            )
            for k, v in upd.items():
                v = float(v)
                if k in model:
                    cur = model[k][-1]
                    if cur[0] != v:
                        cur[2], cur[3] = eff, False
                        model[k].append([v, eff, HIGH_DATE, True])
                else:
                    model[k] = [[v, eff, HIGH_DATE, True]]
        got = sorted(
            (r["id"], r["bal"], str(r["valid_from"]), str(r["valid_to"]), r["is_current"])
            for r in hist.collect()
        )
        want = sorted(
            (k, ver[0], ver[1], ver[2], ver[3])
            for k, vers in model.items()
            for ver in vers
        )
        assert got == want

    run()


def test_snapshot_diff_null_and_boundary_semantics(spark):
    """Fingerprint edge cases: NULL→value is a change, NULL→NULL is
    not, and values shifting across a column boundary ('ab','c' vs
    'a','bc') must not collide."""
    from batch_processing_etl_orchestration_spark.warehouse.scd import snapshot_diff

    old = spark.createDataFrame(
        [(1, None, "x"), (2, None, None), (3, "ab", "c")],
        "id LONG, a STRING, b STRING",
    )
    new = spark.createDataFrame(
        [(1, "v", "x"), (2, None, None), (3, "a", "bc")],
        "id LONG, a STRING, b STRING",
    )
    got = {
        (r["id"], r["change_status"])
        for r in snapshot_diff(old, new, ["id"], ["a", "b"]).collect()
    }
    assert got == {(1, "changed"), (3, "changed")}  # id 2 unchanged


def test_scd2_duplicate_update_key_raises(spark):
    """ADVICE r5: a staged batch with two rows for one business key
    has no well-defined result — the apply must fail loudly at
    execution instead of silently emitting duplicated history rows."""
    import pytest
    from pyspark.errors import PySparkException

    hist = scd2_init(_dim(spark))
    dup = spark.createDataFrame(
        [(1, "alice2", 111.0), (1, "alice3", 112.0)],
        "id LONG, name STRING, bal DOUBLE",
    )
    out = scd2_apply(hist, dup, ["id"], ["name", "bal"], "2024-01-01")
    with pytest.raises(PySparkException):
        out.collect()
    # and a clean batch still applies
    ok = spark.createDataFrame([(1, "alice2", 111.0)], "id LONG, name STRING, bal DOUBLE")
    rows = _rows(scd2_apply(hist, ok, ["id"], ["name", "bal"], "2024-01-01"))
    assert len(rows) == 4  # 2 passthrough + closed + reopened
