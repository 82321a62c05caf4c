"""operators/spatial.py — grid-cell-blocked radius join."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from batch_processing_etl_orchestration_spark.operators.spatial import (
    grid_radius_join,
)


def _pts(spark, rows, id_name):
    return spark.createDataFrame(rows, f"{id_name} BIGINT, x DOUBLE, y DOUBLE")


def test_matches_brute_force_on_random_points(spark):
    """Blocked join ≡ cross-join filter, including pairs that straddle
    cell boundaries and pairs exactly AT the radius."""
    rng = random.Random(11)
    left = [(i, rng.uniform(0, 100), rng.uniform(0, 100)) for i in range(120)]
    right = [
        (1000 + i, rng.uniform(0, 100), rng.uniform(0, 100)) for i in range(80)
    ]
    r = 7.0
    expect = sorted(
        (li, ri)
        for li, lx, ly in left
        for ri, rx, ry in right
        if (lx - rx) ** 2 + (ly - ry) ** 2 <= r * r
    )
    got = sorted(
        (row["lid"], row["rid"])
        for row in grid_radius_join(
            _pts(spark, left, "lid"), _pts(spark, right, "rid"), radius=r
        ).collect()
    )
    assert got == expect and len(got) == len(set(got))  # complete, no dups


def test_exact_radius_boundary_across_cells(spark):
    """A pair at distance exactly r, axis-aligned across a cell edge,
    must match exactly once."""
    got = grid_radius_join(
        _pts(spark, [(1, 15.0, 0.0)], "lid"),
        _pts(spark, [(2, 31.0, 0.0)], "rid"),
        radius=16.0,
    ).collect()
    assert len(got) == 1 and got[0]["dist2"] == 256.0


def test_cell_smaller_than_radius_rejected(spark):
    with pytest.raises(ValueError, match="cell size"):
        grid_radius_join(
            _pts(spark, [(1, 0.0, 0.0)], "lid"),
            _pts(spark, [(2, 1.0, 1.0)], "rid"),
            radius=10.0,
            cell=5.0,
        )


def test_plan_is_equi_join_not_cartesian(spark):
    df = grid_radius_join(
        _pts(spark, [(1, 0.0, 0.0), (2, 50.0, 50.0)], "lid"),
        _pts(spark, [(3, 1.0, 1.0), (4, 99.0, 99.0)], "rid"),
        radius=5.0,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
