"""Grid-cell-blocked spatial joins.

The radius join ("all pairs within distance r") is the geo instance of
the blocked-join family this engine uses everywhere: LSH bands block
Jaccard (dedup.py), pigeonhole segments block edit distance
(fuzzy.py), IVF cells block cosine (similarity.py) — and a uniform
grid blocks Euclidean distance. A naive cross join is |L|·|R|;
snapping right-side points to cells of size ≥ r and probing each left
point's 3×3 cell neighborhood touches only candidates that CAN be
within r (any point within r of (x, y) lies in one of the 9 cells
around (x, y)'s cell — the cell edge is ≥ r), then an exact distance
predicate verifies. Candidates track true point density per cell, not
n².

Scale: the cell join is a key-partitioned equi-join on (cx, cy); the
only fan-out is the left side's constant ×9 neighbor expansion
(explode of a 9-element literal array — narrow). Hot cells (urban
skew) are the same skew == signal story as LSH buckets; a rank cap
per cell bounds adversarial density the way capped_bucket_pairs does.
Planar Euclidean only — geodesy means projecting first; the blocking
algebra is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grid_radius_join(
    left: DataFrame,
    right: DataFrame,
    radius: float,
    x: str = "x",
    y: str = "y",
    cell: float | None = None,
) -> DataFrame:
    """All (left, right) pairs with Euclidean distance ≤ radius.
    Returns left's columns + right's columns + dist2. `left` and
    `right` must have disjoint column names apart from the x/y pair,
    which are renamed internally. Cell size defaults to `radius`
    (the minimum that keeps the 3×3 neighborhood sufficient)."""
    cs = float(cell if cell is not None else radius)
    if cs < radius:
        raise ValueError(f"cell size {cs} must be >= radius {radius}")
    lx, ly = f"_l_{x}", f"_l_{y}"
    rx, ry = f"_r_{x}", f"_r_{y}"
    r_cells = right.withColumnsRenamed({x: rx, y: ry}).select(
        "*",
        F.floor(F.col(rx) / cs).alias("_cx"),
        F.floor(F.col(ry) / cs).alias("_cy"),
    )
    neighbors = F.array(
        *[
            F.struct(
                (F.floor(F.col(lx) / cs) + dx).alias("_cx"),
                (F.floor(F.col(ly) / cs) + dy).alias("_cy"),
            )
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    l_cells = (
        left.withColumnsRenamed({x: lx, y: ly})
        .select("*", F.explode(neighbors).alias("_n"))
        .select("*", F.col("_n._cx").alias("_cx"), F.col("_n._cy").alias("_cy"))
        .drop("_n")
    )
    # products, not pow(): exact for integer-valued coordinates
    d2 = (F.col(lx) - F.col(rx)) * (F.col(lx) - F.col(rx)) + (
        F.col(ly) - F.col(ry)
    ) * (F.col(ly) - F.col(ry))
    return (
        l_cells.join(r_cells, ["_cx", "_cy"])
        .where(d2 <= radius * radius)
        .select(
            *[c for c in left.columns if c not in (x, y)],
            *[c for c in right.columns if c not in (x, y)],
            F.col(lx).alias(f"l_{x}"),
            F.col(ly).alias(f"l_{y}"),
            F.col(rx).alias(f"r_{x}"),
            F.col(ry).alias(f"r_{y}"),
            d2.alias("dist2"),
        )
    )
