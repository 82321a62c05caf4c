"""Blocked fuzzy (edit-distance) joins — entity resolution's core
primitive.

An all-pairs Levenshtein join is O(|L|·|R|): dead at any scale. The
standard fix (PassJoin family, Li et al., VLDB '11) is pigeonhole
blocking: split each string into ``max_dist + 1`` segments — at most
``max_dist`` edits cannot touch every segment, so two strings within
the distance bound share at least one segment VERBATIM. Candidates
are the union of equality joins on (segment_index, segment_text);
the exact ``levenshtein`` verify runs on candidates only.

Completeness: exact for ≤ max_dist SUBSTITUTIONS at any max_dist
(equal lengths keep segments aligned). For a single general edit
(max_dist = 1) the two segments are a prefix and an END-ANCHORED
suffix, so an insert/delete is also caught — the edit leaves either
the prefix or the trailing-k string intact — PROVIDED both strings
compute the same segment length (⌈len/2⌉ equal, i.e. lengths in the
same odd/even pair). Cross-boundary indel pairs (e.g. 19↔18 chars)
and deeper general-edit distances need PassJoin's shifted position
windows — out of scope and stated here so nobody mistakes the
guarantee.

Scale: blocking keys are (seg_idx, seg_text) — the shuffle carries
short segment strings, never the cross product; segment selectivity
controls candidate volume the way LSH bands do for Jaccard
(operators/dedup.py). Verify is JVM ``levenshtein`` on candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _segments(col: str, n_seg: int, alias_prefix: str) -> list[F.Column]:
    """n_seg (idx, text) segment structs; the LAST segment is taken
    from the string's END (substr with negative start) so single
    insert/delete edits ahead of it cannot shift it."""
    length = F.length(F.col(col))
    seg_len = F.ceil(length / n_seg).cast("int")
    out = []
    for i in range(n_seg):
        if i == n_seg - 1:
            text = F.col(col).substr(-seg_len, seg_len)
        else:
            text = F.col(col).substr(F.lit(i) * seg_len + 1, seg_len)
        out.append(
            F.struct(F.lit(i).alias("idx"), text.alias("txt")).alias(
                f"{alias_prefix}{i}"
            )
        )
    return out


def blocked_fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    col: str,
    max_dist: int = 1,
    left_keep: list[str] | None = None,
    right_keep: list[str] | None = None,
) -> DataFrame:
    """Pairs (left_keep..., right_keep..., dist) with
    levenshtein(left.col, right.col) ≤ max_dist, found via pigeonhole
    segment blocking + exact verify. Column names must not collide
    between left_keep and right_keep (alias upstream)."""
    n_seg = max_dist + 1
    lk = left_keep or [c for c in left.columns if c != col]
    rk = right_keep or [c for c in right.columns if c != col]

    def explode_segs(df: DataFrame, keep: list[str], cname: str):
        return df.select(
            *keep,
            F.col(col).alias(cname),
            F.explode(F.array(*_segments(col, n_seg, "s"))).alias("seg"),
        ).select(*keep, cname, "seg.idx", F.col("seg.txt").alias("txt"))

    lx = explode_segs(left, lk, "__l_val")
    rx = explode_segs(right, rk, "__r_val")
    cands = (
        lx.join(rx, ["idx", "txt"])
        .drop("idx", "txt")
        .dropDuplicates([*lk, *rk])  # a pair may share several segments
    )
    return (
        cands.withColumn("dist", F.levenshtein("__l_val", "__r_val"))
        .where(F.col("dist") <= max_dist)
        .select(*lk, *rk, "dist")
    )
