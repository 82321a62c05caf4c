"""Heavy hitters: exact top-k frequent items without shuffling the
full key space.

A plain ``groupBy(col).count()`` shuffles one record per DISTINCT key;
on a 100 TB corpus with a web-scale vocabulary that is a shuffle of
billions of keys to answer a question about the top few hundred. The
classic two-phase fix (Misra-Gries '82; mergeable-summaries form of
Agarwal et al., PODS '12):

Phase 1 — per-partition Misra-Gries summaries (``mapInPandas``,
O(capacity) state per partition, Arrow-batched; each batch's exact
``value_counts`` is itself an MG summary, and two summaries merge by
adding counts, subtracting the (capacity+1)-th largest, and dropping
non-positives). Output: ≤ capacity candidate keys per partition —
KBs, not the key space.

Phase 2 — one exact recount of ONLY the candidates: broadcast
semi-join (candidates are tiny by construction) then a groupBy whose
key space is ≤ capacity × partitions.

Guarantee (pigeonhole over partitions): every key with global count
> n/capacity survives some partition's summary, so the candidate set
is a SUPERSET of all such keys and the recount makes the final counts
exact. The top-k is therefore provably exact whenever the k-th count
clears n/capacity — and since phase 2 returns exact counts, that
condition is CHECKABLE after the fact: top_k_certified() compares the
k-th count against the bar.

Python in phase 1 is deliberate: MG's decrement step is inherently
stateful-imperative (not expressible as DataFrame ops), the state is
O(capacity), and the data crosses into Python once, Arrow-batched —
the sanctioned pattern for custom per-partition algorithms.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_merge(counters: dict, batch: dict, capacity: int) -> dict:
    """Merge two MG summaries under a capacity bound."""
    for item, cnt in batch.items():
        counters[item] = counters.get(item, 0) + int(cnt)
    if len(counters) > capacity:
        # subtract the (capacity+1)-th largest count from everyone,
        # drop non-positives — the mergeable-summaries merge rule
        kth = sorted(counters.values(), reverse=True)[capacity]
        counters = {i: c - kth for i, c in counters.items() if c > kth}
    return counters


def candidate_keys(df: DataFrame, col: str, capacity: int = 4096) -> DataFrame:
    """Phase 1: per-partition Misra-Gries candidate keys (one string
    column named `col`). ≤ capacity keys per partition."""

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for b in batches:
            vc = b[col].dropna().value_counts().to_dict()
            counters = _mg_merge(counters, vc, capacity)
        yield pd.DataFrame({col: list(counters.keys())})

    return df.select(col).mapInPandas(summarize, schema=f"{col} string")


def heavy_hitters(
    df: DataFrame, col: str, k: int, capacity: int = 4096
) -> DataFrame:
    """Exact top-k items of `col` by count, shuffling only candidate
    keys. Returns (col, n) ordered by n desc, col asc — deterministic
    tie-break. Exactness holds when the k-th count > n/capacity
    (verify with top_k_certified)."""
    cands = candidate_keys(df, col, capacity).dropDuplicates([col])
    return (
        df.join(F.broadcast(cands), col)  # semi in effect: cands has 1 col
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc(col))
        .limit(k)
    )


def top_k_certified(df: DataFrame, col: str, k: int, capacity: int = 4096):
    """(top_k DataFrame, certified: bool). certified=True proves the
    result equals the exact full-shuffle answer: the k-th recounted
    frequency exceeds n/capacity, the MG superset bar."""
    top = heavy_hitters(df, col, k, capacity)
    rows = top.collect()  # k rows — driver-safe by construction
    n_total = df.where(F.col(col).isNotNull()).count()
    certified = len(rows) == k and rows[-1]["n"] > n_total / capacity
    return top, certified
