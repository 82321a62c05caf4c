"""Python user-defined table functions (Spark 4 UDTF API).

The engine's custom-operator ladder is: built-in expressions →
higher-order array functions → Arrow-batched pandas UDFs →
mapInPandas. UDTFs slot between the first two and SQL: a row-to-rows
expansion callable from SQL via LATERAL, planned by Catalyst like any
generator. They are the right shape when SQL users need a custom
exploder (n-gram windows, log-line parsers, span splitters) without
leaving the SQL surface.

Kept deliberately thin: one production exploder (positional word
n-grams, the text-analysis family's shared primitive) registered
under a stable SQL name. The heavy text kernels stay in JVM
higher-order functions (operators/dedup.shingle_sets) — the UDTF is
the SQL-facing convenience with identical semantics, which is exactly
what q_udtf_ngrams pins: LATERAL ngrams(text, 3) must hash-match the
window-function oracle.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="pos int, gram string")
class NgramsUDTF:
    """(pos, gram) word n-gram windows of a whitespace-split text;
    pos is 0-based; texts shorter than n yield nothing."""

    def eval(self, text: str, n: int):  # noqa: D102 — UDTF contract
        if text is None or n is None or n <= 0:
            return
        words = text.split(" ")
        for i in range(len(words) - n + 1):
            yield i, " ".join(words[i : i + n])


def register_udtfs(spark: SparkSession) -> None:
    """Idempotently register the engine's UDTFs for SQL use."""
    spark.udtf.register("ngrams", NgramsUDTF)
