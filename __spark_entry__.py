"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``batch_processing_etl_orchestration_spark``;
this module only adapts the package's query registry to the contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from batch_processing_etl_orchestration_spark.plans import (  # noqa: E402
    all_oracle_sql,
    all_queries,
    QUERIES,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: hourly net value by
    event type (the reference's headline 'hourly net generation by
    energy source' shape, EIA930PipelineHourlyData.py:111-118)."""
    return QUERIES["q_hourly_net_by_type"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §2.10."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; ML/streaming operators without
    an ANSI-SQL formulation are omitted (rows-only check)."""
    return all_oracle_sql()
