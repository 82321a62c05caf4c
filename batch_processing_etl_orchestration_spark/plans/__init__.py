"""Query catalog: every operator from SURVEY.md §2 as a named
(PySpark plan, DuckDB oracle SQL) pair, discoverable by the driver
contract in __spark_entry__.py."""

from batch_processing_etl_orchestration_spark.plans.registry import (
    QUERIES,
    QuerySpec,
    all_oracle_sql,
    all_queries,
)

# importing the catalog modules populates the registry
from batch_processing_etl_orchestration_spark.plans import parity  # noqa: F401
from batch_processing_etl_orchestration_spark.plans import northstar  # noqa: F401
from batch_processing_etl_orchestration_spark.plans import northstar_ml  # noqa: F401
from batch_processing_etl_orchestration_spark.plans import replay  # noqa: F401
from batch_processing_etl_orchestration_spark.plans import analytics  # noqa: F401

__all__ = ["QUERIES", "QuerySpec", "all_queries", "all_oracle_sql"]
