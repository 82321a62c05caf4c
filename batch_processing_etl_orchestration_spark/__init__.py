"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference batch ETL orchestration system
(ClaytonDuffin/Batch-Processing-ETL-Orchestration), re-expressed
Spark-first.

The reference (see SURVEY.md) is an Airflow + pandas + PostgreSQL batch
ETL stack: four extract>>transform>>load pipelines over U.S. energy and
weather APIs. This package re-expresses every operator it performs —
casts-with-coerce, renames, null handling, predicates, semi-joins,
grouped sums, pivots, multi-column mean/std — as lazy Catalyst plans on
`pyspark.sql.DataFrame`, and extends the surface with the
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns) required by the north star, each designed for
100 TB scale (broadcast dims, partial aggregation, AQE, no driver-side
data paths).

Layout:
  session     — tuned SparkSession factory (AQE, UTC, Arrow)
  tables      — fixture loaders for /root/testdata/sf*/
  functions/  — scalar/cleaning/text/vector expression helpers
  operators/  — dedup, similarity, pivot, sessionization operators
  pipelines/  — the four reference pipelines re-expressed on Spark
  sources/    — paginated-REST / CSV / Excel ingestion
  streaming/  — Structured Streaming variants of the hourly feeds
  warehouse/  — 13-table warehouse catalog (DDL lifecycle K2-K5)
"""

from batch_processing_etl_orchestration_spark.session import get_spark
from batch_processing_etl_orchestration_spark.tables import load_table, TABLE_NAMES

__all__ = ["get_spark", "load_table", "TABLE_NAMES"]
__version__ = "0.1.0"
