"""The reference's four Airflow pipelines re-expressed as Spark jobs
(SURVEY §3): bronze (raw page rows, schema-on-read) → silver (cleaner
semantics: casts/filters/joins, fixed schema) → gold (compute*
aggregates/pivots). Stage handoff is tables, not pickled XCom; the
task DAG collapses into one Catalyst plan per pipeline."""

from batch_processing_etl_orchestration_spark.pipelines import eia930, eia7a, eia814, openmeteo

__all__ = ["eia930", "eia7a", "eia814", "openmeteo"]
