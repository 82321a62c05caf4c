"""Warehouse DDL lifecycle (K1-K5, S10-S11) on a scratch catalog."""

from __future__ import annotations

import pytest

from batch_processing_etl_orchestration_spark.warehouse import (
    WAREHOUSE_SCHEMAS,
    append_rows,
    create_all_tables,
    drop_all_tables,
    list_tables,
    merge_idempotent,
    preview_table,
    truncate_table,
)

DB = "energy_and_weather_data"


@pytest.fixture(scope="module", autouse=True)
def warehouse(spark):
    create_all_tables(spark, DB)
    yield
    drop_all_tables(spark, DB)
    spark.sql(f"DROP DATABASE IF EXISTS {DB}")


def test_all_13_tables_exist(spark):
    assert len(WAREHOUSE_SCHEMAS) == 13
    assert set(list_tables(spark, DB)) == set(WAREHOUSE_SCHEMAS)


def test_append_preview_truncate(spark):
    t = "eia930_energy_sources"
    df = spark.createDataFrame(
        [("NG", "Natural Gas"), ("COL", "Coal")],
        "energy_source_code STRING, energy_source_name STRING",
    )
    append_rows(df, t, DB)
    assert spark.table(f"{DB}.{t}").count() == 2
    assert len(preview_table(spark, t, 1, DB).collect()) == 1
    truncate_table(spark, t, DB)
    assert spark.table(f"{DB}.{t}").count() == 0


def test_merge_idempotent_rerun_no_duplicates(spark):
    """The reference's re-run defect (append-only INSERT duplicates
    rows, SURVEY §2.9) must not reproduce through merge_idempotent."""
    t = "eia930_balancing_authorities"
    df = spark.createDataFrame(
        [("PJM", "PJM Inc", "EST", "US", "USA", "N")],
        ", ".join(f"{c} STRING" for c in WAREHOUSE_SCHEMAS[t]),
    )
    merge_idempotent(spark, df, t, ["ba_code"], DB)
    merge_idempotent(spark, df, t, ["ba_code"], DB)  # rerun — same input
    assert spark.table(f"{DB}.{t}").count() == 1
    truncate_table(spark, t, DB)
