from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from batch_processing_etl_orchestration_spark.functions.cleaning import (
    HOURLY_FMT,
    MONTHLY_FMT,
    coalesce_columns,
    month_end,
    parse_quarter_period,
    snake_case_columns,
    to_snake_case,
    try_double,
    try_ts,
)


def test_to_snake_case_reference_shapes():
    # shapes from the reference's column names (databaseOperations.py,
    # EIA930 'respondent-name', Excel 'BA Code', camelCase API fields)
    assert to_snake_case("respondent-name") == "respondent_name"
    assert to_snake_case("BA Code") == "ba_code"
    assert to_snake_case("customsDistrictDescription") == "customs_district_description"
    assert to_snake_case("value-units") == "value_units"
    assert to_snake_case("type-name") == "type_name"
    assert to_snake_case("Energy Source/Code") == "energy_source_code"


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd"), whitelist_characters="-_ /"), min_size=1, max_size=40))
def test_to_snake_case_idempotent(name):
    once = to_snake_case(name)
    assert to_snake_case(once) == once


def test_try_casts_coerce_semantics(spark):
    df = spark.createDataFrame(
        [("1.5",), ("garbage",), ("",), ("  ",), ("-2",)], "v STRING"
    )
    out = [r[0] for r in df.select(try_double("v")).collect()]
    assert out == [1.5, None, None, None, -2.0]

    ts = spark.createDataFrame(
        [("2025-01-31T05",), ("nope",), ("2025-13-01T99",)], "v STRING"
    )
    got = [r[0] for r in ts.select(try_ts("v", HOURLY_FMT)).collect()]
    assert got[0] is not None and got[0].hour == 5
    assert got[1] is None and got[2] is None


def test_quarter_parse(spark):
    df = spark.createDataFrame([("2024-Q3",), ("2024-Q1",), ("bad",), ("2024-Q5",)], "q STRING")
    got = [r[0] for r in df.select(parse_quarter_period("q")).collect()]
    assert got[0].month == 7 and got[0].year == 2024
    assert got[1].month == 1
    assert got[2] is None and got[3] is None


def test_month_end(spark):
    df = spark.createDataFrame([("2024-02",), ("2024-11",)], "p STRING")
    got = [r[0] for r in df.select(month_end(try_ts("p", MONTHLY_FMT))).collect()]
    assert got[0].day == 29  # leap year
    assert got[1].day == 30


def test_coalesce_columns_schema_drift(spark):
    with_resp = spark.createDataFrame([("R1", 1.0)], "respondent STRING, value DOUBLE")
    out = coalesce_columns(with_resp, "respondent", "respondent", "fromba")
    assert out.columns == ["respondent", "value"] or set(out.columns) == {"respondent", "value"}
    with_fromba = spark.createDataFrame([("F1", 2.0)], "fromba STRING, value DOUBLE")
    out2 = coalesce_columns(with_fromba, "respondent", "respondent", "fromba")
    assert [r["respondent"] for r in out2.collect()] == ["F1"]
    with pytest.raises(ValueError):
        coalesce_columns(with_fromba.drop("fromba"), "x", "a", "b")


def test_snake_case_columns(spark):
    df = spark.createDataFrame([(1, 2)], ["respondent-name", "BA Code"])
    assert snake_case_columns(df).columns == ["respondent_name", "ba_code"]
