"""Bucketed co-located join: writing both fact tables bucketed by the
join key eliminates the join shuffle entirely — the 100 TB fact-fact
strategy claimed in SCALE.md, asserted on the actual physical plan."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

DB = "bucketing_test"


@pytest.fixture(scope="module", autouse=True)
def bucketed_tables(spark):
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {DB}")
    sf = "/root/testdata/sf0.001"
    o = spark.read.parquet(f"{sf}/orders.parquet")
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    (
        o.write.mode("overwrite")
        .bucketBy(4, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable(f"{DB}.orders_b")
    )
    (
        li.write.mode("overwrite")
        .bucketBy(4, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable(f"{DB}.lineitem_b")
    )
    yield
    spark.sql(f"DROP TABLE IF EXISTS {DB}.orders_b")
    spark.sql(f"DROP TABLE IF EXISTS {DB}.lineitem_b")
    spark.sql(f"DROP DATABASE IF EXISTS {DB}")


def test_bucketed_join_has_no_shuffle(spark):
    o = spark.table(f"{DB}.orders_b")
    li = spark.table(f"{DB}.lineitem_b")
    joined = o.join(li, o.o_orderkey == li.l_orderkey)

    buf = io.StringIO()
    with redirect_stdout(buf):
        joined.explain("formatted")
    plan = buf.getvalue()
    import re

    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.MULTILINE)) == 0, plan
    # and it still produces the right row count (every lineitem matches)
    assert joined.count() == li.count()
