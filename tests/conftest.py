from __future__ import annotations

import os

import pytest

from batch_processing_etl_orchestration_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.01"
SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    # Core count env-overridable for experiments; the default is what
    # the driver's plain `pytest tests/` run gets. 16 measured 21%
    # faster than 8 on the Spark-bound families (test_similarity
    # 136 -> 108 s) on the 32-core box — part of getting the suite
    # under the driver's verify window (VERDICT r15 next #2).
    cpus = os.environ.get("SPARK_GRAFT_TEST_CPUS", "16")
    s = get_spark("bpeo-tests", master=f"local[{cpus}]", extra_conf={
        "spark.sql.shuffle.partitions": cpus,
        "spark.driver.memory": "6g",
    })
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
