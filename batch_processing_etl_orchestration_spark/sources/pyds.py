"""Spark 4 Python Data Source for paginated REST ingestion.

``PaginatedRestSource`` (rest.py) runs the reference's page loop on
the driver — right when one API endpoint is the bottleneck
(EIA930PipelineHourlyData.py:45-93). This module is the cluster-scale
formulation: a registered Python Data Source ("restpages") that plans
ONE InputPartition PER PAGE WINDOW, so executors fetch pages in
parallel and rows enter Spark already distributed — no driver
materialization, no createDataFrame of a giant list.

The fetch itself is a module-level function keyed by the `profile`
option (data sources must be picklable; callables can't ride in
options). The "synthetic" profile generates the deterministic
fixture rows used in tests; a production profile would issue the
HTTP GET with the partition's offset/length — the partition planning,
option plumbing, and executor-side execution are identical.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

SCHEMA = "period string, respondent string, type string, value string"


def _fetch_synthetic(offset: int, length: int, n_rows: int) -> list[tuple]:
    """Deterministic stand-in for the HTTP GET: row i of the endpoint
    is a function of i alone, so any partitioning of the offset space
    yields the same dataset (asserted in tests)."""
    rows = []
    for i in range(offset, min(offset + length, n_rows)):
        rows.append(
            (
                f"2024-01-{(i % 28) + 1:02d}T{i % 24:02d}",
                f"BA{i % 7}",
                ("D", "DF", "NG", "TI")[i % 4],
                str((i * 37) % 1000),
            )
        )
    return rows


_PROFILES = {"synthetic": _fetch_synthetic}


class _PageWindow(InputPartition):
    def __init__(self, offset: int, length: int):
        self.offset = offset
        self.length = length


class RestPagesReader(DataSourceReader):
    def __init__(self, options: dict):
        self.profile = options.get("profile", "synthetic")
        self.n_rows = int(options.get("n_rows", "0"))
        self.page_size = int(options.get("page_size", "5000"))
        # server-side pushdown params (S1): a start offset predicate
        # trims page windows at PLANNING time, before any fetch
        self.start_offset = int(options.get("start_offset", "0"))

    def partitions(self) -> list[InputPartition]:
        return [
            _PageWindow(off, self.page_size)
            for off in range(self.start_offset, self.n_rows, self.page_size)
        ]

    def read(self, partition: _PageWindow):
        fetch = _PROFILES[self.profile]
        yield from fetch(partition.offset, partition.length, self.n_rows)


class RestPagesDataSource(DataSource):
    """spark.read.format("restpages").option("n_rows", N)
    .option("page_size", P).load() — each page window is fetched on
    an executor."""

    @classmethod
    def name(cls) -> str:
        return "restpages"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return RestPagesReader(self.options)
