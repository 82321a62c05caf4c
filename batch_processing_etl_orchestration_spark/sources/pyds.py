"""Spark 4 Python Data Source for paginated REST ingestion.

``PaginatedRestSource`` (rest.py) runs the reference's page loop on
the driver — right when one API endpoint is the bottleneck
(EIA930PipelineHourlyData.py:45-93). This module is the cluster-scale
formulation: a registered Python Data Source ("restpages") that plans
ONE InputPartition PER PAGE WINDOW, so executors fetch pages in
parallel and rows enter Spark already distributed — no driver
materialization, no createDataFrame of a giant list.

Column projection (reference S1: the measure-selection params at
EIA930PipelineHourlyData.py:52, data[0]=value): the ``columns`` option
narrows the source schema at planning time, so only the requested
fields are materialized per page — PySpark 4.1's DataSourceReader has
no pushColumns hook, making the option the projection path, exactly as
the reference names its measures inside the request.

Filter pushdown (reference S1: the server-side period-range params at
EIA930PipelineHourlyData.py:51-53): the endpoint is period-ordered —
the invariant every time-series API this source models provides — so
a ``WHERE period >= X`` / ``< Y`` range translates to an offset range
at PLANNING time via ``DataSourceReader.pushFilters``. Page windows
outside the range are never planned, let alone fetched; an explicit
``start_offset`` option remains as a manual override, but a plain
``.where()`` now prunes identically (asserted in test_sources).

The fetch itself is a module-level function keyed by the `profile`
option (data sources must be picklable; callables can't ride in
options). The "synthetic" profile generates the deterministic
fixture rows used in tests; a production profile would issue the
HTTP GET with the partition's offset/length — the partition planning,
option plumbing, pushdown translation, and executor-side execution
are identical.
"""

from __future__ import annotations

import re

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
)

SCHEMA = "period string, respondent string, type string, value string"
_ALL_COLUMNS = ("period", "respondent", "type", "value")

# rows per period block: 7 respondents × 4 types, period advances one
# hour per block — monotone nondecreasing in the row index, as a
# period-ordered time-series endpoint serves it
_ROWS_PER_PERIOD = 28


def _period_of(i: int) -> str:
    block = i // _ROWS_PER_PERIOD
    return f"2024-01-{block // 24 + 1:02d}T{block % 24:02d}"


def _field(col: str, i: int) -> str:
    """Value of endpoint column ``col`` at row index i (each column a
    pure function of i — what makes per-column materialization and
    offset re-partitioning both exact)."""
    if col == "period":
        return _period_of(i)
    if col == "respondent":
        return f"BA{(i % _ROWS_PER_PERIOD) // 4}"
    if col == "type":
        return ("D", "DF", "NG", "TI")[i % 4]
    return str((i * 37) % 1000)


def _fetch_synthetic(
    offset: int, length: int, n_rows: int, cols: tuple[str, ...] = _ALL_COLUMNS
) -> list[tuple]:
    """Deterministic stand-in for the HTTP GET: row i of the endpoint
    is a function of i alone, so any partitioning of the offset space
    yields the same dataset (asserted in tests). Periods are monotone
    in i (time-ordered endpoint). ``cols`` is the server-side
    projection — only the requested fields are materialized, the way a
    production profile would put them in the request's data[] params
    (reference S1: EIA930PipelineHourlyData.py:52's data[0]=value)."""
    return [
        tuple(_field(c, i) for c in cols)
        for i in range(offset, min(offset + length, n_rows))
    ]


def _parse_columns(options: dict) -> tuple[str, ...]:
    """The ``columns`` option: comma-separated subset of the endpoint
    columns, emitted in the requested order. PySpark 4.1's
    DataSourceReader has no pushColumns hook (projection pushdown for
    Python Data Sources is not in this release), so a plain .select()
    cannot reach the reader — the option IS the projection path,
    mirroring how the reference names its measures in the request
    itself. Unknown or duplicate names fail at planning time."""
    spec = options.get("columns")
    if not spec:
        return _ALL_COLUMNS
    cols = tuple(c.strip() for c in spec.split(",") if c.strip())
    unknown = [c for c in cols if c not in _ALL_COLUMNS]
    if unknown or len(set(cols)) != len(cols) or not cols:
        raise ValueError(
            f"restpages 'columns' must be a distinct subset of "
            f"{_ALL_COLUMNS}, got {spec!r}"
        )
    return cols


_PROFILES = {"synthetic": _fetch_synthetic}

_PERIOD_RE = re.compile(r"^2024-01-(\d{2})T(\d{2})$")


def _hour_index(period: str) -> int | None:
    """Canonical period string → hour block index, None if unparseable
    (unparseable comparisons stay Spark-side, never mis-pruned)."""
    m = _PERIOD_RE.match(period)
    if not m:
        return None
    day, hour = int(m.group(1)), int(m.group(2))
    if not (1 <= day <= 28 and 0 <= hour <= 23):
        return None
    return (day - 1) * 24 + hour


class _PageWindow(InputPartition):
    def __init__(self, offset: int, length: int):
        self.offset = offset
        self.length = length


class RestPagesReader(DataSourceReader):
    def __init__(self, options: dict):
        self.profile = options.get("profile", "synthetic")
        self.n_rows = int(options.get("n_rows", "0"))
        self.page_size = int(options.get("page_size", "5000"))
        self.columns = _parse_columns(options)
        # server-side pushdown params (S1): a start offset trims page
        # windows at PLANNING time, before any fetch. Settable as an
        # option, and raised automatically by pushFilters.
        self.start_offset = int(options.get("start_offset", "0"))
        self.end_offset = self.n_rows

    def pushFilters(self, filters):
        """Translate period-range predicates to the offset range.

        The endpoint is period-ordered, so ``period >= X`` means
        "rows from the first block whose period >= X" and ``period <
        Y`` bounds the end. Block boundaries align exactly with
        period values, so handled filters are consumed fully (not
        re-evaluated by Spark); anything else — other columns,
        unparseable literals — is returned for Spark to apply."""
        for f in filters:
            handled = False
            if getattr(f, "attribute", None) == ("period",) and isinstance(
                getattr(f, "value", None), str
            ):
                h = _hour_index(f.value)
                if h is not None:
                    if isinstance(f, (GreaterThanOrEqual, EqualTo)):
                        self.start_offset = max(
                            self.start_offset, h * _ROWS_PER_PERIOD
                        )
                        handled = isinstance(f, GreaterThanOrEqual)
                    if isinstance(f, GreaterThan):
                        self.start_offset = max(
                            self.start_offset, (h + 1) * _ROWS_PER_PERIOD
                        )
                        handled = True
                    if isinstance(f, LessThan):
                        # period < Y keeps blocks strictly before Y's
                        self.end_offset = min(self.end_offset, h * _ROWS_PER_PERIOD)
                        handled = True
                    if isinstance(f, (LessThanOrEqual, EqualTo)):
                        self.end_offset = min(self.end_offset, (h + 1) * _ROWS_PER_PERIOD)
                        handled = handled or isinstance(f, LessThanOrEqual)
                    if isinstance(f, EqualTo):
                        # both bounds set above; the equality itself is
                        # exact at block granularity, so fully handled
                        handled = True
            if not handled:
                yield f

    def partitions(self) -> list[InputPartition]:
        return [
            _PageWindow(off, min(self.page_size, self.end_offset - off))
            for off in range(self.start_offset, self.end_offset, self.page_size)
        ]

    def read(self, partition: _PageWindow):
        fetch = _PROFILES[self.profile]
        yield from fetch(
            partition.offset, partition.length, self.n_rows, self.columns
        )


class RestPagesStreamReader(SimpleDataSourceStreamReader):
    """Incremental formulation of the page loop: the stream offset IS
    the row offset into the period-ordered endpoint, and each
    micro-batch advances by exactly one page window — the cron-cadence
    ingest the reference schedules (one page fetch per tick), with
    Spark's checkpoint tracking the high-water mark instead of a
    hand-rolled state table. ``readBetweenOffsets`` replays any
    window deterministically (row i is a function of i alone), which
    is what makes checkpoint recovery exactly-once."""

    def __init__(self, options: dict):
        self.profile = options.get("profile", "synthetic")
        self.n_rows = int(options.get("n_rows", "0"))
        self.page_size = int(options.get("page_size", "5000"))
        self.columns = _parse_columns(options)

    def initialOffset(self) -> dict:
        return {"offset": 0}

    def read(self, start: dict):
        s = start["offset"]
        e = min(s + self.page_size, self.n_rows)
        fetch = _PROFILES[self.profile]
        return iter(fetch(s, e - s, self.n_rows, self.columns)), {"offset": e}

    def readBetweenOffsets(self, start: dict, end: dict):
        fetch = _PROFILES[self.profile]
        return iter(
            fetch(
                start["offset"],
                end["offset"] - start["offset"],
                self.n_rows,
                self.columns,
            )
        )


class RestPagesDataSource(DataSource):
    """spark.read.format("restpages").option("n_rows", N)
    .option("page_size", P).load() — each page window is fetched on
    an executor; period-range WHERE clauses prune page windows at
    planning time via pushFilters. ``spark.readStream`` on the same
    format yields one micro-batch per page window
    (RestPagesStreamReader)."""

    @classmethod
    def name(cls) -> str:
        return "restpages"

    def schema(self) -> str:
        # the 'columns' option narrows the source schema itself, so the
        # scan's ReadSchema carries only the requested fields and the
        # un-requested ones are never materialized on any executor
        return ", ".join(f"{c} string" for c in _parse_columns(self.options))

    def reader(self, schema) -> DataSourceReader:
        return RestPagesReader(self.options)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return RestPagesStreamReader(self.options)


# -- race-safe registration (r16) ---------------------------------------
import threading as _threading

_REG_LOCK = _threading.Lock()
_REGISTERED: set = set()


def register_restpages(spark) -> None:
    """Register RestPagesDataSource exactly once per (application,
    session): spark.dataSource.register silently replaces on repeat
    calls from ONE thread, but two driver threads registering the same
    name concurrently race the JVM registry's exists-check and one
    dies with DATA_SOURCE_ALREADY_EXISTS (observed in the parallel
    vanilla-catalog check, r16). The class is identical at every call
    site, so skipping a re-register is value-neutral."""
    key = (spark.sparkContext.applicationId, id(spark))
    with _REG_LOCK:
        if key in _REGISTERED:
            return
        spark.dataSource.register(RestPagesDataSource)
        _REGISTERED.add(key)
