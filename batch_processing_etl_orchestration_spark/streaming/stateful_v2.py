"""Custom stateful streaming operator on Spark 4's transformWithState
API (``transformWithStateInPandas`` + ``StatefulProcessor``) — the
successor surface to applyInPandasWithState (streaming/stateful.py
keeps the classic twin; both are SURVEY §2.10 scale-posture rows).

.. warning:: UNVERIFIED — NEVER EXECUTED. transformWithStateInPandas'
   Python worker deserializes state over protobuf
   (pyspark/sql/streaming/proto/StateMessage_pb2.py), and the
   ``google.protobuf`` runtime is not installed in this container and
   cannot be (no network, installs out of scope), so this module has
   never run end-to-end: tests/test_streaming_sink.py carries the one
   permanent env-gated skip in the suite. The semantics it promises
   ARE covered by the executed applyInPandasWithState twin
   (streaming/stateful.py, q_stream_stateful_totals, driver-green);
   treat this module as the migration target written against the
   documented API, not as verified code.

What the new API adds over applyInPandasWithState: named, independently
typed state variables (value/list/map) instead of one monolithic state
struct, per-key timers, TTL, and initial-state bootstrap. Here a single
ValueState carries per-user running stats.

Determinism: totals accumulate as scaled int64 (functions/exact.py
scheme) so emitted values are independent of row order within and
across micro-batches — bit-equal to the batch groupBy the oracle runs.

Scale: state lives in the per-partition state store (RocksDB provider —
required by transformWithState and set by the caller), keyed by
user_id; each micro-batch shuffles only its own rows on the key, state
never rebroadcasts.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

_SCALE = 1_000_000

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def transform_with_state_available() -> bool:
    """transformWithState's Python runner imports google.protobuf at
    startup (its state-server protocol is protobuf-framed); without the
    package the stream crashes with
    STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE. This container
    ships no protobuf (and installs are out of scope), so callers gate
    on this check — the classic applyInPandasWithState operator
    (streaming/stateful.py) is the attested stateful path meanwhile."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


class UserStatsProcessor(StatefulProcessor):
    """Per-user running (count, exact total, min, max) in one
    ValueState."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._stats = handle.getValueState(
            "stats", "n LONG, scaled LONG, vmin DOUBLE, vmax DOUBLE"
        )

    def handleInputRows(
        self, key: Any, rows: Iterator["pd.DataFrame"], timerValues
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        if self._stats.exists():
            n, scaled, vmin, vmax = self._stats.get()
        else:
            n, scaled, vmin, vmax = 0, 0, None, None
        for pdf in rows:
            vals = pdf["value"]
            n += len(pdf)
            scaled += int((vals * _SCALE).round().astype("int64").sum())
            lo, hi = float(vals.min()), float(vals.max())
            vmin = lo if vmin is None else min(vmin, lo)
            vmax = hi if vmax is None else max(vmax, hi)
        self._stats.update((n, scaled, vmin, vmax))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [scaled / float(_SCALE)],
                "min_value": [vmin],
                "max_value": [vmax],
            }
        )

    def close(self) -> None:
        pass


def stateful_user_stats_v2(events: DataFrame) -> DataFrame:
    """Running per-user stats via transformWithStateInPandas. With
    trigger(availableNow) over a static source the final state equals
    the batch groupBy — which is how the oracle checks it. The caller
    must run with the RocksDB state store provider (ROCKSDB_PROVIDER)."""
    return events.groupBy("user_id").transformWithStateInPandas(
        UserStatsProcessor(),
        outputStructType=(
            "user_id LONG, n_events LONG, total_value DOUBLE, "
            "min_value DOUBLE, max_value DOUBLE"
        ),
        outputMode="Update",
        timeMode="None",
    )
