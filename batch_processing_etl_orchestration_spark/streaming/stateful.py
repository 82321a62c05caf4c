"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY §2.10 scale-posture row / driver brief: 'applyInPandasWithState
for custom stateful operators').

Example operator: per-user running totals that survive across
micro-batches — the kind of accumulator the built-in windowed
aggregations can't express when the update logic is custom Python.
State is a typed struct per group key; batches arrive as Arrow-backed
pandas frames.

Determinism: the Python side accumulates value sums as scaled int64
(round(value·1e6)), the same exactness scheme as functions/exact.py —
so the emitted totals are independent of row order within and across
micro-batches and match the batch oracle bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

_SCALE = 1_000_000


def stateful_user_totals(events: DataFrame) -> DataFrame:
    """Running (n_events, total_value) per user_id, maintained in
    per-key state across micro-batches. With trigger(availableNow)
    over a static source this equals the batch groupBy — which is how
    the oracle checks it."""

    def update(
        key: tuple[Any, ...], pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        if state.exists:
            n, scaled = state.get
        else:
            n, scaled = 0, 0
        for pdf in pdfs:
            n += len(pdf)
            scaled += int((pdf["value"] * _SCALE).round().astype("int64").sum())
        state.update((n, scaled))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [scaled / float(_SCALE)],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id LONG, n_events LONG, total_value DOUBLE",
        stateStructType="n LONG, scaled LONG",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
