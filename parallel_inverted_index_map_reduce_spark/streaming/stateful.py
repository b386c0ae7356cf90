"""Custom stateful streaming operator via applyInPandasWithState.

Spark's built-ins cover windows/dedup; this is the extension point for
semantics they can't express — here, a per-key running aggregate that
emits cumulative counts and sums per micro-batch (the canonical
"session metrics so far" operator).

The state function is a closure (pickled by value) so executors never
import this package — same constraint as operators/multimodal.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "event_type string, n_events long, sum_value double"
STATE_SCHEMA = "n long, s double"


def running_totals_per_type(events: DataFrame) -> DataFrame:
    """Cumulative (count, sum(value)) per event_type across batches."""

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].fillna(0.0).sum())
        state.update((n, s))
        yield pd.DataFrame(
            {"event_type": [key[0]], "n_events": [n], "sum_value": [s]}
        )

    return events.groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
