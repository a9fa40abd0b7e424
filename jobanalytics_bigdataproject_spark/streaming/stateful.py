"""[EXT] Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.11 / north-star: arbitrary per-key state the built-in
window aggregations can't express).

``running_user_totals`` keeps (event_count, value_cents) per user across
micro-batches and emits the running totals each time the key appears —
the canonical "profile accumulator" shape of an event pipeline. State is
two longs per key: bounded, shuffle-partitioned by user_id, and (in a real
deployment) bounded further by a ProcessingTimeTimeout for dead keys.

Value totals accumulate in integer cents (functions/exact.py rationale) so
the running sums are exact and batch/stream agree bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_count_total", T.LongType()),
        T.StructField("value_total", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("cents", T.LongType()),
    ]
)


def _update_user_totals(
    key: tuple, pdfs: Iterable, state: GroupState
) -> Iterator:
    import pandas as pd

    n, cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        # Round each row to cents BEFORE summing: a float batch-sum rounded
        # once per micro-batch would drift with batch boundaries, breaking
        # the batch/stream bit-for-bit guarantee in the module docstring.
        cents += int(
            pdf["value"].fillna(0.0).mul(100).round().astype("int64").sum()
        )
    state.update((n, cents))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "event_count_total": [n],
            "value_total": [cents / 100.0],
        }
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, total value) across micro-batches. Works on
    a streaming frame (update output mode); state survives batches."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_totals,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )
