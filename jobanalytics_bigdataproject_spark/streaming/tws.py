"""[EXT] Arbitrary-state streaming via ``transformWithStateInPandas``
(Spark 4.x StatefulProcessor API — typed state variables, per-key
lifecycle, timer support), complementing the older
``applyInPandasWithState`` operator in ``streaming/stateful.py``.

``SessionizeProcessor`` maintains one open session per user in a
ValueState and EMITS EACH SESSION EXACTLY ONCE, when it closes (a later
event arrives more than ``gap`` after the session's last event).  That
append-mode, emit-on-close contract is what the built-in
``session_window`` aggregation cannot express mid-stream (it re-emits
updated aggregates) and what ``applyInPandasWithState`` only approximates
without typed state.

Determinism/batch-invariance discipline (same as running_user_totals):
- timestamps are carried as integer microseconds, values as integer
  cents — state never holds floats, so micro-batch boundaries cannot
  change any emitted session;
- events inside a batch are sorted by (ts, event_id) before folding, so
  any batch slicing of the same input yields byte-identical sessions
  (asserted by tests/test_tws.py's slicing invariance test).

Scale: state is one fixed-width row per ACTIVE user (closed sessions
leave only output rows), shuffle-partitioned by user_id like any keyed
stream.  In ``time_mode='ProcessingTime'`` every input batch re-arms a
per-key silence timer (``handle.registerTimer`` in ``_rearm_timer``);
when it fires, ``handleExpiredTimer`` flushes the dangling open session
so dead keys don't leak their final session (and their state row).

Environment note: executing transformWithStateInPandas requires the
``protobuf`` wheel (the Python worker speaks protobuf to the JVM state
server); this container does not ship it, so the end-to-end streaming
test skips (tests/test_tws.py) and the processor's fold logic is pinned
by direct unit tests with a fake ValueState — the same gating pattern as
the PIL-less image decode path (operators/multimodal.py).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.LongType()),  # microseconds since epoch
        T.StructField("session_end", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("value_total", T.DoubleType()),
    ]
)

_STATE_SCHEMA = (
    "start_us LONG, last_us LONG, n LONG, cents LONG"
)


class SessionizeProcessor(StatefulProcessor):
    """Emit-on-close sessionization; ``gap_us`` is the inactivity gap in
    microseconds."""

    def __init__(self, gap_us: int = 5 * 60 * 1_000_000, flush_after_ms: int | None = None):
        self.gap_us = gap_us
        # ProcessingTime mode only: flush a dangling open session if the key
        # stays silent for this many wall-clock ms.  None = no timers (the
        # default for event-time / batch-equivalence runs, where a wall-clock
        # flush would break determinism).
        self.flush_after_ms = flush_after_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._session = handle.getValueState("session", _STATE_SCHEMA)

    def _rearm_timer(self, timerValues) -> None:
        """Slide the key's silence timer: drop any armed timer and re-register
        at now + flush_after_ms.  Called on every input batch so the timer only
        ever fires after true inactivity (ADVICE r3: handleExpiredTimer was
        dead code because nothing ever called registerTimer)."""
        if self.flush_after_ms is None:
            return
        for expiry_ms in self._handle.listTimers():
            self._handle.deleteTimer(expiry_ms)
        self._handle.registerTimer(
            timerValues.getCurrentProcessingTimeInMs() + self.flush_after_ms
        )

    @staticmethod
    def _to_cents(values) -> "np.ndarray":  # noqa: F821
        """HALF_UP cents, matching functions/exact.py's Spark ``F.round``
        semantics (away from zero on .5) — pandas ``.round()`` is
        round-half-to-even and disagrees on exact half-cents (ADVICE r3)."""
        import numpy as np

        x = values.fillna(0.0).to_numpy(dtype="float64") * 100.0
        return (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype("int64")

    def handleInputRows(self, key, rows, timerValues) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        pdf = pd.concat(list(rows), ignore_index=True)
        if not len(pdf):
            return
        self._rearm_timer(timerValues)
        # batch-slicing invariance: fold in (ts, event_id) order
        pdf = pdf.sort_values(["ts_us", "event_id"], kind="mergesort")
        ts = pdf["ts_us"].to_numpy()
        cents = self._to_cents(pdf["value"])

        if self._session.exists():
            start_us, last_us, n, total = self._session.get()
        else:
            start_us = last_us = int(ts[0])
            n, total = 0, 0

        closed = []
        for i in range(len(ts)):
            t = int(ts[i])
            if n > 0 and t - last_us > self.gap_us:
                closed.append((key[0], start_us, last_us, n, total / 100.0))
                start_us, n, total = t, 0, 0
            last_us = t
            n += 1
            total += int(cents[i])
        self._session.update((start_us, last_us, n, total))
        if closed:
            yield pd.DataFrame(
                closed,
                columns=[
                    "user_id", "session_start", "session_end", "n_events", "value_total",
                ],
            )

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        """ProcessingTime mode: flush the dangling open session when the
        key has been silent past the timer horizon."""
        import pandas as pd

        if self._session.exists():
            start_us, last_us, n, total = self._session.get()
            self._session.clear()
            if n > 0:
                yield pd.DataFrame(
                    [(key[0], start_us, last_us, n, total / 100.0)],
                    columns=[
                        "user_id", "session_start", "session_end", "n_events", "value_total",
                    ],
                )

    def close(self) -> None:
        pass


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 5,
    time_mode: str = "None",
    flush_after_minutes: int | None = None,
) -> DataFrame:
    """Close-on-gap session summaries per user over a (streaming or batch)
    events frame with columns (user_id, ts, event_id, value).  Append
    output: each closed session appears exactly once.

    With ``time_mode='ProcessingTime'`` a per-key silence timer
    (``flush_after_minutes``, default = ``gap_minutes``) flushes dangling
    open sessions of keys that stop sending events entirely — without it
    a dead key's last session would never be emitted."""
    prepared = events.selectExpr(
        "user_id",
        "event_id",
        "CAST(unix_micros(ts) AS LONG) AS ts_us",
        "value",
    )
    flush_ms: int | None = None
    if time_mode.lower() == "processingtime":
        flush_ms = (flush_after_minutes if flush_after_minutes is not None else gap_minutes) * 60_000
    return prepared.groupBy("user_id").transformWithStateInPandas(
        SessionizeProcessor(gap_us=gap_minutes * 60 * 1_000_000, flush_after_ms=flush_ms),
        OUTPUT_SCHEMA,
        "append",
        time_mode,
    )
