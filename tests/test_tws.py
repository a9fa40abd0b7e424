"""transformWithStateInPandas sessionizer (streaming/tws.py): emit-on-close
semantics, micro-batch slicing invariance, streaming end-to-end vs a
pandas-computed expectation."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from jobanalytics_bigdataproject_spark.streaming import tws


class _FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def clear(self):
        self._v = None


def _run_slices(rows, slices, gap_us=300_000_000):
    """Feed `rows` (already time-ordered tuples (ts_us, event_id, value))
    to one processor instance in the given batch slicing; return closed
    sessions."""
    proc = tws.SessionizeProcessor(gap_us=gap_us)
    proc._session = _FakeValueState()
    out = []
    start = 0
    for size in slices:
        chunk = rows[start : start + size]
        start += size
        if not chunk:
            continue
        pdf = pd.DataFrame(chunk, columns=["ts_us", "event_id", "value"])
        for emitted in proc.handleInputRows((7,), iter([pdf]), None):
            out.extend(map(tuple, emitted.itertuples(index=False)))
    return out


MIN = 60_000_000  # one minute in microseconds


def _mk_rows():
    # three sessions for user 7: [0,1,2min], [10,11min], [30min] (dangling)
    ts = [0, 1 * MIN, 2 * MIN, 10 * MIN, 11 * MIN, 30 * MIN]
    return [(t, i, 1.5) for i, t in enumerate(ts)]


def test_emit_on_close_and_dangling_session_held():
    out = _run_slices(_mk_rows(), [6])
    assert out == [
        (7, 0, 2 * MIN, 3, 4.5),
        (7, 10 * MIN, 11 * MIN, 2, 3.0),
    ]


@pytest.mark.parametrize("slicing", [[6], [1] * 6, [2, 2, 2], [3, 3], [1, 4, 1], [5, 1]])
def test_batch_slicing_invariance(slicing):
    assert _run_slices(_mk_rows(), slicing) == _run_slices(_mk_rows(), [6])


class _FakeHandle:
    """Timer-capable handle stub mirroring StatefulProcessorHandle's timer
    API surface (registerTimer/listTimers/deleteTimer)."""

    def __init__(self):
        self.timers = []

    def registerTimer(self, expiry_ms):
        self.timers.append(expiry_ms)

    def listTimers(self):
        return list(self.timers)

    def deleteTimer(self, expiry_ms):
        self.timers.remove(expiry_ms)


class _FakeTimerValues:
    def __init__(self, now_ms):
        self._now = now_ms

    def getCurrentProcessingTimeInMs(self):
        return self._now


def test_processing_time_timer_rearm_and_flush():
    # ADVICE r3: handleExpiredTimer was dead code — assert the timer is now
    # (a) registered on input, (b) re-armed (slid) on later input, and
    # (c) flushes the dangling session with state cleared when it fires.
    proc = tws.SessionizeProcessor(gap_us=300_000_000, flush_after_ms=60_000)
    proc._session = _FakeValueState()
    proc._handle = _FakeHandle()

    pdf = pd.DataFrame([(0, 0, 1.0)], columns=["ts_us", "event_id", "value"])
    list(proc.handleInputRows((7,), iter([pdf]), _FakeTimerValues(1_000)))
    assert proc._handle.timers == [61_000]

    pdf2 = pd.DataFrame([(MIN, 1, 2.0)], columns=["ts_us", "event_id", "value"])
    list(proc.handleInputRows((7,), iter([pdf2]), _FakeTimerValues(5_000)))
    assert proc._handle.timers == [65_000]  # old timer dropped, new one armed

    flushed = [
        tuple(r)
        for emitted in proc.handleExpiredTimer((7,), _FakeTimerValues(65_000), None)
        for r in emitted.itertuples(index=False)
    ]
    assert flushed == [(7, 0, MIN, 2, 3.0)]
    assert not proc._session.exists()


def test_cents_half_up_matches_spark_round(spark):
    # ADVICE r3: pandas .round() is half-to-even; exact.py's cents() is
    # Spark HALF_UP.  Pin parity on exact half-cent boundaries, both signs.
    vals = [0.005, 0.015, 0.025, -0.005, -0.015, 1.125, 2.675, None]
    got = tws.SessionizeProcessor._to_cents(pd.Series(vals)).tolist()
    from jobanalytics_bigdataproject_spark.functions.exact import cents

    sdf = spark.createDataFrame([(v,) for v in vals], "v double")
    want = [r[0] for r in sdf.select(F.coalesce(cents("v"), F.lit(0))).collect()]
    assert got == want


def test_streaming_two_batches_vs_pandas_expectation(spark, tables, tmp_path):
    # transformWithStateInPandas speaks protobuf to the JVM state server;
    # the container has no protobuf wheel (env constraint, like PIL for
    # image decode) — semantics stay pinned by the fake-state tests above.
    pytest.importorskip("google.protobuf")
    # transformWithState keeps per-state-variable column families, which the
    # default HDFSBackedStateStoreProvider cannot do — RocksDB is the
    # documented requirement for this operator (ships with Spark 4).
    _prov_key = "spark.sql.streaming.stateStore.providerClass"
    _prov_old = spark.conf.get(_prov_key, None)
    spark.conf.set(
        _prov_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    ev = tables["events"].select("user_id", "event_id", "ts", "value")
    cut = ev.agg(F.percentile_approx("ts", 0.5).alias("m")).first().m
    src = str(tmp_path / "ev_tws")
    # two files written sequentially -> FileStreamSource picks the older
    # first; batch 2 holds strictly later events than batch 1
    ev.filter(F.col("ts") <= cut).coalesce(1).write.parquet(src)
    ev.filter(F.col("ts") > cut).coalesce(1).write.mode("append").parquet(src)

    streamed = spark.readStream.schema(ev.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = (
        tws.sessionize_stream(streamed, gap_minutes=5)
        .writeStream.format("memory")
        .queryName("tws_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(180)
    finally:
        q.stop()
        if _prov_old is None:
            spark.conf.unset(_prov_key)
        else:
            spark.conf.set(_prov_key, _prov_old)
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events, round(r.value_total, 2))
        for r in spark.sql("SELECT * FROM tws_sessions").collect()
    }

    # expectation: pandas sessionization; every session except each
    # user's LAST (dangling, never closed by a later event)
    pdf = ev.orderBy("ts", "event_id").toPandas()
    # pandas datetime64[ns] → int64 is NANOseconds; the stream keys sessions
    # on unix_micros
    pdf["ts_us"] = pdf["ts"].astype("int64") // 1000
    expected = set()
    for uid, g in pdf.groupby("user_id"):
        g = g.sort_values(["ts_us", "event_id"], kind="mergesort")
        sessions = []
        start = last = None
        n, cents = 0, 0
        # same HALF_UP cent quantization as the processor (python round()
        # is half-to-even and disagrees on exact half-cents)
        cent_vals = tws.SessionizeProcessor._to_cents(g["value"])
        for t, v in zip(g["ts_us"], cent_vals):
            if last is not None and t - last > 5 * MIN:
                sessions.append((uid, start, last, n, round(cents / 100.0, 2)))
                start, n, cents = t, 0, 0
            if start is None:
                start = t
            last = t
            n += 1
            cents += int(v)
        expected.update(sessions)  # dangling session intentionally dropped
    assert got == expected
    assert got, "fixture must close at least one session"
