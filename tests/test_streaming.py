"""Structured Streaming: the batch window operators applied to a real
``readStream`` (file source → memory sink), watermark wiring, and
batch==stream result equivalence for tumbling windows (SURVEY.md §2.11)."""

from __future__ import annotations

import pytest

from jobanalytics_bigdataproject_spark.streaming import windows as stream

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_stream(spark, tables, tmp_path_factory):
    # the file stream source requires a directory; stage the fixture file
    import shutil

    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{SF_DIR}/events.parquet", d / "part-0.parquet")
    return stream.read_events_stream(spark, str(d))


def test_stream_is_streaming(events_stream):
    assert events_stream.isStreaming


def test_tumbling_batch_equals_stream(spark, tables, events_stream):
    batch = {
        (r.window_start, r.event_type): (r.event_count, r.total_value)
        for r in stream.tumbling_window_agg(tables["events"]).collect()
    }
    agg = stream.tumbling_window_agg(stream.with_watermark(events_stream, "1 day"))
    q = (
        agg.writeStream.format("memory")
        .queryName("tumbling_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    streamed = {
        (r.window_start, r.event_type): (r.event_count, r.total_value)
        for r in spark.sql("SELECT * FROM tumbling_test").collect()
    }
    assert streamed == batch


def test_session_window_stream_runs(spark, tables, events_stream):
    agg = stream.session_window_agg(stream.with_watermark(events_stream, "1 day"))
    q = (
        agg.writeStream.format("memory")
        .queryName("session_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    n_stream = spark.sql("SELECT COUNT(*) c FROM session_test").first().c
    n_batch = stream.session_window_agg(tables["events"]).count()
    assert n_stream == n_batch > 0


def test_watermark_set(events_stream):
    wm = stream.with_watermark(events_stream, "30 minutes")
    assert "watermark" in wm._jdf.queryExecution().analyzed().toString().lower()


def test_foreachbatch_sink_roundtrip(spark, tables, events_stream, tmp_path):
    """foreachBatch: the exactly-once-style custom sink pattern — each
    micro-batch lands as parquet keyed by batch id; total rows must equal
    the source."""
    out = str(tmp_path / "fb_out")

    def write_batch(df, epoch_id: int):
        df.write.mode("overwrite").parquet(f"{out}/batch={epoch_id}")

    q = (
        events_stream.writeStream.foreachBatch(write_batch)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    back = spark.read.option("basePath", out).parquet(out)
    assert back.count() == tables["events"].count()


def test_sliding_window_stream_matches_batch(spark, tables, events_stream):
    batch = {
        (r.window_start, r.event_type): (r.event_count, r.total_value)
        for r in stream.sliding_window_agg(tables["events"]).collect()
    }
    agg = stream.sliding_window_agg(stream.with_watermark(events_stream, "1 day"))
    q = (
        agg.writeStream.format("memory")
        .queryName("sliding_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    streamed = {
        (r.window_start, r.event_type): (r.event_count, r.total_value)
        for r in spark.sql("SELECT * FROM sliding_test").collect()
    }
    assert streamed == batch


def test_stateless_json_extract_append_stream(spark, tables, events_stream):
    out = stream.json_props_extract(events_stream)
    q = (
        out.writeStream.format("memory")
        .queryName("json_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    n = spark.sql("SELECT COUNT(*) c FROM json_test").first().c
    assert n == tables["events"].count()


def test_dedup_stream_drops_cross_batch_duplicates(spark, tables, tmp_path):
    # plant exact duplicate event_ids across TWO files → two micro-batches;
    # dropDuplicatesWithinWatermark must keep exactly one row per event_id
    from pyspark.sql import functions as F

    ev = tables["events"].limit(200).cache()
    # stage in the raw fixture layout (ts as nanos long) the stream reader expects
    raw = ev.withColumn("ts", F.unix_micros("ts") * 1000)
    d = str(tmp_path / "dup_stream")
    raw.coalesce(1).write.parquet(d)                      # batch 1
    raw.limit(50).coalesce(1).write.mode("append").parquet(d)  # batch 2: dups
    streamed = stream.read_events_stream(spark, d, max_files_per_trigger=1)
    q = (
        stream.dedup_stream(streamed, keys=("event_id",), delay="1 day")
        .writeStream.format("memory")
        .queryName("dedup_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    out = spark.sql("SELECT event_id FROM dedup_stream_test")
    assert out.count() == ev.select("event_id").distinct().count()
    assert out.groupBy("event_id").count().filter(F.col("count") > 1).count() == 0


def test_stream_static_enrichment_join(spark, tables, tmp_path):
    """Stream-static join: a streaming fact joined to a static broadcast
    dimension — the standard streaming enrichment shape (the static side
    is re-resolved per micro-batch, no watermark needed)."""
    from pyspark.sql import functions as F

    from jobanalytics_bigdataproject_spark.streaming.windows import read_events_stream

    src = str(tmp_path / "ev_enrich")
    tables["events"].limit(500).write.parquet(src)
    streamed = read_events_stream(spark, src)
    dim = tables["customer"].select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    q = (
        streamed.join(F.broadcast(dim), "user_id", "left")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
        .writeStream.format("memory")
        .queryName("enriched")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    got = {r.c_mktsegment: r.n for r in spark.sql("SELECT * FROM enriched").collect()}
    want = {
        r.c_mktsegment: r.n
        for r in spark.read.parquet(src)
        .join(dim, "user_id", "left")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want and sum(got.values()) == 500
