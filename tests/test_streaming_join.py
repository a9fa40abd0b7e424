"""Stream-stream interval join: the batch function run on two watermarked
``readStream`` frames must produce the same attribution pairs as the batch
form (SURVEY.md §2.11 depth)."""

from __future__ import annotations

import pytest

from jobanalytics_bigdataproject_spark.streaming import joins as sjoins
from jobanalytics_bigdataproject_spark.streaming import windows as stream

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_stream_dir(tmp_path_factory):
    import shutil

    d = tmp_path_factory.mktemp("events_join_stream")
    shutil.copy(f"{SF_DIR}/events.parquet", d / "part-0.parquet")
    return str(d)


def test_stream_static_enrichment_join(spark, tables, events_stream_dir):
    """Stream-static join: a streaming fact enriched against a static
    (broadcastable) dimension — no watermark needed on the static side."""
    from pyspark.sql import functions as F

    src = stream.read_events_stream(spark, events_stream_dir)
    dim = tables["customer"].select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = sjoins.enrich_stream(src, dim, "user_id", how="inner").select(
        "event_id", "user_id", "c_mktsegment"
    )
    assert joined.isStreaming
    q = (
        joined.writeStream.format("memory")
        .queryName("ss_static_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    got = {
        (r.event_id, r.c_mktsegment)
        for r in spark.sql("SELECT event_id, c_mktsegment FROM ss_static_test").collect()
    }
    # same function on the batch frame is the equivalence twin
    want = {
        (r.event_id, r.c_mktsegment)
        for r in sjoins.enrich_stream(tables["events"], dim, "user_id", how="inner")
        .select("event_id", "c_mktsegment")
        .collect()
    }
    assert got == want and got


def test_stream_stream_join_equals_batch(spark, tables, events_stream_dir):
    batch = {
        (r.user_id, r.click_ts, r.purchase_ts, r.purchase_value)
        for r in sjoins.click_purchase_attribution(tables["events"]).collect()
    }
    assert batch  # fixture actually produces attributions

    # two independent watermarked readers over the same source = two streams
    clicks_src = stream.with_watermark(
        stream.read_events_stream(spark, events_stream_dir), "1 day"
    )
    purchases_src = stream.with_watermark(
        stream.read_events_stream(spark, events_stream_dir), "1 day"
    )
    from pyspark.sql import functions as F

    joined = sjoins.interval_join(
        clicks_src.filter(F.col("event_type") == "click").select("user_id", "ts"),
        purchases_src.filter(F.col("event_type") == "purchase").select(
            "user_id", "ts", "value"
        ),
    ).select(
        F.col("l.user_id").alias("user_id"),
        F.date_format("l.ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        F.date_format("r.ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.col("r.value").alias("purchase_value"),
    )
    assert joined.isStreaming
    q = (
        joined.writeStream.format("memory")
        .queryName("ss_join_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(180)
    finally:
        q.stop()
    streamed = {
        (r.user_id, r.click_ts, r.purchase_ts, r.purchase_value)
        for r in spark.sql("SELECT * FROM ss_join_test").collect()
    }
    assert streamed == batch
