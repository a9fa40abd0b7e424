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


def test_stream_stream_left_outer_join_equals_batch(spark, tables, tmp_path):
    """VERDICT r4 #9: the LEFT-OUTER interval join must emit unmatched
    clicks with NULL purchase columns at watermark expiry instead of
    dropping them. Streaming emission needs the watermark to PASS each
    row's expiry and a further micro-batch to evict state, so the fixture
    stages three files (data, then two far-future sentinel events) with
    maxFilesPerTrigger=1 — batch 2 advances the watermark past every
    expiry, batch 3 evicts and emits the null-padded rows."""
    import shutil

    from pyspark.sql import functions as F

    d = tmp_path / "events_outer_stream"
    d.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", d / "part-0.parquet")
    raw = spark.read.parquet(f"{SF_DIR}/events.parquet")
    bump = (
        (F.col("ts") + F.lit(30 * 86400 * 10**9).cast("long"))
        if dict(raw.dtypes)["ts"] == "bigint"  # TIMESTAMP(NANOS) generation
        else F.col("ts") + F.expr("INTERVAL 30 DAYS")
    )
    # one click + one purchase sentinel: the event_type filters are pushed
    # BELOW the watermark nodes, so a row must survive each side's filter
    # to advance that side's watermark (the global watermark is the min)
    sentinel = (
        raw.limit(2)
        .withColumn("__rn", F.monotonically_increasing_id())
        .select(
            F.lit(-1).cast("long").alias("event_id"),
            bump.alias("ts"),
            F.lit(-1).cast("long").alias("user_id"),
            F.when(F.col("__rn") == 0, "click")
            .otherwise("purchase")
            .alias("event_type"),
            *[F.col(c) for c in raw.columns if c not in
              ("event_id", "ts", "user_id", "event_type")],
        )
        .select(*raw.columns)
    )
    sentinel.coalesce(1).write.mode("overwrite").parquet(str(d / "_stage1"))
    sentinel.coalesce(1).write.mode("overwrite").parquet(str(d / "_stage2"))
    for i, stage in enumerate(("_stage1", "_stage2"), start=1):
        src = next((d / stage).glob("*.parquet"))
        shutil.move(str(src), d / f"part-{i}.parquet")
        shutil.rmtree(d / stage)

    batch = {
        (r.user_id, r.click_ts, r.purchase_ts, r.purchase_value)
        for r in sjoins.click_purchase_attribution(
            tables["events"], how="left_outer"
        ).collect()
    }
    # the fixture genuinely has both converted and unconverted clicks
    assert any(p is None for _, _, p, _ in batch)
    assert any(p is not None for _, _, p, _ in batch)

    clicks_src = stream.with_watermark(
        stream.read_events_stream(spark, str(d)), "1 minute"
    )
    purchases_src = stream.with_watermark(
        stream.read_events_stream(spark, str(d)), "1 minute"
    )
    # two independent source streams (for stream-stream each side needs
    # its own source); the -1 sentinels are excluded from the result
    joined = sjoins.interval_join(
        clicks_src.filter(F.col("event_type") == "click").select("user_id", "ts"),
        purchases_src.filter(F.col("event_type") == "purchase").select(
            "user_id", "ts", "value"
        ),
        how="left_outer",
    ).select(
        F.col("l.user_id").alias("user_id"),
        F.date_format("l.ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        F.date_format("r.ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.col("r.value").alias("purchase_value"),
    )
    # NOTE: the sentinel rows must NOT be filtered inside the streaming
    # plan — a `user_id != -1` here (like the event_type filters) gets
    # pushed below the watermark node and through the equi-join to both
    # scans, so the watermark would never advance past the data and the
    # unmatched rows would never emit. Exclude them from the collected
    # set instead (the memory table is a plain batch table).
    q = (
        joined.writeStream.format("memory")
        .queryName("ss_outer_join_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(240)
    finally:
        q.stop()
    streamed = {
        (r.user_id, r.click_ts, r.purchase_ts, r.purchase_value)
        for r in spark.sql("SELECT * FROM ss_outer_join_test").collect()
        if r.user_id != -1
    }
    assert streamed == batch


def test_stream_stream_full_outer_join_equals_batch(spark, tables, tmp_path):
    """Round 6: the FULL-OUTER interval join additionally emits purchases
    no click preceded (NULL click columns) at watermark expiry. Same
    staged-sentinel choreography as the left-outer test: batch 2 advances
    the watermark past every expiry, batch 3 evicts both sides' state."""
    import shutil

    from pyspark.sql import functions as F

    d = tmp_path / "events_full_outer_stream"
    d.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", d / "part-0.parquet")
    raw = spark.read.parquet(f"{SF_DIR}/events.parquet")
    bump = (
        (F.col("ts") + F.lit(30 * 86400 * 10**9).cast("long"))
        if dict(raw.dtypes)["ts"] == "bigint"  # TIMESTAMP(NANOS) generation
        else F.col("ts") + F.expr("INTERVAL 30 DAYS")
    )
    sentinel = (
        raw.limit(2)
        .withColumn("__rn", F.monotonically_increasing_id())
        .select(
            F.lit(-1).cast("long").alias("event_id"),
            bump.alias("ts"),
            F.lit(-1).cast("long").alias("user_id"),
            F.when(F.col("__rn") == 0, "click")
            .otherwise("purchase")
            .alias("event_type"),
            *[F.col(c) for c in raw.columns if c not in
              ("event_id", "ts", "user_id", "event_type")],
        )
        .select(*raw.columns)
    )
    sentinel.coalesce(1).write.mode("overwrite").parquet(str(d / "_stage1"))
    sentinel.coalesce(1).write.mode("overwrite").parquet(str(d / "_stage2"))
    for i, stage in enumerate(("_stage1", "_stage2"), start=1):
        src = next((d / stage).glob("*.parquet"))
        shutil.move(str(src), d / f"part-{i}.parquet")
        shutil.rmtree(d / stage)

    batch = {
        (r.user_id, r.click_ts, r.purchase_ts, r.purchase_value)
        for r in sjoins.click_purchase_attribution(
            tables["events"], how="full_outer"
        ).collect()
    }
    # the fixture genuinely exercises all three row kinds
    assert any(p is None for _, _, p, _ in batch)          # unconverted click
    assert any(c is None for _, c, _, _ in batch)          # click-less purchase
    assert any(c and p for _, c, p, _ in batch)            # matched pair

    clicks_src = stream.with_watermark(
        stream.read_events_stream(spark, str(d)), "1 minute"
    )
    purchases_src = stream.with_watermark(
        stream.read_events_stream(spark, str(d)), "1 minute"
    )
    joined = sjoins.interval_join(
        clicks_src.filter(F.col("event_type") == "click").select("user_id", "ts"),
        purchases_src.filter(F.col("event_type") == "purchase").select(
            "user_id", "ts", "value"
        ),
        how="full_outer",
    ).select(
        F.coalesce(F.col("l.user_id"), F.col("r.user_id")).alias("user_id"),
        F.date_format("l.ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        F.date_format("r.ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.col("r.value").alias("purchase_value"),
    )
    # sentinels are excluded from the COLLECTED set, never filtered in the
    # streaming plan (the filter would push below the watermark node)
    q = (
        joined.writeStream.format("memory")
        .queryName("ss_full_outer_join_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(240)
    finally:
        q.stop()
    streamed = {
        (r.user_id, r.click_ts, r.purchase_ts, r.purchase_value)
        for r in spark.sql("SELECT * FROM ss_full_outer_join_test").collect()
        if r.user_id != -1
    }
    assert streamed == batch


def test_stream_stream_left_semi_join_equals_batch(spark, tables, events_stream_dir):
    """LEFT SEMI stream-stream interval join: converted clicks emit exactly
    once however many purchases followed; stream must equal the batch twin
    (which itself is oracle-checked via EXISTS — the one streaming join
    whose semantics are fully SQL-expressible)."""
    from pyspark.sql import functions as F

    batch_rows = sjoins.click_purchase_attribution(
        tables["events"], how="left_semi"
    ).collect()
    batch = {(r.user_id, r.click_ts) for r in batch_rows}
    assert batch
    # semi means exactly-once per click: no duplicates from multi-purchase
    assert len(batch_rows) == len(batch)
    inner = {
        (r.user_id, r.click_ts)
        for r in sjoins.click_purchase_attribution(tables["events"]).collect()
    }
    assert batch == inner  # same click set, deduped

    clicks_src = stream.with_watermark(
        stream.read_events_stream(spark, events_stream_dir), "1 day"
    )
    purchases_src = stream.with_watermark(
        stream.read_events_stream(spark, events_stream_dir), "1 day"
    )
    joined = sjoins.interval_join(
        clicks_src.filter(F.col("event_type") == "click").select("user_id", "ts"),
        purchases_src.filter(F.col("event_type") == "purchase").select(
            "user_id", "ts", "value"
        ),
        how="left_semi",
    ).select(
        F.col("l.user_id").alias("user_id"),
        F.date_format("l.ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
    )
    assert joined.isStreaming
    q = (
        joined.writeStream.format("memory")
        .queryName("ss_semi_join_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(180)
    finally:
        q.stop()
    streamed = [
        (r.user_id, r.click_ts)
        for r in spark.sql("SELECT * FROM ss_semi_join_test").collect()
    ]
    assert set(streamed) == batch
    assert len(streamed) == len(batch)  # exactly-once in the stream too


def test_stream_stream_right_outer_join_equals_batch(spark, tables, tmp_path):
    """RIGHT-OUTER interval join (VERDICT r7 #9 — the mirror of the
    left-outer path, closing the how= family): every purchase emits,
    attributed where an in-interval click exists, NULL click columns
    otherwise once the watermark proves no matching click can still
    arrive. Same staged-sentinel choreography as the left/full tests."""
    import shutil

    from pyspark.sql import functions as F

    d = tmp_path / "events_right_outer_stream"
    d.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", d / "part-0.parquet")
    raw = spark.read.parquet(f"{SF_DIR}/events.parquet")
    bump = (
        (F.col("ts") + F.lit(30 * 86400 * 10**9).cast("long"))
        if dict(raw.dtypes)["ts"] == "bigint"  # TIMESTAMP(NANOS) generation
        else F.col("ts") + F.expr("INTERVAL 30 DAYS")
    )
    sentinel = (
        raw.limit(2)
        .withColumn("__rn", F.monotonically_increasing_id())
        .select(
            F.lit(-1).cast("long").alias("event_id"),
            bump.alias("ts"),
            F.lit(-1).cast("long").alias("user_id"),
            F.when(F.col("__rn") == 0, "click")
            .otherwise("purchase")
            .alias("event_type"),
            *[F.col(c) for c in raw.columns if c not in
              ("event_id", "ts", "user_id", "event_type")],
        )
        .select(*raw.columns)
    )
    sentinel.coalesce(1).write.mode("overwrite").parquet(str(d / "_stage1"))
    sentinel.coalesce(1).write.mode("overwrite").parquet(str(d / "_stage2"))
    for i, stage in enumerate(("_stage1", "_stage2"), start=1):
        src = next((d / stage).glob("*.parquet"))
        shutil.move(str(src), d / f"part-{i}.parquet")
        shutil.rmtree(d / stage)

    batch = {
        (r.user_id, r.click_ts, r.purchase_ts, r.purchase_value)
        for r in sjoins.click_purchase_attribution(
            tables["events"], how="right_outer"
        ).collect()
    }
    # the fixture genuinely has attributed AND organic purchases
    assert any(c is None for _, c, _, _ in batch)   # organic purchase
    assert any(c is not None for _, c, _, _ in batch)  # attributed
    assert all(p is not None for _, _, p, _ in batch)  # never a null right

    clicks_src = stream.with_watermark(
        stream.read_events_stream(spark, str(d)), "1 minute"
    )
    purchases_src = stream.with_watermark(
        stream.read_events_stream(spark, str(d)), "1 minute"
    )
    joined = sjoins.interval_join(
        clicks_src.filter(F.col("event_type") == "click").select("user_id", "ts"),
        purchases_src.filter(F.col("event_type") == "purchase").select(
            "user_id", "ts", "value"
        ),
        how="right_outer",
    ).select(
        F.coalesce(F.col("l.user_id"), F.col("r.user_id")).alias("user_id"),
        F.date_format("l.ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        F.date_format("r.ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.col("r.value").alias("purchase_value"),
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ss_right_outer_join_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(240)
    finally:
        q.stop()
    streamed = {
        (r.user_id, r.click_ts, r.purchase_ts, r.purchase_value)
        for r in spark.sql("SELECT * FROM ss_right_outer_join_test").collect()
        if r.user_id != -1
    }
    assert streamed == batch


def test_stream_stream_left_anti_join_equals_batch(spark, tables, tmp_path):
    """LEFT-ANTI interval join (VERDICT r8 #3 — the NOT-EXISTS twin of
    left_semi, completing the how= family): each click with NO purchase
    in the following interval emits exactly once. Spark has no native
    stream-stream anti join; the composition under test (left-outer +
    null-key filter, streaming/joins.py) emits the unattributed click at
    watermark expiry, so this uses the same staged-sentinel choreography
    as the left-outer test: batch 2 advances the watermark past every
    expiry, batch 3 evicts state and emits."""
    import shutil

    from pyspark.sql import functions as F

    d = tmp_path / "events_anti_stream"
    d.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", d / "part-0.parquet")
    raw = spark.read.parquet(f"{SF_DIR}/events.parquet")
    bump = (
        (F.col("ts") + F.lit(30 * 86400 * 10**9).cast("long"))
        if dict(raw.dtypes)["ts"] == "bigint"  # TIMESTAMP(NANOS) generation
        else F.col("ts") + F.expr("INTERVAL 30 DAYS")
    )
    sentinel = (
        raw.limit(2)
        .withColumn("__rn", F.monotonically_increasing_id())
        .select(
            F.lit(-1).cast("long").alias("event_id"),
            bump.alias("ts"),
            F.lit(-1).cast("long").alias("user_id"),
            F.when(F.col("__rn") == 0, "click")
            .otherwise("purchase")
            .alias("event_type"),
            *[F.col(c) for c in raw.columns if c not in
              ("event_id", "ts", "user_id", "event_type")],
        )
        .select(*raw.columns)
    )
    sentinel.coalesce(1).write.mode("overwrite").parquet(str(d / "_stage1"))
    sentinel.coalesce(1).write.mode("overwrite").parquet(str(d / "_stage2"))
    for i, stage in enumerate(("_stage1", "_stage2"), start=1):
        src = next((d / stage).glob("*.parquet"))
        shutil.move(str(src), d / f"part-{i}.parquet")
        shutil.rmtree(d / stage)

    batch_rows = sjoins.click_purchase_attribution(
        tables["events"], how="left_anti"
    ).collect()
    batch = {(r.user_id, r.click_ts) for r in batch_rows}
    assert batch  # fixture genuinely has unattributed clicks
    assert len(batch_rows) == len(batch)  # anti means exactly-once per click
    # anti + semi partition the click universe: disjoint, union = all clicks
    semi = {
        (r.user_id, r.click_ts)
        for r in sjoins.click_purchase_attribution(
            tables["events"], how="left_semi"
        ).collect()
    }
    assert not (batch & semi)
    all_clicks = {
        (r.user_id, r.click_ts)
        for r in tables["events"]
        .filter(F.col("event_type") == "click")
        .select(
            "user_id", F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts")
        )
        .collect()
    }
    assert (batch | semi) == all_clicks

    clicks_src = stream.with_watermark(
        stream.read_events_stream(spark, str(d)), "1 minute"
    )
    purchases_src = stream.with_watermark(
        stream.read_events_stream(spark, str(d)), "1 minute"
    )
    joined = sjoins.interval_join(
        clicks_src.filter(F.col("event_type") == "click").select("user_id", "ts"),
        purchases_src.filter(F.col("event_type") == "purchase").select(
            "user_id", "ts", "value"
        ),
        how="left_anti",
    ).select(
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
    )
    assert joined.isStreaming
    q = (
        joined.writeStream.format("memory")
        .queryName("ss_anti_join_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(240)
    finally:
        q.stop()
    # the -1 sentinels match nothing, so they surface as anti rows —
    # exclude them from the comparison (filtering them inside the plan
    # would stall the watermark; see the left-outer test's NOTE)
    streamed = [
        (r.user_id, r.click_ts)
        for r in spark.sql("SELECT * FROM ss_anti_join_test").collect()
        if r.user_id != -1
    ]
    assert set(streamed) == batch
    assert len(streamed) == len(batch)
