"""Persisted HLL sketch store (operators/sketches.py) and integer-exact
embedding centering (operators/similarity.center_embeddings)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from jobanalytics_bigdataproject_spark.operators import similarity, sketches


# ---------------------------------------------------------------------------
# HLL sketch store
# ---------------------------------------------------------------------------


def test_sketch_merge_is_lossless(spark, tables):
    """Union of per-day sketches must give the IDENTICAL estimate as one
    sketch over the whole table — merging is associative/lossless, which
    is the entire basis of the store-and-rollup design."""
    events = tables["events"]
    merged = (
        sketches.daily_user_sketches(events)
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est"))
        .first()
        .est
    )
    direct = events.agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg("user_id", F.lit(sketches.DEFAULT_LGK))
        ).alias("est")
    ).first().est
    assert merged == direct


def test_sketch_estimate_within_rse(spark, tables):
    """lg_k=12 ⇒ ~1.6% relative standard error; assert 3 sigma."""
    events = tables["events"]
    exact = events.select("user_id").distinct().count()
    approx = events.agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg("user_id", F.lit(sketches.DEFAULT_LGK))
        ).alias("est")
    ).first().est
    assert abs(approx - exact) <= max(3, 0.05 * exact)


def test_store_range_rollup_equals_filtered_direct(spark, tables, tmp_path):
    """Answering a date-range distinct from the persisted store must equal
    sketching the range-filtered raw events directly — no information is
    lost by going through the store."""
    events = tables["events"]
    path = str(tmp_path / "hll_store")
    sketches.write_sketch_store(events, path)
    got = sketches.merge_distinct_over_range(
        spark, path, start="2024-01-08", end="2024-01-21"
    ).first()
    direct = (
        events.filter(
            (F.to_date("ts") >= "2024-01-08") & (F.to_date("ts") <= "2024-01-21")
        )
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(sketches.DEFAULT_LGK))
            ).alias("est"),
            F.count("*").alias("n"),
        )
        .first()
    )
    assert got.approx_distinct == direct.est
    assert got.n_events == direct.n
    assert got.n_days == 14


def test_daily_report_error_measured(spark, tables):
    rows = sketches.daily_distinct_report(tables["events"]).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.exact_users > 0
        # measured error column is consistent with its inputs
        assert r.err_bp == round(10000.0 * (r.approx_users - r.exact_users) / r.exact_users)
        assert abs(r.err_bp) < 1000  # <10% on any day at lg_k=12


# ---------------------------------------------------------------------------
# center_embeddings
# ---------------------------------------------------------------------------


def test_center_embeddings_hand_case(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [3.0, 4.0])], ["vec_id", "embedding"]
    )
    out = {(r.vec_id, r.dim): r for r in similarity.center_embeddings(df).collect()}
    # dim0 mean 2.0, dim1 mean 2.0 → centered: (-1,-2) and (1,2)
    assert out[(1, 0)].centered == -1.0 and out[(1, 1)].centered == -2.0
    assert out[(2, 0)].centered == 1.0 and out[(2, 1)].centered == 2.0
    n = math.sqrt(5.0)
    assert abs(out[(1, 0)].unit - (-1.0 / n)) < 1e-9
    assert abs(out[(2, 1)].unit - (2.0 / n)) < 1e-9


def test_center_embeddings_invariants(spark, tables):
    out = similarity.center_embeddings(tables["embeddings"]).cache()
    try:
        # per-dimension mean of centered values ~ 0 (within quantization)
        dim_means = out.groupBy("dim").agg(F.avg("centered").alias("m")).collect()
        assert all(abs(r.m) < 1e-5 for r in dim_means)
        # per-vector unit norm == 1
        norms = (
            out.groupBy("vec_id").agg(F.sum(F.col("unit") * F.col("unit")).alias("s")).collect()
        )
        assert all(abs(r.s - 1.0) < 1e-9 for r in norms)
    finally:
        out.unpersist()


def test_audience_overlap_inclusion_exclusion(spark, tables):
    events = tables["events"]
    rows = sketches.audience_overlap(events).collect()
    types = [r.event_type for r in events.select("event_type").distinct().collect()]
    n = len(types)
    assert len(rows) == n * (n - 1) // 2
    # overlap estimate must track the exact pairwise intersection within
    # compounded sketch error (3 estimates at ~1.6% RSE each)
    from pyspark.sql import functions as FF

    for r in rows[:3]:
        ua = events.filter(FF.col("event_type") == r.type_a).select("user_id")
        ub = events.filter(FF.col("event_type") == r.type_b).select("user_id")
        exact = ua.intersect(ub).count()
        assert r.users_overlap >= 0
        assert abs(r.users_overlap - exact) <= max(10, 0.15 * max(exact, 1))


# ---------------------------------------------------------------------------
# deterministic quantile store
# ---------------------------------------------------------------------------


def test_quantile_store_error_bounded_by_bucket_width(spark, tables, tmp_path):
    """Every reported quantile must sit within one bucket width of the
    exact percentile over the same rows — the store's whole contract."""
    events = tables["events"]
    path = str(tmp_path / "qstore")
    sketches.write_quantile_store(events, path)
    got = sketches.quantiles_from_store(
        spark, path, start="2024-01-08", end="2024-01-21"
    ).first()
    sub = events.filter(
        (F.to_date("ts") >= "2024-01-08") & (F.to_date("ts") <= "2024-01-21")
    )
    width = (100000 - 0) / 256 / 100.0  # currency units
    vals = sorted(r.value for r in sub.select("value").collect())
    for p, name in ((0.5, "p50"), (0.95, "p95"), (0.99, "p99")):
        # the store targets the type-1 quantile: the ceil(p*n)-th smallest
        exact = vals[max(0, -(-int(p * 10000) * len(vals) // 10000) - 1)]
        approx = getattr(got, name)
        assert abs(approx - exact) <= width + 1e-9, (name, approx, exact)


def test_quantile_store_merge_is_exact(spark, tables, tmp_path):
    """Merging per-day histograms must equal histogramming the merged rows
    directly — integer counts, no estimate drift at all."""
    events = tables["events"]
    path = str(tmp_path / "qstore2")
    sketches.write_quantile_store(events, path)
    merged = (
        spark.read.parquet(path)
        .groupBy("bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    direct = (
        sketches.daily_value_histograms(events)
        .groupBy("bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))


def test_quantile_store_streaming_sink_equals_batch(spark, tables, tmp_path):
    """Stream-maintained store must equal the batch-built store EXACTLY —
    integer-count merge has no estimate drift across micro-batches."""
    import glob
    import shutil

    events = tables["events"]
    watch = tmp_path / "changes"
    watch.mkdir()
    for i, half in enumerate(
        (events.filter("event_id % 2 = 0"), events.filter("event_id % 2 = 1"))
    ):
        staged = str(tmp_path / f"stage{i}")
        half.coalesce(1).write.mode("overwrite").parquet(staged)
        shutil.copy(glob.glob(f"{staged}/part-*.parquet")[0], watch / f"b{i}.parquet")

    store_path = str(tmp_path / "qstore_stream")
    src = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(watch))
    )
    q = (
        sketches.quantile_store_streaming_sink(src, store_path)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(180)
    finally:
        q.stop()

    batch_path = str(tmp_path / "qstore_batch")
    sketches.write_quantile_store(events, batch_path)
    streamed = sorted(map(tuple, spark.read.parquet(store_path).collect()))
    batch = sorted(map(tuple, spark.read.parquet(batch_path).collect()))
    assert streamed == batch
    # and the rollup over the streamed store answers identically
    a = sketches.quantiles_from_store(spark, store_path).first()
    b = sketches.quantiles_from_store(spark, batch_path).first()
    assert a == b


# ---------------------------------------------------------------------------
# count-min sketch (frequency member of the sketch-store family)
# ---------------------------------------------------------------------------


def test_cms_never_underestimates_and_is_exact_when_wide(spark, tables):
    from jobanalytics_bigdataproject_spark.operators import sketches

    ev = tables["events"]
    exact = {r.user_id: r.n for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()}
    keys = ev.select("user_id").distinct()

    sk = sketches.cms_sketch(ev, "user_id", depth=4, width=256)
    est = {r.user_id: r.cms_est for r in sketches.cms_estimate(sk, keys, "user_id", 4, 256).collect()}
    assert set(est) == set(exact)
    assert all(est[k] >= exact[k] for k in exact)
    n_total = sum(exact.values())
    # CMS bound: overestimate <= e/width * N with prob 1-e^-depth; allow 2x slack
    assert all(est[k] - exact[k] <= 2 * 2.72 * n_total / 256 for k in exact)

    # width >> distinct keys -> no collisions -> exact
    wide = sketches.cms_sketch(ev, "user_id", depth=4, width=1 << 17)
    est_w = {
        r.user_id: r.cms_est
        for r in sketches.cms_estimate(wide, keys, "user_id", 4, 1 << 17).collect()
    }
    assert est_w == exact


def test_cms_rollup_equals_single_pass(spark, tables, tmp_path):
    from jobanalytics_bigdataproject_spark.operators import sketches

    ev = tables["events"]
    path = str(tmp_path / "cms_store")
    sketches.write_cms_store(ev, path)
    merged = sketches.cms_rollup(spark.read.parquet(path), "1900-01-01", "2100-01-01")
    single = sketches.cms_sketch(ev, "user_id")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, single.collect()))


def test_cms_heavy_hitters_report_shape(spark, tmp_path):
    from jobanalytics_bigdataproject_spark.operators import sketches
    from jobanalytics_bigdataproject_spark.sources.readers import read_table

    sf_dir = "/root/testdata/sf0.001"
    path = str(tmp_path / "cms_store2")
    sketches.write_cms_store(read_table(spark, sf_dir, "events"), path)
    rows = sketches.cms_heavy_hitters_report(spark, sf_dir, path, top_k=10).collect()
    assert len(rows) == 10
    assert all(r.cms_est >= r.exact_n for r in rows)
    assert all(r.overest_bp >= 0 for r in rows)
    ns = [r.exact_n for r in rows]
    assert ns == sorted(ns, reverse=True)


def test_bloom_prefilter_no_false_negatives_and_pure_projection(spark, tables):
    from jobanalytics_bigdataproject_spark.operators import sketches
    from jobanalytics_bigdataproject_spark.plans.inspect import formatted_plan

    orders, customer = tables["orders"], tables["customer"]
    keys = customer.filter(F.col("c_acctbal") >= 5000).select("c_custkey")
    words = sketches.bloom_bits_from_keys(keys, "c_custkey", depth=4, width=512)
    pred = sketches.bloom_might_contain("o_custkey", words, depth=4, width=512)
    kept = orders.filter(pred)
    # membership is a pure filter: no join anywhere in the plan
    assert "Join" not in formatted_plan(kept)
    # never a false negative: every exact-semi-join row passes the bloom
    exact = orders.join(F.broadcast(keys), F.col("o_custkey") == F.col("c_custkey"), "left_semi")
    missed = exact.exceptAll(kept).count()
    assert missed == 0


def test_bloom_prefilter_counts_false_positives_when_narrow(spark):
    from jobanalytics_bigdataproject_spark.operators import sketches

    # 64-bit bloom with 40 keys is saturated -> false positives guaranteed,
    # proving the report actually measures them
    keys = spark.range(40).withColumnRenamed("id", "k")
    fact = spark.range(2000).withColumnRenamed("id", "fk")
    words = sketches.bloom_bits_from_keys(keys, "k", depth=2, width=64)
    pred = sketches.bloom_might_contain("fk", words, depth=2, width=64)
    kept = fact.filter(pred).count()
    assert kept > 40  # all true keys + inevitable false positives
    exact = fact.join(keys, fact["fk"] == keys["k"], "left_semi").count()
    assert exact == 40


def test_cms_streaming_sink_equals_batch_store(spark, tables, tmp_path):
    from jobanalytics_bigdataproject_spark.operators import sketches
    from jobanalytics_bigdataproject_spark.streaming import windows as stream

    ev = tables["events"]
    src = str(tmp_path / "cms_ev")
    ev.repartition(2).write.parquet(src)
    streamed = stream.read_events_stream(spark, src, max_files_per_trigger=1)
    store = str(tmp_path / "cms_stream_store")
    q = (
        sketches.cms_store_streaming_sink(streamed, store)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    got = spark.read.parquet(store)
    want = sketches.cms_sketch(
        ev.withColumn("day", F.date_format(F.to_date("ts"), "yyyy-MM-dd")),
        "user_id",
        group_cols=("day",),
    )
    assert sorted(map(tuple, got.select("day", "row_i", "bucket", "n").collect())) == \
           sorted(map(tuple, want.select("day", "row_i", "bucket", "n").collect()))


def test_drift_from_store_zero_fills_and_shares(spark, tmp_path):
    from jobanalytics_bigdataproject_spark.operators import sketches as sk

    # two days, deliberately different bucket mixes
    rows = (
        [("2024-01-01 00:00:00", 10.0)] * 3 + [("2024-01-01 00:00:00", 500.0)]
        + [("2024-01-02 00:00:00", 10.0)] + [("2024-01-02 00:00:00", 900.0)] * 3
    )
    ev = spark.createDataFrame(rows, "ts_s string, value double").select(
        F.col("ts_s").cast("timestamp").alias("ts"), "value"
    )
    path = str(tmp_path / "store")
    sk.write_quantile_store(ev, path)
    rep = sk.drift_from_store(
        spark, path, "2024-01-01", "2024-01-01", "2024-01-02", "2024-01-02"
    ).collect()
    by_bucket = {r.bucket: r for r in rep}
    # value 10.0 -> cents 1000 -> bucket 1 + floor(1000*256/100000) = 3
    assert by_bucket[3].base_n == 3 and by_bucket[3].cur_n == 1
    assert by_bucket[3].base_share_bp == 7500 and by_bucket[3].cur_share_bp == 2500
    assert by_bucket[3].delta_bp == -5000
    # bucket present only in one window is zero-filled, not dropped
    b500 = 1 + (50000 * 256) // 100000
    assert by_bucket[b500].base_n == 1 and by_bucket[b500].cur_n == 0
    # buckets observed in neither window are absent
    assert all(r.base_n > 0 or r.cur_n > 0 for r in rep)
