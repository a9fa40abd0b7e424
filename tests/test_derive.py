"""Derivation helpers: epoch conversion exactness, map lookup, bucketize,
state-extraction-style idempotence (SURVEY.md §5.2 item 3)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from jobanalytics_bigdataproject_spark.functions import derive


def test_epoch_ms_to_ts_exact(spark):
    df = spark.createDataFrame([(1704067200123,)], ["ms"])
    out = df.select(derive.epoch_ms_to_ts("ms").alias("ts")).first()
    assert out.ts == dt.datetime(2024, 1, 1, 0, 0, 0, 123000)


def test_decompose_timestamp(tables):
    out = derive.decompose_timestamp(tables["events"], "ts", prefix="e_")
    row = out.select("e_month", "e_dow", "e_hour").first()
    assert 1 <= row.e_month <= 12 and 1 <= row.e_dow <= 7 and 0 <= row.e_hour <= 23


def test_parse_key_token_negative_index(spark):
    df = spark.createDataFrame([("Customer#000000042",), (None,)], ["name"])
    out = df.select(derive.parse_key_token("name", "#", -1).alias("tok")).collect()
    assert out[0].tok == "000000042" and out[1].tok is None


def test_map_lookup_with_default(spark):
    df = spark.createDataFrame([("a",), ("zz",)], ["k"])
    out = df.select(
        derive.map_lookup("k", {"a": "A"}, F.lit("OTHER")).alias("v")
    ).collect()
    assert [r.v for r in out] == ["A", "OTHER"]


def test_map_lookup_idempotent_on_mapped_domain(spark):
    # mapping into its own image twice == once (state-extraction idempotence)
    mapping = {"CA": "CA", "CALIFORNIA": "CA"}
    df = spark.createDataFrame([("CALIFORNIA",), ("CA",)], ["s"])
    once = df.select(derive.map_lookup("s", mapping, F.lit(None)).alias("v"))
    twice = once.select(derive.map_lookup("v", mapping, F.lit(None)).alias("v"))
    assert [r.v for r in once.collect()] == [r.v for r in twice.collect()]


def test_bucketize_counts_partition_data(tables):
    out = derive.bucketize(tables["lineitem"], "l_extendedprice")
    counts = {r.tier: r["count"] for r in out.groupBy("tier").count().collect()}
    total = sum(counts.values())
    assert set(counts) == {"LOW", "MID", "HIGH"} and total == tables["lineitem"].count()
    # p33/p67 split ⇒ each bucket within a few % of a third
    for v in counts.values():
        assert 0.2 < v / total < 0.5


def test_with_log_features(spark):
    df = spark.createDataFrame([(0.0,), (None,)], ["x"])
    out = derive.with_log_features(df, ["x"]).collect()
    assert all(r["log_x"] == 0.0 for r in out)  # log1p(0)=0, null→0
