"""Bucketed tables (sources/writers.write_bucketed_table): repeated joins
on the bucket key must be shuffle-free — the [EXT] co-located-join scale
path (SURVEY.md §2.1 S3 note)."""

from __future__ import annotations

from pyspark.sql import functions as F

from jobanalytics_bigdataproject_spark.plans import inspect
from jobanalytics_bigdataproject_spark.sources.writers import write_bucketed_table


def test_bucketed_join_is_shuffle_free(spark, tables):
    write_bucketed_table(
        tables["orders"].select("o_orderkey", "o_custkey", "o_totalprice"),
        "orders_b", ["o_custkey"], num_buckets=8,
    )
    write_bucketed_table(
        tables["customer"].select("c_custkey", "c_mktsegment"),
        "customer_b", ["c_custkey"], num_buckets=8,
    )
    o = spark.table("orders_b")
    c = spark.table("customer_b")
    # disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = o.join(c, o.o_custkey == c.c_custkey).groupBy("c_mktsegment").count()
        n_ex = inspect.count_exchanges(joined)
        plan = inspect.formatted_plan(joined)
        assert "SortMergeJoin" in plan
        # bucket layout satisfies the join's distribution: no exchange
        # below the join (the only allowed exchange is the tiny post-agg)
        assert n_ex <= 1
        rows = dict((r.c_mktsegment, r["count"]) for r in joined.collect())
        expected = dict(
            (r.c_mktsegment, r["count"])
            for r in tables["orders"]
            .join(tables["customer"], F.col("o_custkey") == F.col("c_custkey"))
            .groupBy("c_mktsegment")
            .count()
            .collect()
        )
        assert rows == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS customer_b")


# ------- snapshot-layer bucketed storage (VERDICT r5 #5): versioned tables
# written with write_snapshot(bucket_by=(col, N)) join shuffle-free via
# read_snapshot_bucketed


def test_snapshot_bucketed_join_is_shuffle_free(spark, tables, tmp_path):
    from jobanalytics_bigdataproject_spark.sources import snapshots as sn

    od = str(tmp_path / "orders_t")
    cd = str(tmp_path / "cust_t")
    sn.write_snapshot(
        tables["orders"].select("o_orderkey", "o_custkey", "o_totalprice"),
        od, bucket_by=("o_custkey", 8),
    )
    # appends inherit the bucket layout and stay joinable
    sn.write_snapshot(
        tables["orders"].select("o_orderkey", "o_custkey", "o_totalprice")
        .withColumn("o_orderkey", F.col("o_orderkey") + 10_000_000),
        od,
    )
    sn.write_snapshot(
        tables["customer"].select("c_custkey", "c_mktsegment"),
        cd, bucket_by=("c_custkey", 8),
    )
    o = sn.read_snapshot_bucketed(spark, od, "orders_snap_b")
    c = sn.read_snapshot_bucketed(spark, cd, "cust_snap_b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            o.join(c, o.o_custkey == c.c_custkey)
            .groupBy("c_mktsegment").count()
        )
        plan = inspect.formatted_plan(joined)
        assert "SortMergeJoin" in plan
        assert inspect.count_exchanges(joined) <= 1  # only the post-agg
        got = {r.c_mktsegment: r["count"] for r in joined.collect()}
        base = tables["orders"].select("o_custkey")
        expected = {
            r.c_mktsegment: r["count"]
            for r in base.unionByName(base)
            .join(tables["customer"], F.col("o_custkey") == F.col("c_custkey"))
            .groupBy("c_mktsegment").count().collect()
        }
        assert got == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS orders_snap_b")
        spark.sql("DROP TABLE IF EXISTS cust_snap_b")


def test_snapshot_bucket_layout_rules(spark, tmp_path):
    import pytest

    from jobanalytics_bigdataproject_spark.sources import snapshots as sn

    td = str(tmp_path / "t")
    df = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("g")
    )
    with pytest.raises(ValueError, match="mutually exclusive"):
        sn.write_snapshot(df, td, bucket_by=("k", 4), partition_by=("g",))
    sn.write_snapshot(df, td, bucket_by=("k", 4))
    # conflicting append layout refused
    with pytest.raises(ValueError, match="conflicts"):
        sn.write_snapshot(df, td, bucket_by=("k", 8))
    with pytest.raises(ValueError, match="conflicts"):
        sn.write_snapshot(df, td, bucket_by=("g", 4))
    # introducing a layout by append refused
    flat = str(tmp_path / "flat")
    sn.write_snapshot(df, flat)
    with pytest.raises(ValueError, match="unbucketed"):
        sn.write_snapshot(df, flat, bucket_by=("k", 4))
    # unknown bucket column refused
    with pytest.raises(ValueError, match="not in data"):
        sn.write_snapshot(df, str(tmp_path / "x"), bucket_by=("nope", 4))


def test_dml_drops_bucket_layout_and_read_refuses(spark, tmp_path):
    """One DML-rewritten file breaks the all-files-bucket-named property
    — the commit drops bucket_by and the bucketed read refuses loudly
    (wrong join results would be silent otherwise)."""
    import pytest

    from jobanalytics_bigdataproject_spark.sources import snapshots as sn

    td = str(tmp_path / "t")
    df = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("g")
    )
    sn.write_snapshot(df, td, bucket_by=("k", 4))
    v1 = sn.current_version(spark, td)
    sn.delete_where(spark, td, "k = 5")
    assert sn.snapshot_info(spark, td, sn.current_version(spark, td)).get(
        "bucket_by") is None
    with pytest.raises(ValueError, match="no bucket layout"):
        sn.read_snapshot_bucketed(spark, td, "t_b")
    # the PRE-DML version still reads bucketed (layout is per-version)
    got = sn.read_snapshot_bucketed(spark, td, "t_b_v1", version=v1)
    assert got.count() == 100
    spark.sql("DROP TABLE IF EXISTS t_b_v1")
    # plain read_snapshot of the head is unaffected
    assert sn.read_snapshot(spark, td).count() == 99


def test_vacuum_reaps_expired_bucket_views(spark, tmp_path):
    """Hardlink views keep data inodes alive past vacuum's data/ unlink —
    right for retained versions, a disk leak for expired ones: vacuum
    removes _bucketview dirs of versions older than the retention floor
    and keeps the retained ones readable."""
    import os

    from jobanalytics_bigdataproject_spark.sources import snapshots as sn

    td = str(tmp_path / "t")
    df = spark.range(0, 50).select(F.col("k").alias("k")) if False else (
        spark.range(0, 50).selectExpr("id as k")
    )
    sn.write_snapshot(df, td, bucket_by=("k", 4))
    sn.read_snapshot_bucketed(spark, td, "bv_vac_v1").count()
    sn.write_snapshot(df, td)
    sn.write_snapshot(df, td)
    b3 = sn.read_snapshot_bucketed(spark, td, "bv_vac_v3")
    assert sorted(os.listdir(os.path.join(td, "_bucketview"))) == [
        "v00000001", "v00000003",
    ]
    sn.vacuum(spark, td, keep_last=1, grace_seconds=0)
    assert sorted(os.listdir(os.path.join(td, "_bucketview"))) == ["v00000003"]
    assert b3.count() == 150  # the retained view still reads
    spark.sql("DROP TABLE IF EXISTS bv_vac_v1")
    spark.sql("DROP TABLE IF EXISTS bv_vac_v3")


def test_rollback_and_metadata_commits_keep_bucket_layout(spark, tmp_path):
    """Review findings r6: rollback restores the target's bucket layout
    (the restored file set IS the bucket-named files); constraint
    commits touch no file and must carry it; clones reference the
    source's files verbatim."""
    from jobanalytics_bigdataproject_spark.sources import snapshots as sn

    td = str(tmp_path / "t")
    df = spark.range(0, 100).selectExpr("id as k")
    sn.write_snapshot(df, td, bucket_by=("k", 4))
    sn.write_snapshot(df.selectExpr("k + 100 as k"), td)
    sn.add_constraint(spark, td, "pos", "k >= 0")
    assert sn.snapshot_info(spark, td, 3)["bucket_by"] == {"col": "k", "n": 4}
    sn.drop_constraint(spark, td, "pos")
    assert sn.snapshot_info(spark, td, 4)["bucket_by"] == {"col": "k", "n": 4}
    sn.rollback(spark, td, to_version=1)
    assert sn.snapshot_info(spark, td, 5)["bucket_by"] == {"col": "k", "n": 4}
    # the restored head reads bucketed AND accepts a bucketed append
    got = sn.read_snapshot_bucketed(spark, td, "bv_rb")
    assert got.count() == 100
    spark.sql("DROP TABLE IF EXISTS bv_rb")
    v = sn.write_snapshot(df.selectExpr("k + 200 as k"), td)
    assert sn.snapshot_info(spark, td, v)["bucket_by"] == {"col": "k", "n": 4}
    # clone carries the layout over absolute file references
    dst = str(tmp_path / "clone")
    sn.shallow_clone(spark, td, dst)
    got2 = sn.read_snapshot_bucketed(spark, dst, "bv_cl")
    assert got2.count() == 200
    spark.sql("DROP TABLE IF EXISTS bv_cl")


def test_evolve_refuses_on_bucketed_table(spark, tmp_path):
    import pytest

    from jobanalytics_bigdataproject_spark.sources import snapshots as sn

    td = str(tmp_path / "t")
    sn.write_snapshot(spark.range(0, 10).selectExpr("id as k", "id % 3 as g"),
                      td, bucket_by=("k", 2))
    with pytest.raises(ValueError, match="bucket-layout"):
        sn.evolve_partition_spec(spark, td, ("g",))
