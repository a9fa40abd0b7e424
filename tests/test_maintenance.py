"""Small-file compaction and ANALYZE statistics (sources/maintenance.py)."""

from __future__ import annotations

import glob

from jobanalytics_bigdataproject_spark.sources.maintenance import (
    analyze_table,
    compact_parquet,
)


def test_compact_parquet_binpacks_small_files(spark, tables, tmp_path):
    src, dst = str(tmp_path / "many"), str(tmp_path / "few")
    events = tables["events"]
    # simulate a streaming sink's droppings: lots of tiny files
    events.repartition(64).write.option("maxRecordsPerFile", 200).mode(
        "overwrite"
    ).parquet(src)
    n_small = len(glob.glob(f"{src}/*.parquet"))
    assert n_small >= 50

    n_out = compact_parquet(spark, src, dst, target_mb=128)
    n_files = len(glob.glob(f"{dst}/*.parquet"))
    assert n_files == n_out < n_small / 10          # order-of-magnitude fewer files
    # rewrite is lossless
    assert spark.read.parquet(dst).count() == events.count()
    assert set(spark.read.parquet(dst).columns) == set(events.columns)


def test_analyze_table_feeds_optimizer_stats(spark, tables, tmp_path):
    spark.sql("DROP TABLE IF EXISTS stats_demo")
    tables["nation"].write.mode("overwrite").saveAsTable("stats_demo")
    try:
        analyze_table(spark, "stats_demo", columns=("n_nationkey", "n_name"))
        # table-level stats visible in the catalog…
        desc = {
            r.col_name: r.data_type
            for r in spark.sql("DESCRIBE EXTENDED stats_demo").collect()
        }
        assert "Statistics" in desc and "rows" in desc["Statistics"]
        # …and with CBO on, the optimized plan carries an exact rowCount
        spark.conf.set("spark.sql.cbo.enabled", "true")
        try:
            stats = (
                spark.table("stats_demo")
                ._jdf.queryExecution()
                .optimizedPlan()
                .stats()
                .toString()
            )
            assert "rowCount=25" in stats
        finally:
            spark.conf.set("spark.sql.cbo.enabled", "false")
    finally:
        spark.sql("DROP TABLE IF EXISTS stats_demo")


# ------------------------------------------- maintain() policy (VERDICT r4 #10)


def test_maintain_converges_churned_table(spark, tmp_path):
    from pyspark.sql import functions as F

    from jobanalytics_bigdataproject_spark.sources import snapshots as sn
    from jobanalytics_bigdataproject_spark.sources.maintenance import maintain

    tdir = str(tmp_path / "churned")
    # churn: 12 drip commits (streaming-sink shape) + a MOR delete
    for lo in range(0, 120, 10):
        sn.write_snapshot(
            spark.range(lo, lo + 10).select(
                F.col("id").alias("i"), (F.col("id") % 5).alias("g")
            ),
            tdir,
            stats_cols=("i",),
        )
    sn.delete_where_mor(spark, tdir, "i % 3 = 0")
    before = sn.describe_detail(spark, tdir)
    assert before["n_files"] >= 12 and before["dv_rows"] > 0

    res = maintain(
        spark, tdir, target_file_mb=128, small_file_mb=1,
        max_small_files=2, max_dv_rows_pct=0.01,
    )
    assert res["materialized"] and res["compacted"]
    after = sn.describe_detail(spark, tdir)
    assert after["dv_rows"] == 0  # DV debt gone
    assert after["n_files"] < before["n_files"]  # small-file debt gone
    assert sn.read_snapshot(spark, tdir).count() == 120 - 40  # rows intact

    # converged: a second run decides nothing (idempotent no-op)
    res2 = maintain(
        spark, tdir, target_file_mb=128, small_file_mb=1,
        max_small_files=2, max_dv_rows_pct=0.01,
    )
    assert not (res2["materialized"] or res2["compacted"] or res2["zordered"])
    assert res2["version"] == res["version"]


def test_maintain_zorders_only_on_drift(spark, tmp_path):
    from pyspark.sql import functions as F

    from jobanalytics_bigdataproject_spark.sources import snapshots as sn
    from jobanalytics_bigdataproject_spark.sources.maintenance import (
        clustering_overlap,
        maintain,
    )

    tdir = str(tmp_path / "drifty")
    # unclustered commits: every file spans the full (x, y) space
    for _ in range(4):
        sn.write_snapshot(
            spark.range(0, 1024).select(
                (F.col("id") % 32).alias("x"), (F.col("id") / 32).cast("long").alias("y")
            ).repartition(2),
            tdir,
            stats_cols=("x", "y"),
        )
    man = sn.snapshot_info(spark, tdir, sn.current_version(spark, tdir))
    assert clustering_overlap(man, ["x", "y"]) > 0.9  # fully drifted

    res = maintain(
        spark, tdir, target_file_mb=0.001, max_small_files=10_000,
        zorder_by=("x", "y"), max_overlap=0.5,
    )
    assert res["zordered"]
    man2 = sn.snapshot_info(spark, tdir, res["version"])
    drift = clustering_overlap(man2, ["x", "y"])
    assert drift < 0.5  # re-clustered below threshold

    # and now the signal gates the expensive tier OFF
    res2 = maintain(
        spark, tdir, target_file_mb=0.001, max_small_files=10_000,
        zorder_by=("x", "y"), max_overlap=0.5,
    )
    assert not res2["zordered"]
    assert sn.read_snapshot(spark, tdir).count() == 4096


def test_maintain_composes_with_derived_partitions(spark, tmp_path):
    """maintain() on a days(ts)-partitioned table: selective compaction
    regroups by the DERIVED spec (the per-file single-day property
    survives the small-file sweep)."""
    from pyspark.sql import functions as F

    from jobanalytics_bigdataproject_spark.sources import snapshots as sn
    from jobanalytics_bigdataproject_spark.sources.maintenance import maintain

    tdir = str(tmp_path / "daily")

    def batch(lo, hi):
        return spark.range(lo, hi).select(
            F.col("id").alias("i"),
            (
                F.lit("2024-01-01 00:00:00").cast("timestamp")
                + (F.col("id") % 48) * F.expr("INTERVAL 1 HOUR")
            ).alias("ts"),
        )

    sn.write_snapshot(batch(0, 50), tdir, partition_by=("days(ts)",))
    for lo in range(50, 250, 50):
        sn.write_snapshot(batch(lo, lo + 50), tdir)
    before = sn.describe_detail(spark, tdir)
    res = maintain(spark, tdir, target_file_mb=128, small_file_mb=1,
                   max_small_files=2)
    assert res["compacted"]
    man = sn.snapshot_info(spark, tdir, res["version"])
    assert len(man["files"]) < before["n_files"]
    for rel in man["files"]:  # one day per file survived the compaction
        st = man["stats"][rel]["days(ts)"]
        assert st[0] == st[1]
    assert sn.read_snapshot(spark, tdir).count() == 250


def test_maintain_time_based_expiry(spark, tmp_path):
    """maintain(expire_older_than=...) folds Iceberg-style time retention
    into the policy loop: versions committed before the horizon expire
    (head survives), reaped files count into vacuumed_files."""
    import os
    import time as _t

    from jobanalytics_bigdataproject_spark.sources import snapshots as sn
    from jobanalytics_bigdataproject_spark.sources.maintenance import maintain
    from pyspark.sql import functions as F

    tdir = str(tmp_path / "exp")
    for lo in (0, 10, 20):
        sn.write_snapshot(
            spark.range(lo, lo + 10).select(F.col("id").alias("i")), tdir
        )
    # age v1/v2 past a 1-hour horizon
    now = _t.time()
    for v in (1, 2):
        mp = os.path.join(tdir, "_log", f"v0000000{v}.json")
        os.utime(mp, (now - 7200, now - 7200))
    res = maintain(
        spark, tdir, max_small_files=10_000,
        expire_older_than=now - 3600,
    )
    assert res["expired_versions"] == [1, 2]
    assert sn.current_version(spark, tdir) == 3
    assert sn.read_snapshot(spark, tdir).count() == 30
    # idempotent: nothing left past the horizon
    res2 = maintain(
        spark, tdir, max_small_files=10_000, expire_older_than=now - 3600
    )
    assert res2["expired_versions"] == []


def test_maintain_hilbert_curve_option(spark, tmp_path):
    """curve='hilbert' routes the drift-gated re-cluster through
    optimize_snapshot(hilbert_by=...); the converged table gates it off
    on the second pass exactly like the Morton path."""
    import random

    from jobanalytics_bigdataproject_spark.sources import maintenance as mt
    from jobanalytics_bigdataproject_spark.sources import snapshots as sn

    rnd = random.Random(7)
    rows = [(i, rnd.randrange(1000), float(rnd.randrange(1000))) for i in range(4000)]
    df = spark.createDataFrame(rows, "id LONG, x LONG, y DOUBLE")
    t = str(tmp_path / "snap")
    sn.write_snapshot(df.repartition(8), t, stats_cols=("x", "y"))
    r1 = mt.maintain(
        spark, t, target_file_mb=0.001, max_small_files=10_000,
        zorder_by=("x", "y"), max_overlap=0.5, curve="hilbert",
    )
    assert r1["zordered"] is True
    r2 = mt.maintain(
        spark, t, target_file_mb=0.001, max_small_files=10_000,
        zorder_by=("x", "y"), max_overlap=0.5, curve="hilbert",
    )
    assert r2["zordered"] is False  # converged: metadata-only no-op
    import pytest as _pytest

    with _pytest.raises(ValueError, match="curve"):
        mt.maintain(spark, t, zorder_by=("x",), max_overlap=-1, curve="peano")


def test_maintain_rejects_unknown_curve_up_front(spark, tmp_path):
    """ADVICE r7: a typo'd curve must fail at entry, not lie dormant
    until clustering drift trips the rewrite gate."""
    import pytest

    from jobanalytics_bigdataproject_spark.sources import snapshots as sn
    from jobanalytics_bigdataproject_spark.sources.maintenance import maintain

    path = str(tmp_path / "tbl")
    sn.write_snapshot(
        spark.range(10).selectExpr("id", "id * 2 AS v"), path, mode="overwrite"
    )
    with pytest.raises(ValueError, match="curve must be"):
        maintain(spark, path, zorder_by=["id"], curve="peano")
