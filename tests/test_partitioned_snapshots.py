"""Partitioned snapshot tables (VERDICT r4 #6): Iceberg-style identity
partitioning recorded in the manifest — files split one-partition-value-
per-file, partition columns auto-join the stats so pruning and the
delete_range zero-I/O drop tier become EXACT on partition predicates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jobanalytics_bigdataproject_spark.sources import snapshots as sn


@pytest.fixture()
def tdir(tmp_path):
    return str(tmp_path / "tbl")


def _pdf(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("i"),
        (F.col("id") % 4).alias("p"),
        F.concat(F.lit("v-"), F.col("id")).alias("v"),
    )


def test_partitioned_write_splits_files_exactly(spark, tdir):
    v = sn.write_snapshot(_pdf(spark, 0, 400).repartition(2), tdir,
                          partition_by=("p",))
    assert v == 1
    man = sn.snapshot_info(spark, tdir, 1)
    assert man["partition_spec"] == ["p"]
    # every file holds exactly one partition value: min == max in stats
    for rel in man["files"]:
        st = man["stats"][rel]["p"]
        assert st[0] == st[1]
    # all 4 partition values present across files
    assert {man["stats"][rel]["p"][0] for rel in man["files"]} == {0, 1, 2, 3}
    # contents round-trip with the partition column in the data itself
    got = sn.read_snapshot(spark, tdir)
    assert got.count() == 400
    assert got.filter("p != i % 4").count() == 0


def test_partition_prune_is_file_exact(spark, tdir):
    sn.write_snapshot(_pdf(spark, 0, 400).repartition(2), tdir,
                      partition_by=("p",))
    man = sn.snapshot_info(spark, tdir, 1)
    one = sn.read_snapshot(spark, tdir, prune={"p": (2, 2)})
    kept = one.inputFiles()
    expect = [r for r in man["files"] if man["stats"][r]["p"][0] == 2]
    assert len(kept) == len(expect)
    assert one.filter("p = 2").count() == 100


def test_append_inherits_spec_and_refuses_conflict(spark, tdir):
    sn.write_snapshot(_pdf(spark, 0, 40), tdir, partition_by=("p",))
    v2 = sn.write_snapshot(_pdf(spark, 40, 80), tdir)  # inherits
    man = sn.snapshot_info(spark, tdir, v2)
    assert man["partition_spec"] == ["p"]
    for rel in man["files"]:  # the appended files are split too
        st = man["stats"][rel]["p"]
        assert st[0] == st[1]
    with pytest.raises(ValueError, match="conflicts"):
        sn.write_snapshot(_pdf(spark, 80, 90), tdir, partition_by=("v",))
    # introducing a spec by append on an unpartitioned table refuses
    flat = tdir + "-flat"
    sn.write_snapshot(_pdf(spark, 0, 10), flat)
    with pytest.raises(ValueError, match="unpartitioned"):
        sn.write_snapshot(_pdf(spark, 10, 20), flat, partition_by=("p",))
    # overwrite re-declares the layout
    v = sn.write_snapshot(_pdf(spark, 0, 20), flat, mode="overwrite",
                          partition_by=("p",))
    assert sn.snapshot_info(spark, flat, v)["partition_spec"] == ["p"]


def test_delete_range_drops_whole_partition_without_io(spark, tdir):
    sn.write_snapshot(_pdf(spark, 0, 400).repartition(2), tdir,
                      partition_by=("p",))
    res = sn.delete_range(spark, tdir, "p", 1, 1)
    # DROP PARTITION tier: every hit file was wholly inside the range —
    # metadata-only commit, zero files rewritten
    assert res["rows_deleted"] == 100
    assert res["files_rewritten"] == 0
    assert res["files_dropped"] >= 1
    got = sn.read_snapshot(spark, tdir)
    assert got.count() == 300
    assert got.filter("p = 1").count() == 0


def test_selective_optimize_regroups_by_partition(spark, tdir):
    # many small per-partition files from several appends
    sn.write_snapshot(_pdf(spark, 0, 40).repartition(2), tdir,
                      partition_by=("p",))
    for lo in (40, 80, 120):
        sn.write_snapshot(_pdf(spark, lo, lo + 40).repartition(2), tdir)
    before = sn.snapshot_info(spark, tdir, sn.current_version(spark, tdir))
    v = sn.optimize_snapshot(spark, tdir, target_mb=128, min_file_mb=1)
    man = sn.snapshot_info(spark, tdir, v)
    assert len(man["files"]) < len(before["files"])
    # compaction preserved the one-value-per-file property
    for rel in man["files"]:
        st = man["stats"][rel]["p"]
        assert st[0] == st[1]
    assert sn.read_snapshot(spark, tdir).count() == 160
    assert man["partition_spec"] == ["p"]


def test_full_rewrite_optimize_preserves_spec(spark, tdir):
    sn.write_snapshot(_pdf(spark, 0, 200).repartition(4), tdir,
                      partition_by=("p",))
    v = sn.optimize_snapshot(spark, tdir, target_mb=128)
    man = sn.snapshot_info(spark, tdir, v)
    assert man["partition_spec"] == ["p"]
    for rel in man["files"]:
        st = man["stats"][rel]["p"]
        assert st[0] == st[1]
    assert sn.read_snapshot(spark, tdir).count() == 200


def test_dml_on_partitioned_table_stays_correct(spark, tdir):
    sn.write_snapshot(_pdf(spark, 0, 100).repartition(2), tdir,
                      partition_by=("p",))
    sn.update_where(spark, tdir, {"v": "'redacted'"}, "i = 7")
    got = sn.read_snapshot(spark, tdir)
    assert got.filter("i = 7").first().v == "redacted"
    assert got.count() == 100
    man = sn.snapshot_info(spark, tdir, sn.current_version(spark, tdir))
    assert man["partition_spec"] == ["p"]  # spec survives the COW rewrite
    # pruning still CORRECT (possibly coarser) through the rewritten file
    assert sn.read_snapshot(spark, tdir, prune={"p": (3, 3)}).filter(
        "p = 3"
    ).count() == 25


def test_describe_detail_reports_spec(spark, tdir):
    sn.write_snapshot(_pdf(spark, 0, 40), tdir, partition_by=("p",))
    d = sn.describe_detail(spark, tdir)
    assert d["partition_spec"] == ["p"]
    flat = tdir + "-flat"
    sn.write_snapshot(_pdf(spark, 0, 10), flat)
    assert sn.describe_detail(spark, flat)["partition_spec"] == []


def test_partitioned_time_travel_and_cdf(spark, tdir):
    sn.write_snapshot(_pdf(spark, 0, 40), tdir, partition_by=("p",))
    sn.write_snapshot(_pdf(spark, 40, 80), tdir)
    assert sn.read_snapshot(spark, tdir, version=1).count() == 40
    changes = sn.read_changes(spark, tdir, 1, 2)
    assert changes.count() == 40  # only the appended rows


def test_multi_column_spec(spark, tdir):
    df = spark.range(0, 120).select(
        F.col("id").alias("i"),
        (F.col("id") % 3).alias("a"),
        (F.col("id") % 2).alias("b"),
    )
    sn.write_snapshot(df.repartition(2), tdir, partition_by=("a", "b"))
    man = sn.snapshot_info(spark, tdir, 1)
    assert man["partition_spec"] == ["a", "b"]
    combos = set()
    for rel in man["files"]:
        sa, sb = man["stats"][rel]["a"], man["stats"][rel]["b"]
        assert sa[0] == sa[1] and sb[0] == sb[1]
        combos.add((sa[0], sb[0]))
    assert combos == {(a, b) for a in range(3) for b in range(2)}
    got = sn.read_snapshot(spark, tdir, prune={"a": (1, 1), "b": (0, 0)})
    assert len(got.inputFiles()) == sum(
        1
        for rel in man["files"]
        if man["stats"][rel]["a"][0] == 1 and man["stats"][rel]["b"][0] == 0
    )
    assert got.filter("a = 1 and b = 0").count() == 20


def test_streaming_sink_inherits_partition_spec(spark, tdir, tmp_path):
    """A foreachBatch snapshot_sink appending to a partitioned table
    inherits the spec automatically (write_snapshot append adopts the
    head's partition_spec) — each micro-batch commit stays split
    one-partition-value-per-file without the sink knowing about specs."""
    import shutil

    from jobanalytics_bigdataproject_spark.streaming.windows import (
        stream_from_directory,
    )

    sn.write_snapshot(_pdf(spark, 0, 40), tdir, partition_by=("p",))
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    _pdf(spark, 40, 80).coalesce(1).write.parquet(str(tmp_path / "stage"))
    stage = next((tmp_path / "stage").glob("*.parquet"))
    shutil.move(str(stage), src_dir / "b0.parquet")
    src = stream_from_directory(
        spark, str(src_dir), sn.read_snapshot(spark, tdir).schema
    )
    q = (
        src.writeStream.foreachBatch(sn.snapshot_sink(tdir))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    head = sn.current_version(spark, tdir)
    man = sn.snapshot_info(spark, tdir, head)
    assert man["partition_spec"] == ["p"]
    for rel in man["added"]:
        st = man["stats"][rel]["p"]
        assert st[0] == st[1]  # streamed commit split by the spec too
    assert sn.read_snapshot(spark, tdir).count() == 80


# ---------------------------------------- derived partition transforms


def _tsdf(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("i"),
        (
            F.lit("2024-01-01 00:00:00").cast("timestamp")
            + (F.col("id") * F.expr("INTERVAL 7 HOURS"))
        ).alias("ts"),
        (F.col("id") % 100).cast("double").alias("value"),
    )


def test_days_transform_splits_and_prunes(spark, tdir):
    sn.write_snapshot(_tsdf(spark, 0, 96).repartition(2), tdir,
                      partition_by=("days(ts)",))
    man = sn.snapshot_info(spark, tdir, 1)
    assert man["partition_spec"] == ["days(ts)"]
    days = set()
    for rel in man["files"]:
        st = man["stats"][rel]["days(ts)"]
        assert st[0] == st[1]  # one day per file
        days.add(st[0])
    assert len(days) == 28  # 96 * 7h = 28 days
    pruned = sn.read_snapshot(
        spark, tdir, prune={"days(ts)": ("2024-01-03", "2024-01-04")}
    )
    exp = [r for r in man["files"]
           if "2024-01-03" <= man["stats"][r]["days(ts)"][0] <= "2024-01-04"]
    assert len(pruned.inputFiles()) == len(exp)
    assert pruned.filter(
        "to_date(ts) between '2024-01-03' and '2024-01-04'"
    ).count() == 7  # 24h*2/7h rounding: ids 7..13


def test_days_transform_drop_partition_zero_io(spark, tdir):
    sn.write_snapshot(_tsdf(spark, 0, 96).repartition(2), tdir,
                      partition_by=("days(ts)",))
    res = sn.delete_range(spark, tdir, "days(ts)", "2024-01-01", "2024-01-07")
    assert res["files_rewritten"] == 0  # pure manifest arithmetic
    assert res["files_dropped"] >= 7
    got = sn.read_snapshot(spark, tdir)
    assert got.filter("to_date(ts) <= '2024-01-07'").count() == 0
    assert got.count() == 96 - res["rows_deleted"]
    # appended data re-splits by the derived spec
    v = sn.write_snapshot(_tsdf(spark, 96, 120), tdir)
    man = sn.snapshot_info(spark, tdir, v)
    for rel in man["added"]:
        st = man["stats"][rel]["days(ts)"]
        assert st[0] == st[1]


def test_months_transform(spark, tdir):
    df = _tsdf(spark, 0, 300)  # ~87 days -> 3-4 months
    sn.write_snapshot(df.repartition(2), tdir, partition_by=("months(ts)",))
    man = sn.snapshot_info(spark, tdir, 1)
    months = {man["stats"][r]["months(ts)"][0] for r in man["files"]}
    assert "2024-01" in months and len(months) >= 3
    pruned = sn.read_snapshot(
        spark, tdir, prune={"months(ts)": ("2024-02", "2024-02")}
    )
    assert 0 < len(pruned.inputFiles()) < len(man["files"])
    want = df.filter("date_format(ts, 'yyyy-MM') = '2024-02'").count()
    assert pruned.filter("date_format(ts, 'yyyy-MM') = '2024-02'").count() == want > 0


def test_transform_source_rename_and_drop_refused(spark, tdir):
    sn.write_snapshot(_tsdf(spark, 0, 20), tdir, partition_by=("days(ts)",))
    with pytest.raises(ValueError, match="derived partition transform"):
        sn.rename_column(spark, tdir, "ts", "event_time")
    with pytest.raises(ValueError, match="partition spec"):
        sn.drop_column(spark, tdir, "ts")
    # non-source columns still rename freely
    sn.rename_column(spark, tdir, "value", "amount")
    assert sn.read_snapshot(spark, tdir).columns == ["i", "ts", "amount"]


def test_transform_missing_source_refused(spark, tdir):
    with pytest.raises(ValueError, match="not in data"):
        sn.write_snapshot(
            spark.range(3).select(F.col("id").alias("i")), tdir,
            partition_by=("days(ts)",),
        )


def test_bucket_transform_point_lookup_prunes(spark, tdir):
    """bucket(N, key) partitioning: a point lookup on the SOURCE key
    prunes to the one bucket's files with no Bloom index at all — the
    Iceberg bucket-pruning shape for high-cardinality keys."""
    df = spark.range(0, 4000).select(
        F.col("id").alias("k"),
        F.concat(F.lit("u-"), F.col("id")).alias("u"),
    )
    sn.write_snapshot(df.repartition(2), tdir, partition_by=("bucket(8, k)",))
    man = sn.snapshot_info(spark, tdir, 1)
    assert man["partition_spec"] == ["bucket(8, k)"]
    buckets = set()
    for rel in man["files"]:
        st = man["stats"][rel]["bucket(8, k)"]
        assert st[0] == st[1]
        buckets.add(st[0])
    assert buckets == set(range(8))
    looked = sn.read_snapshot(spark, tdir, point={"k": 1234})
    # one bucket of eight → at most 1/4 of the files kept (2 writers x 8)
    assert len(looked.inputFiles()) <= len(man["files"]) // 4
    assert looked.filter("k = 1234").count() == 1
    # a value that does NOT exist still resolves to one bucket, not all
    missed = sn.read_snapshot(spark, tdir, point={"k": 999_999})
    assert len(missed.inputFiles()) <= len(man["files"]) // 4
    assert missed.filter("k = 999999").count() == 0


def test_days_transform_point_lookup_prunes(spark, tdir):
    import datetime

    sn.write_snapshot(_tsdf(spark, 0, 96).repartition(2), tdir,
                      partition_by=("days(ts)",))
    man = sn.snapshot_info(spark, tdir, 1)
    ts = datetime.datetime(2024, 1, 3, 13, 0, 0)
    looked = sn.read_snapshot(spark, tdir, point={"ts": ts})
    exp = [r for r in man["files"]
           if man["stats"][r]["days(ts)"][0] == "2024-01-03"]
    assert len(looked.inputFiles()) == len(exp) > 0


def test_bucket_delete_and_count_by_bucket_label(spark, tdir):
    df = spark.range(0, 2000).select(F.col("id").alias("k"))
    sn.write_snapshot(df.repartition(2), tdir, partition_by=("bucket(4, k)",))
    cw = sn.count_where(spark, tdir, "bucket(4, k)", 2, 2)
    assert cw["files_scanned"] == 0  # answered from per-file stats alone
    res = sn.delete_range(spark, tdir, "bucket(4, k)", 2, 2)
    assert res["files_rewritten"] == 0 and res["rows_deleted"] == cw["n_rows"]
    assert sn.read_snapshot(spark, tdir).count() == 2000 - cw["n_rows"]


def test_null_partition_values_are_safe(spark, tdir):
    """NULL partition values land in the hive default partition; their
    file's transform stats are NULL (min/max skip nulls), which the
    pruning predicate treats as always-keep — a NULL-key row can never
    be skipped away."""
    df = spark.createDataFrame(
        [(0, "2024-01-01 06:00:00"), (1, "2024-01-02 06:00:00"), (2, None)],
        "i long, raw string",
    ).select("i", F.col("raw").cast("timestamp").alias("ts"))
    sn.write_snapshot(df, tdir, partition_by=("days(ts)",))
    got = sn.read_snapshot(spark, tdir)
    assert got.count() == 3
    assert got.filter("ts is null").count() == 1
    # pruning keeps the NULL-day file (its stats are NULL → always kept)
    pruned = sn.read_snapshot(
        spark, tdir, prune={"days(ts)": ("2024-01-01", "2024-01-01")}
    )
    assert pruned.filter("ts is null").count() == 1
    assert pruned.filter("to_date(ts) = '2024-01-01'").count() == 1
    # the zero-I/O drop tier never drops the NULL file (BETWEEN is false
    # for NULL, so it has survivors)
    res = sn.delete_range(spark, tdir, "days(ts)", "2024-01-01", "2024-01-02")
    final = sn.read_snapshot(spark, tdir)
    assert final.count() == 1
    assert final.first().i == 2  # only the NULL-ts row survives


def test_zorder_optimize_on_partitioned_table(spark, tdir):
    """OPTIMIZE ZORDER BY on a partitioned table composes: the rewrite
    range-clusters on the Morton key, the partitioned staging re-splits
    by the spec, and both the spec and the one-value-per-file property
    survive — clustering WITHIN partitions, the standard lakehouse
    layout (PARTITIONED BY date, ZORDER BY keys)."""
    df = spark.range(0, 2000).select(
        F.col("id").alias("i"),
        (F.col("id") % 4).alias("p"),
        (F.col("id") % 50).alias("x"),
        F.floor(F.col("id") / 50).alias("y"),
    )
    sn.write_snapshot(df.repartition(4), tdir, partition_by=("p",))
    v = sn.optimize_snapshot(spark, tdir, target_mb=0.01, zorder_by=("x", "y"))
    man = sn.snapshot_info(spark, tdir, v)
    assert man["partition_spec"] == ["p"]
    for rel in man["files"]:
        st = man["stats"][rel]["p"]
        assert st[0] == st[1]  # partition split survived the zorder
        assert "x" in man["stats"][rel] and "y" in man["stats"][rel]
    assert sn.read_snapshot(spark, tdir).count() == 2000
    # pruning works on the partition AND the clustered columns
    got = sn.read_snapshot(spark, tdir, prune={"p": (2, 2), "x": (0, 9)})
    assert len(got.inputFiles()) < len(man["files"])
    assert got.filter("p = 2 and x <= 9").count() == 100


def test_cow_delete_recomputes_derived_transform_stats(spark, tdir):
    """r6 regression (found by the composition model test): delete_where's
    rewrite-stats aggregate used F.col on the tracked stats labels, which
    crashes on a derived transform label like bucket(2, i) — it must
    compute the transform exactly as the append path does, and the
    recomputed stats must keep point pruning correct."""
    df = spark.range(0, 200).select(
        F.col("id").alias("i"), F.concat(F.lit("v"), F.col("id")).alias("v")
    )
    sn.write_snapshot(df.repartition(2), tdir, partition_by=("bucket(4, i)",))
    res = sn.delete_where(spark, tdir, "i % 10 = 3")  # rewrites hit files
    assert res["rows_deleted"] == 20
    man = sn.snapshot_info(spark, tdir, res["version"])
    # every file (carried or rewritten) still has bucket-label stats
    for rel in man["files"]:
        st = man["stats"][rel]["bucket(4, i)"]
        assert st[0] is not None and st[1] is not None
    # point lookup on i still prunes via the transform and reads complete
    got = sn.read_snapshot(spark, tdir, point={"i": 7})
    assert got.filter("i = 7").count() == 1
    assert sn.read_snapshot(spark, tdir).count() == 180
