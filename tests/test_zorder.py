"""Z-order clustered writer: the Morton-key layout must give every output
file a compact rectangle in BOTH clustered dimensions (that's the whole
point vs a single-column sort), verified from the files themselves."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from jobanalytics_bigdataproject_spark.sources.writers import (
    write_zorder_parquet,
    zorder_key,
)


def test_zorder_key_interleaves_bits(spark):
    df = spark.createDataFrame([(3, 5)], ["x", "y"])
    # x=0b011 (even positions), y=0b101 (odd positions)
    # z = y2 x2 y1 x1 y0 x0 = 1 0 0 1 1 1 = 0b100111 = 39
    z = df.select(zorder_key(F.col("x"), F.col("y"), bits=3).alias("z")).first().z
    assert z == 0b100111


def _mean_file_spread(spark, path, col):
    per_file = (
        spark.read.parquet(path)
        .withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg((F.max(col) - F.min(col)).alias("spread"))
    )
    rows = per_file.collect()
    return sum(r.spread for r in rows) / len(rows), len(rows)


def test_zorder_write_narrows_both_dims(spark, tables, tmp_path):
    events = tables["events"].select("event_id", "user_id", "value")
    plain, zpath = str(tmp_path / "plain"), str(tmp_path / "zord")
    # same file count both sides so spreads are comparable
    events.repartition(16).write.mode("overwrite").parquet(plain)
    write_zorder_parquet(events, zpath, ("user_id", "value"), num_partitions=16)

    assert (
        spark.read.parquet(zpath).count() == events.count()
    )  # clustering must not drop/dup rows

    u_plain, n_p = _mean_file_spread(spark, plain, "user_id")
    u_z, n_z = _mean_file_spread(spark, zpath, "user_id")
    v_plain, _ = _mean_file_spread(spark, plain, "value")
    v_z, _ = _mean_file_spread(spark, zpath, "value")
    assert n_p == n_z == 16
    # 16 z-cells ≈ 4×4 grid: each file should cover ~1/4 of each dimension;
    # round-robin files cover ~the full range. Allow generous slack.
    assert u_z < 0.6 * u_plain
    assert v_z < 0.6 * v_plain


def test_zorder_key_n_three_way_interleave(spark):
    from jobanalytics_bigdataproject_spark.sources.writers import zorder_key_n

    df = spark.createDataFrame([(3, 5, 1)], ["x", "y", "w"])
    # bit i of column j lands at position i*3 + j:
    # x=0b011 -> bits at 0, 3;  y=0b101 -> bits at 1, 7;  w=0b001 -> bit 2
    expect = (1 << 0) | (1 << 3) | (1 << 1) | (1 << 7) | (1 << 2)
    z = (
        df.select(
            zorder_key_n(
                (F.col("x"), F.col("y"), F.col("w")), bits=3
            ).alias("z")
        )
        .first()
        .z
    )
    assert z == expect


def test_zorder_key_n_refuses_long_overflow(spark):
    from jobanalytics_bigdataproject_spark.sources.writers import zorder_key_n

    with pytest.raises(ValueError, match="> 63"):
        zorder_key_n([F.col("a")] * 4, bits=16)


def test_zorder_key_two_col_layout_unchanged(spark):
    # zorder_key (k=2) must keep its historic bit layout: the oracle twin
    # of events_zorder_key replays exactly this interleave in SQL
    df = spark.createDataFrame([(3, 5)], ["x", "y"])
    z = df.select(zorder_key(F.col("x"), F.col("y"), bits=3).alias("z")).first().z
    assert z == 0b100111


def test_zorder_write_three_dims_narrows_all(spark, tables, tmp_path):
    events = tables["events"].select("event_id", "user_id", "value", "ts")
    events = events.withColumn("t", F.col("ts").cast("double"))
    plain, zpath = str(tmp_path / "plain3"), str(tmp_path / "zord3")
    events.repartition(27).write.mode("overwrite").parquet(plain)
    write_zorder_parquet(events, zpath, ("user_id", "value", "t"), num_partitions=27)
    assert spark.read.parquet(zpath).count() == events.count()
    # 27 z-cells ≈ 3x3x3 grid: each dimension's per-file spread should
    # shrink vs round-robin files covering the full range
    for col in ("user_id", "value", "t"):
        s_plain, n_p = _mean_file_spread(spark, plain, col)
        s_z, n_z = _mean_file_spread(spark, zpath, col)
        assert n_p == n_z == 27
        assert s_z < 0.75 * s_plain, f"{col}: {s_z} !< 0.75*{s_plain}"
