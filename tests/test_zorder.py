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


# --------------------------------------------------------------------------
# Hilbert-curve clustering (round 7): the Skilling transform's defining
# properties are tested directly (bijection + unit-step adjacency — Morton
# FAILS adjacency at seams, which is the entire argument for Hilbert), then
# the clustered writer gets the same file-spread discipline as Z-order.
# --------------------------------------------------------------------------


def test_hilbert_index_bijection_and_adjacency():
    import numpy as np

    from jobanalytics_bigdataproject_spark.sources.writers import hilbert_index_np

    for k, b in ((2, 5), (3, 4)):
        side = 1 << b
        g = np.stack(
            np.meshgrid(*[np.arange(side)] * k, indexing="ij"), -1
        ).reshape(-1, k)
        z = hilbert_index_np(g, b)
        assert sorted(z.tolist()) == list(range(side**k))  # bijection
        pts = g[np.argsort(z)].astype(int)
        steps = np.abs(np.diff(pts, axis=0)).sum(axis=1)
        assert (steps == 1).all()  # every curve step moves ONE cell


def test_morton_has_seam_jumps_hilbert_does_not():
    """The measured justification for offering Hilbert at all: walk both
    curves over the same 2D grid and compare max jump between consecutive
    positions. Morton jumps across half the space at its seams; Hilbert
    never exceeds one cell."""
    import numpy as np

    from jobanalytics_bigdataproject_spark.sources.writers import hilbert_index_np

    b = 5
    side = 1 << b
    g = np.stack(np.meshgrid(np.arange(side), np.arange(side), indexing="ij"), -1).reshape(-1, 2)
    # Morton key, same bit budget
    mz = np.zeros(len(g), dtype=np.int64)
    for i in range(b):
        mz |= ((g[:, 0] >> i) & 1) << (2 * i)
        mz |= ((g[:, 1] >> i) & 1) << (2 * i + 1)
    m_steps = np.abs(np.diff(g[np.argsort(mz)].astype(int), axis=0)).sum(axis=1)
    h_steps = np.abs(
        np.diff(g[np.argsort(hilbert_index_np(g, b))].astype(int), axis=0)
    ).sum(axis=1)
    assert h_steps.max() == 1
    assert m_steps.max() > side / 2  # Morton's seam discontinuity is real


def test_hilbert_write_narrows_both_dims(spark, tables, tmp_path):
    from jobanalytics_bigdataproject_spark.sources.writers import (
        write_hilbert_parquet,
    )

    events = tables["events"].select("event_id", "user_id", "value")
    plain, hpath = str(tmp_path / "plain_h"), str(tmp_path / "hilb")
    events.repartition(16).write.mode("overwrite").parquet(plain)
    write_hilbert_parquet(events, hpath, ("user_id", "value"), num_partitions=16)
    assert spark.read.parquet(hpath).count() == events.count()
    u_plain, n_p = _mean_file_spread(spark, plain, "user_id")
    u_h, n_h = _mean_file_spread(spark, hpath, "user_id")
    v_plain, _ = _mean_file_spread(spark, plain, "value")
    v_h, _ = _mean_file_spread(spark, hpath, "value")
    assert n_p == n_h == 16
    assert u_h < 0.6 * u_plain
    assert v_h < 0.6 * v_plain


def test_optimize_snapshot_hilbert_by(spark, tables, tmp_path):
    from jobanalytics_bigdataproject_spark.sources import snapshots as sn

    t = str(tmp_path / "snap_h")
    events = tables["events"].select("event_id", "user_id", "value")
    sn.write_snapshot(events.repartition(8), t)
    v = sn.optimize_snapshot(spark, t, target_mb=0.003, hilbert_by=("user_id", "value"))
    assert v == 2
    back = sn.read_snapshot(spark, t)
    assert back.count() == events.count()
    # pruning on EITHER clustered column must skip files via the
    # recomputed manifest stats
    lo = sn.read_snapshot(spark, t, prune={"user_id": (0, 5)})
    assert lo.inputFiles() and len(lo.inputFiles()) < len(back.inputFiles())
    with pytest.raises(ValueError, match="at most one"):
        sn.optimize_snapshot(
            spark, t, zorder_by=("user_id",), hilbert_by=("value",)
        )
