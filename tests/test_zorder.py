"""Z-order clustered writer: the Morton-key layout must give every output
file a compact rectangle in BOTH clustered dimensions (that's the whole
point vs a single-column sort), verified from the files themselves."""

from __future__ import annotations

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
