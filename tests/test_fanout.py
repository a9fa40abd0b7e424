"""fan_out_scan (round-10 optimization): scale-adaptive input fan-out.

A single-row-group parquet file plans as ONE scan task (parquet splits
only at row-group boundaries), serializing CPU-heavy explode/hash work;
``fan_out_scan`` repartitions such under-parallel inputs up to the
session's default parallelism and is an IDENTITY (no added Exchange)
whenever the scan already carries enough partitions — the 100 TB case.
"""

import pytest

from jobanalytics_bigdataproject_spark.sources.readers import fan_out_scan


@pytest.fixture(scope="module")
def spark():
    from jobanalytics_bigdataproject_spark.session import get_spark

    return get_spark("test-fanout")


def _one_partition_df(spark, tmp_path):
    path = str(tmp_path / "narrow.parquet")
    spark.range(0, 1000).coalesce(1).write.mode("overwrite").parquet(path)
    df = spark.read.parquet(path)
    assert df.rdd.getNumPartitions() == 1  # single row group → one task
    return df


def test_fans_under_parallel_scan_to_default_parallelism(spark, tmp_path):
    df = _one_partition_df(spark, tmp_path)
    fanned = fan_out_scan(df)
    assert (
        fanned.rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )


def test_values_unchanged(spark, tmp_path):
    df = _one_partition_df(spark, tmp_path)
    assert sorted(r.id for r in fan_out_scan(df).collect()) == list(range(1000))


def test_identity_when_already_parallel_enough(spark, tmp_path):
    df = _one_partition_df(spark, tmp_path)
    # target at/below the current partition count → the SAME frame back,
    # no Exchange inserted (the real-scale no-op contract)
    assert fan_out_scan(df, target=1) is df
    wide = df.repartition(8)
    assert fan_out_scan(wide, target=4) is wide


def test_explicit_target_respected(spark, tmp_path):
    df = _one_partition_df(spark, tmp_path)
    assert fan_out_scan(df, target=7).rdd.getNumPartitions() == 7
