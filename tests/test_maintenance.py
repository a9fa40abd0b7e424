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
