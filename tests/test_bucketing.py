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
