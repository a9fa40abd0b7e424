"""[EXT] Hypertable-style continuous aggregate (north-star custom-operator
surface): a time-bucketed rollup table over ``events`` that can be
*incrementally* refreshed when late/new data arrives, touching only the
affected date partitions.

Pattern:
- the rollup stores associative partials (count + cents sum) per
  (bucket, key), partitioned by event_date;
- a refresh computes partials for the NEW rows only, unions them with the
  existing partials of the affected dates, re-aggregates, and rewrites
  just those partitions via dynamic partition overwrite
  (``spark.sql.sources.partitionOverwriteMode=dynamic``).

At 100 TB this is the difference between re-scanning the full history and
re-scanning one day: refresh cost is O(new data + affected partitions).
Derived metrics (avg = sum/count) are computed at read time from the
partials, never stored — so merges stay associative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def rollup_partials(
    events: DataFrame,
    bucket: str = "1 hour",
    key: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Associative partials per (event_date, window_start, key)."""
    w = F.window(F.col(ts_col), bucket)
    return (
        events.groupBy(w.alias("w"), key)
        .agg(
            F.count("*").alias("event_count"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd").alias("event_date"),
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            key,
            "event_count",
            "value_cents",
        )
    )


def write_rollup(partials: DataFrame, path: str) -> None:
    """Materialize (or dynamically overwrite affected partitions of) the
    rollup, partitioned by event_date for pruning + cheap refresh."""
    spark = partials.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    partials.write.mode("overwrite").partitionBy("event_date").parquet(path)


def refresh_rollup(
    spark: SparkSession,
    path: str,
    new_events: DataFrame,
    bucket: str = "1 hour",
    key: str = "event_type",
) -> None:
    """Incremental refresh: merge the new rows' partials into the stored
    rollup, rewriting ONLY the affected event_date partitions."""
    new_partials = rollup_partials(new_events, bucket, key)
    affected = [r.event_date for r in new_partials.select("event_date").distinct().collect()]
    if not affected:
        return
    existing = (
        spark.read.parquet(path).filter(F.col("event_date").isin(affected))
    )
    merged = (
        existing.unionByName(new_partials)
        .groupBy("event_date", "window_start", key)
        .agg(
            F.sum("event_count").alias("event_count"),
            F.sum("value_cents").alias("value_cents"),
        )
    )
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    merged.write.mode("overwrite").partitionBy("event_date").parquet(path)


def read_rollup(spark: SparkSession, path: str) -> DataFrame:
    """Read-time derived metrics from the stored partials."""
    r = spark.read.parquet(path)
    return r.select(
        "event_date",
        "window_start",
        *[c for c in r.columns if c not in ("event_date", "window_start", "event_count", "value_cents")],
        "event_count",
        (F.col("value_cents") / F.lit(100.0)).alias("total_value"),
        F.round(F.round(F.col("value_cents") / F.col("event_count")) / F.lit(100.0), 2).alias(
            "avg_value"
        ),
    )
