"""Phase-1 ETL pipeline composition (reference code/01_DataPreprocessing.scala
end-to-end): the reference's script flow — dedup → null policy → sanity
filters → standardization → timestamp derivation → feature engineering →
grouped report → stratified sample → parquet materialization — as one
composable function chain over the star schema.

Differences from the reference, by design (SURVEY.md §4.1):
- no write-then-reread materialization barrier mid-chain (01:249-251):
  ``materialize=True`` gives an explicit optional checkpoint instead;
- audit counts are opt-in (``stats=True``) over one cached frame, not 18
  recomputing ``count()`` actions (§2.4 A9);
- the state-extraction duplication (01:152-158 vs 268-295) is resolved to
  a single canonical standardizer (map_lookup).

Each stage is ``DataFrame -> DataFrame``; the composition is linear scans
+ one dedup shuffle until the report aggregates.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jobanalytics_bigdataproject_spark.functions.derive import (
    decompose_timestamp,
    map_lookup,
    with_log_features,
)
from jobanalytics_bigdataproject_spark.operators import analytics, cleaning, sampling
from jobanalytics_bigdataproject_spark.sources.readers import load_star
from jobanalytics_bigdataproject_spark.sources.writers import write_parquet

PRIORITY_STD = {
    "1-URGENT": "URGENT",
    "2-HIGH": "HIGH",
    "3-MEDIUM": "MEDIUM",
    "4-NOT SPECIFIED": "UNSPECIFIED",
    "5-LOW": "LOW",
}


def clean_orders(orders: DataFrame) -> DataFrame:
    """Cleaning chain mirroring reference 01:31-66: dedup by key, drop rows
    with null keys, sanity-range filter, standardize the priority code,
    decompose the order date, add a log feature."""
    df = cleaning.dedup_by_key_deterministic(
        orders, ["o_orderkey"], ["o_custkey", "o_totalprice"]
    )
    df = cleaning.drop_null_rows(df, ["o_orderkey", "o_custkey"])
    df = df.filter(cleaning.null_or_in_range("o_totalprice", 0, 5_000_000))
    df = df.withColumn(
        "priority_std", map_lookup("o_orderpriority", PRIORITY_STD, F.lit("OTHER"))
    )
    df = decompose_timestamp(df, "o_orderdate", prefix="order_")
    df = with_log_features(df, ["o_totalprice"])
    return df


def clean_orders_observed(orders: DataFrame):
    """``clean_orders`` with free audit counts: a named ``Observation`` is
    attached after each mutating stage, so ONE action (the final write or
    count) yields every stage's row count as a job-listener metric —
    replacing the reference's 18 recomputing ``count()`` actions
    (code/01_DataPreprocessing.scala, SURVEY.md §2.4 A9) with zero extra
    passes.  At 100 TB this is the difference between 1 scan and 18.

    Returns ``(df, observations)``; read ``observations[name].get`` AFTER
    an action has materialized the frame."""
    from pyspark.sql import Observation

    obs: dict[str, Observation] = {}

    def tap(df: DataFrame, name: str) -> DataFrame:
        obs[name] = Observation(name)
        return df.observe(obs[name], F.count(F.lit(1)).alias("rows"))

    df = cleaning.dedup_by_key_deterministic(
        orders, ["o_orderkey"], ["o_custkey", "o_totalprice"]
    )
    df = tap(df, "after_dedup")
    df = cleaning.drop_null_rows(df, ["o_orderkey", "o_custkey"])
    df = tap(df, "after_nulldrop")
    df = df.filter(cleaning.null_or_in_range("o_totalprice", 0, 5_000_000))
    df = tap(df, "after_valid")
    df = df.withColumn(
        "priority_std", map_lookup("o_orderpriority", PRIORITY_STD, F.lit("OTHER"))
    )
    df = decompose_timestamp(df, "o_orderdate", prefix="order_")
    df = with_log_features(df, ["o_totalprice"])
    return df, obs


def run_phase1(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str | None = None,
    stats: bool = False,
) -> dict[str, DataFrame]:
    """The whole Phase-1 flow. Returns the cleaned frame, the grouped
    report (reference 01:160-179 shape) and the stratified sample
    (01:190-193). ``out_dir`` materializes each output as parquet
    (partitioned by order month — the [EXT] partition-pruning path the
    reference lacks, SURVEY.md §4.2)."""
    t = load_star(spark, sf_dir, ("orders", "customer", "nation"))
    if stats:
        # observe() audit mode: per-stage counts ride along with the one
        # materializing action — no recomputation, no extra scans
        cleaned, observations = clean_orders_observed(t["orders"])
        cleaned = cleaned.cache()
        _ = cleaned.count()
    else:
        cleaned = clean_orders(t["orders"])
        observations = {}
    report = analytics.agg_join_report(cleaned, t["customer"], t["nation"])
    sample = sampling.stratified_sample(
        cleaned, "o_orderstatus", {"O": 0.2, "F": 0.2, "P": 0.2}
    )
    out = {"cleaned": cleaned, "report": report, "sample": sample}
    if stats:
        out["audit_counts"] = {k: o.get["rows"] for k, o in observations.items()}
    if out_dir:
        write_parquet(
            cleaned, os.path.join(out_dir, "orders_cleaned"), partition_by=["order_month"]
        )
        write_parquet(report, os.path.join(out_dir, "nation_report"))
        write_parquet(sample, os.path.join(out_dir, "orders_sample"))
    return out
