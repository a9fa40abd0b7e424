"""[EXT] Join operators Spark lacks as primitives, expressed as scalable
compositions (north-star "custom operators" surface; the reference's only
join is J1 — SURVEY.md §2.3):

- **as-of join**: for each left row, the most recent right row with
  ``right_time <= left_time`` per key. Implemented with the canonical
  distributed merge: tag both sides, union, and take ``last(payload,
  ignorenulls)`` over a (key, time)-ordered running window. ONE shuffle on
  the key, sorted within partitions — no per-row lookups, no broadcast of
  the big side; this is how as-of scales to 100 TB (both sides
  co-partitioned by key).
- **range join (band join)**: value-in-interval join against a small bands
  dimension via broadcast nested-loop — the bands side is tiny by
  construction, so the fact side streams through untouched.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    payload_cols: Sequence[str],
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join (inclusive: right_time <= left_time).

    Tie semantics: among right rows sharing the latest time, the one
    sorting last by payload values wins (deterministic given ordered
    payloads). Right rows sort *before* left rows at equal time, giving
    the inclusive <= bound."""
    l2 = (
        left.withColumn("__k", F.col(left_key))
        .withColumn("__t", F.col(left_time))
        .withColumn("__tag", F.lit(1))
    )
    r2 = right.select(
        F.col(right_key).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__tag"),
        *[F.col(p).alias(f"__p_{p}") for p in payload_cols],
    )
    u = l2.unionByName(r2, allowMissingColumns=True)
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__tag", *[f"__p_{p}" for p in payload_cols])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.select(
        "*",
        *[
            F.last(f"__p_{p}", ignorenulls=True).over(w).alias(f"{prefix}{p}")
            for p in payload_cols
        ],
    )
    return filled.filter(F.col("__tag") == 1).select(
        *left.columns, *[f"{prefix}{p}" for p in payload_cols]
    )


def range_join_bands(
    df: DataFrame,
    value_col: str,
    bands: Sequence[tuple[str, float, float]],
    how: str = "inner",
) -> DataFrame:
    """Band join: rows matched to (label, lo, hi) intervals with
    ``lo <= value < hi``. The bands dimension is broadcast (tiny), so the
    non-equi predicate runs as a broadcast nested-loop with the fact side
    streaming — the only sane physical plan for interval joins at scale
    short of bucketizing."""
    spark = df.sparkSession
    bands_df = spark.createDataFrame(
        [(label, float(lo), float(hi)) for label, lo, hi in bands],
        ["band", "band_lo", "band_hi"],
    )
    v = F.col(value_col)
    return df.join(
        F.broadcast(bands_df),
        (v >= F.col("band_lo")) & (v < F.col("band_hi")),
        how,
    )
