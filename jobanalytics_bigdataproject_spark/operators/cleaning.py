"""Cleaning operators (SURVEY.md §2.2 P5-P12): dedup, null policy,
constraint filters, standardization.

Mirrors the reference's Phase-1 ETL semantics:
- dedup by key:            code/01_DataPreprocessing.scala:31
- na.drop on key columns:  code/01_DataPreprocessing.scala:35
- na.fill constants:       code/01_DataPreprocessing.scala:39
- null-or-in-range guards: code/01_DataPreprocessing.scala:42-46
- BETWEEN range filter:    code/01_DataPreprocessing.scala:132-138
- coalesce imputation:     code/01_DataPreprocessing.scala:247-248

Every function is ``DataFrame -> DataFrame`` and pure-declarative, so
Catalyst fuses the whole chain into one scan stage with all predicates
pushed to the parquet reader.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dedup_by_key(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Reference P9: ``dropDuplicates(keys)`` (01:31). Keeps an arbitrary
    row per key — one shuffle on the key, map-side partial dedup first."""
    return df.dropDuplicates(list(keys))


def dedup_by_key_deterministic(
    df: DataFrame, keys: Sequence[str], order_by: Sequence[Column | str]
) -> DataFrame:
    """Deterministic variant: keep the first row per key under an explicit
    total order (row_number window). Use when results must be reproducible
    (e.g. oracle-checked queries) — same single shuffle as dropDuplicates."""
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(
        *[F.col(c) if isinstance(c, str) else c for c in order_by]
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def drop_null_rows(df: DataFrame, subset: Sequence[str]) -> DataFrame:
    """Reference P10: ``na.drop(subset)`` (01:35; 04:65-70)."""
    return df.na.drop(subset=list(subset))


def fill_nulls(df: DataFrame, values: Mapping[str, object]) -> DataFrame:
    """Reference P11: ``na.fill`` constants (01:39)."""
    return df.na.fill(dict(values))


def impute(df: DataFrame, col: str, default: object, out: str | None = None) -> DataFrame:
    """Reference P12: ``coalesce(col, lit(default))`` (01:247-248; 04:34-40)."""
    return df.withColumn(out or col, F.coalesce(F.col(col), F.lit(default)))


def null_or_in_range(c: Column | str, lo: float, hi: float) -> Column:
    """Reference P5 sanity predicate: NULL is acceptable, non-null must lie
    in (lo, hi] (01:42-46)."""
    col = F.col(c) if isinstance(c, str) else c
    return col.isNull() | ((col > F.lit(lo)) & (col <= F.lit(hi)))


def filter_range(df: DataFrame, col: str, lo: float, hi: float) -> DataFrame:
    """Reference P6: closed-interval BETWEEN filter (01:132-138; 04:17-23)."""
    return df.filter(F.col(col).between(lo, hi))


def filter_cross_column(df: DataFrame, lo_col: str, hi_col: str) -> DataFrame:
    """Reference P5 cross-column guard: ``min <= max`` when both present
    (01:46)."""
    lo, hi = F.col(lo_col), F.col(hi_col)
    return df.filter(lo.isNull() | hi.isNull() | (lo <= hi))


def mad_outlier_report(
    df: DataFrame,
    group_col: str = "l_returnflag",
    val_col: str = "l_extendedprice",
    k: int = 3,
) -> DataFrame:
    """[EXT] Robust per-group outlier report: flag values more than ``k``
    median-absolute-deviations from their group median — the
    mean/stddev-free outlier rule that a single corrupt magnitude can't
    drag (a z-score's mean and sigma both move with the outlier; the
    median and MAD don't).

    Exactness: values quantize to integer cents, so the group median sits
    on the half-cent grid, |c − median| on the half grid, and the MAD on
    the quarter grid — every quantity is an exactly-representable binary
    fraction and the ``dev > k·MAD`` comparison is bit-identical on any
    engine with NO rounding step or tolerance.

    Scale shape: two grouped exact-median aggregations (same per-group
    buffering bound as every exact percentile here — the sketch path is
    approxQuantile) with the tiny (group, median) frames broadcast back;
    the fact is scanned twice but never shuffled — both joins are
    broadcasts and the final rollup has map-side partials.
    """
    from jobanalytics_bigdataproject_spark.functions.exact import cents

    c = df.select(F.col(group_col).alias("g"), cents(val_col).alias("c"))
    med = c.groupBy("g").agg(F.median("c").alias("med"))
    dev = c.join(F.broadcast(med), "g").withColumn(
        "dev", F.abs(F.col("c") - F.col("med"))
    )
    mad = dev.groupBy("g").agg(F.median("dev").alias("mad"))
    return (
        dev.join(F.broadcast(mad), "g")
        .groupBy("g")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum((F.col("dev") > F.lit(k) * F.col("mad")).cast("long")).alias(
                "n_outliers"
            ),
            (F.first("med") / F.lit(100.0)).alias("median_value"),
            (F.first("mad") / F.lit(100.0)).alias("mad_value"),
        )
        .select(
            F.col("g").alias(group_col),
            "n_rows",
            "n_outliers",
            "median_value",
            "mad_value",
        )
        .orderBy(group_col)
    )
