"""[EXT] Skew mitigation helpers (SURVEY.md §4 / north-star scale posture).

AQE's skew-join splitting handles most cases at runtime
(``spark.sql.adaptive.skewJoin.enabled`` is on in session.py); these
helpers cover the two patterns AQE can't fix:

- **salted two-phase aggregation**: a hot grouping key funnels its rows
  into one reducer. Salting splits each key into ``salt_n`` sub-keys
  (partial agg) and re-aggregates the partials (final agg) — the hot key's
  work spreads over ``salt_n`` reducers, and the second shuffle moves only
  one row per (key, salt).
- **salted broadcast-free join**: a hot join key on the fact side is
  salted; the dimension side is replicated ``salt_n``× so every salted
  fact row still finds its match. Replication cost = |dim| × salt_n rows —
  only sane when dim ≪ fact, which is exactly the skew scenario.

Salts are deterministic (xxhash64 of row identity, not rand()) so reruns
and retried tasks produce identical partitioning.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(cols: Sequence[str], salt_n: int) -> Column:
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(salt_n))


def salted_count_sum(
    df: DataFrame,
    group_keys: Sequence[str],
    sum_cols: Sequence[str],
    salt_cols: Sequence[str],
    salt_n: int = 16,
) -> DataFrame:
    """Two-phase count+sum with salted partials. ``salt_cols`` must be
    high-cardinality row-identity columns (used only to derive a uniform
    deterministic salt). Output: group_keys, ``count`` and ``sum_<c>``."""
    salted = df.withColumn("__salt", _salt(salt_cols, salt_n))
    partial = salted.groupBy(*group_keys, "__salt").agg(
        F.count("*").alias("__cnt"),
        *[F.sum(c).alias(f"__sum_{c}") for c in sum_cols],
    )
    return partial.groupBy(*group_keys).agg(
        F.sum("__cnt").alias("count"),
        *[F.sum(f"__sum_{c}").alias(f"sum_{c}") for c in sum_cols],
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt_cols: Sequence[str],
    salt_n: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: fact rows get a deterministic salt; the
    dim side is exploded ``salt_n``× so (key, salt) matches line up. The
    shuffle key becomes (key, salt) — hot keys spread across salt_n
    reducers."""
    f = fact.withColumn("__salt", _salt(salt_cols, salt_n))
    d = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_n - 1)))
    ).withColumn("__salt", F.col("__salt").cast("long"))
    joined = f.join(
        d,
        (F.col(fact_key) == F.col(dim_key)) & (f["__salt"] == d["__salt"]),
        how,
    )
    return joined.drop("__salt")
