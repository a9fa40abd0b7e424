"""Sampling & statistics operators (SURVEY.md §2.9 ST1-ST3, §2.4 A8).

All sampling ops are seed-pinned (42, like every seed in the reference —
code/01_DataPreprocessing.scala:192, code/04_MachineLearning.scala:79) but
RNG streams are implementation-specific, so these are rows-only checks,
never oracle-hashed (SURVEY.md §5.3).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: Mapping[str, float],
    seed: int = 42,
) -> DataFrame:
    """ST1 (reference 01:190-193): ``stat.sampleBy`` per-stratum fractions.
    Per-row Bernoulli draw — no shuffle, scales linearly."""
    return df.sampleBy(strata_col, dict(fractions), seed)


def train_test_split(
    df: DataFrame, weights: Sequence[float] = (0.7, 0.3), seed: int = 42
) -> list[DataFrame]:
    """ST2 (reference 04:79): ``randomSplit`` with pinned seed."""
    return df.randomSplit(list(weights), seed)


def quantile_cutoffs(
    df: DataFrame,
    col: str,
    probabilities: Sequence[float] = (0.33, 0.67),
    relative_error: float = 0.0,
) -> list[float]:
    """ST3 (reference 02:111-133 collects+sorts on the driver): distributed
    quantiles via approxQuantile — exact at relative_error=0, single-pass
    Greenwald-Khanna sketch at e.g. 0.001 for the 100 TB path."""
    return df.approxQuantile(col, list(probabilities), relative_error)


def percentiles_exact(
    df: DataFrame, col: str, probabilities: Sequence[float] = (0.25, 0.5, 0.75)
) -> DataFrame:
    """Exact interpolated percentiles as a 1-row DataFrame (== DuckDB
    ``quantile_cont``, so this one IS oracle-checkable)."""
    aggs = [
        F.round(F.percentile(col, F.lit(p)), 2).alias(f"p{int(p * 100)}")
        for p in probabilities
    ]
    return df.agg(*aggs)


def summary_stats(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """A8 (reference 01:144-146): ``df.summary`` distribution snapshot.
    Output is stringly-typed by Spark's API — rows-only check."""
    return df.select(*cols).summary(
        "count", "min", "25%", "50%", "75%", "max", "mean"
    )


def percentile_accuracy_report(
    df: DataFrame,
    col: str = "l_extendedprice",
    group_col: str = "l_returnflag",
    probabilities: Sequence[float] = (0.5, 0.9, 0.99),
    accuracy: int = 1000,
) -> DataFrame:
    """[EXT] Per-group approx_percentile (Greenwald-Khanna, the 100 TB
    path) against the exact interpolated percentile, with the error in
    basis points of the exact value — the measured-accuracy report that
    makes the sketch operable (the ANN-recall / HLL-error rationale: an
    estimator without a measured error is not a dial). Rows-only: the GK
    sketch result is implementation-specific. One pass computes both
    forms; at 100 TB you run only the sketch and trust THIS report's
    measured bound for the accuracy setting.

    Shape: ONE scan + ONE grouped aggregate; the per-probability rows come
    from posexplode over the zipped result arrays, not a per-probability
    union (VERDICT r3 #8: the union re-ran the final aggregate per branch —
    exchange reuse only covered the partial side)."""
    from pyspark.sql import functions as F

    probs = list(probabilities)
    agg = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.percentile_approx(col, probs, accuracy).alias("approx"),
        F.percentile(col, F.lit(probs)).alias("exact"),
    )
    probs_lit = F.array(*[F.lit(float(p)) for p in probs])
    ap = F.col("z.approx")
    ex = F.col("z.exact")
    return (
        agg.select("grp", F.posexplode(F.arrays_zip("approx", "exact")).alias("i", "z"))
        .select(
            "grp",
            F.element_at(probs_lit, F.col("i") + 1).alias("p"),
            F.round(ap, 2).alias("approx_value"),
            F.round(ex, 2).alias("exact_value"),
            F.round(10000.0 * F.abs(ap - ex) / F.abs(ex)).cast("long").alias("err_bp"),
        )
        .orderBy("grp", "p")
    )


def deterministic_k_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    k: int,
) -> DataFrame:
    """[EXT] Exactly-k-per-group sampling with a DETERMINISTIC pseudo-random
    order: rows rank by md5(group||id) — uniform-ish, stable across runs,
    engines and cluster sizes, so unlike ``sampleBy``/``rand()`` this
    sampler is oracle hash-checkable AND reproducible at 100 TB (RNG
    samplers give different subsets per partitioning; SURVEY.md §5.3).
    The balanced-eval-subset builder: k docs per source, k customers per
    nation, ...

    One shuffle on the group key for the ranking window; per-group state
    is the k-row heap Spark's WindowGroupLimit maintains once the
    rank-filter is pushed (plan-asserted in tests)."""
    from pyspark.sql import Window

    order = F.md5(F.concat_ws("|", F.col(group_col).cast("string"), F.col(id_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(order, F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
) -> DataFrame:
    """[EXT] Weighted sampling without replacement, deterministic:
    Efraimidis-Spirakis A-Res (public algorithm) with the uniform draw
    derived from md5 instead of an RNG — rank key = u^(1/w), keep the
    top k.  Like deterministic_k_per_group, the md5-derived u makes the
    sample reproducible across runs, engines, partitionings and cluster
    sizes, and therefore oracle hash-checkable.

    u = int(first 13 md5 hex digits) / 16^13 — 52 bits, exactly
    representable; Spark spells it conv(...,16,10), DuckDB
    CAST('0x'||substr AS UBIGINT).  Selection is
    ``orderBy(key desc).limit(k)`` = TakeOrderedAndProject: per-partition
    k-row heaps, no global sort."""
    u = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 13), 16, 10)
        .cast("double")
        / F.lit(float(16**13))
    )
    key = F.pow(u, F.lit(1.0) / F.col(weight_col).cast("double"))
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("__sk", key)
        .orderBy(F.desc("__sk"), id_col)
        .limit(k)
        .drop("__sk")
    )
