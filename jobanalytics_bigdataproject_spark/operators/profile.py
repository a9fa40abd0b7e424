"""[EXT] Data profiling (deequ-style): per-column completeness,
cardinality and bounds in ONE pass over the table — the pre-ingest audit
step a training-data pipeline runs before trusting a new source drop.
(The reference's nearest analog is its 18 ad-hoc ``count()`` checkpoints,
code/01_DataPreprocessing.scala:249-296, each a separate job; here the
whole profile is a single aggregation.)

Scale: one scan, one aggregation row. Exact ``countDistinct`` over
multiple columns compiles to Catalyst's Expand (rows × profiled-columns
before the partial agg) — linear with a small constant, exact, and
oracle-checkable. At 100 TB profile wide tables with
``approx=True`` (HLL++ approx_count_distinct, one pass, no Expand) —
same output schema, sketch-grade cardinalities (rows-only per
SURVEY.md §5.3).

Numeric bounds are emitted as DECIMAL(18,2)-cast strings: double→string
formatting diverges between engines (scientific-notation thresholds),
decimal→string does not.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    columns: Sequence[str],
    approx: bool = False,
) -> DataFrame:
    """One row per profiled column: row count, null count/fraction (basis
    points), distinct count, min/max (stringified, numerics via
    decimal(18,2) for cross-engine stability)."""
    cols = [str(c) for c in columns]
    dtypes = dict(df.dtypes)
    aggs: list = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__nn_{c}"))
        aggs.append(
            (
                F.approx_count_distinct(c) if approx else F.countDistinct(c)
            ).alias(f"__nd_{c}")
        )
        if dtypes.get(c) in ("double", "float", "bigint", "int", "smallint", "tinyint"):
            lo = F.min(c).cast("decimal(18,2)").cast("string")
            hi = F.max(c).cast("decimal(18,2)").cast("string")
        else:
            lo = F.min(c).cast("string")
            hi = F.max(c).cast("string")
        aggs.append(lo.alias(f"__lo_{c}"))
        aggs.append(hi.alias(f"__hi_{c}"))
    one = df.agg(*aggs)
    per_col = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("column_name"),
                    F.col(f"__nn_{c}").alias("n_nulls"),
                    F.col(f"__nd_{c}").alias("n_distinct"),
                    F.col(f"__lo_{c}").alias("min_value"),
                    F.col(f"__hi_{c}").alias("max_value"),
                )
                for c in cols
            ]
        )
    )
    return one.select("n_rows", per_col.alias("p")).select(
        F.col("p.column_name").alias("column_name"),
        "n_rows",
        F.col("p.n_nulls").alias("n_nulls"),
        F.expr("p.n_nulls * 10000 div n_rows").alias("null_bp"),
        F.col("p.n_distinct").alias("n_distinct"),
        F.col("p.min_value").alias("min_value"),
        F.col("p.max_value").alias("max_value"),
    )


def expect(df: DataFrame, rules: "dict[str, Column]") -> DataFrame:
    """[EXT] Data-quality expectations in ONE pass (great-expectations
    shape, deequ-style execution): ``rules`` maps rule name -> boolean
    expectation column; the report counts violations per rule from a
    single aggregate of CASE sums — one scan however many rules, the same
    economics as the profiler above.

    Output: (rule, violations, total, pass_bp) with pass_bp on the
    scaled-integer rounding rule so both engines agree exactly.

    NULL semantics (3-valued logic, same as SQL CHECK constraints): a rule
    evaluating to NULL counts as NOT violated — nullness needs its own
    ``isNotNull`` rule. Pinned by tests/test_properties.py."""
    from jobanalytics_bigdataproject_spark.functions.exact import exact_div

    names = list(rules)
    agg = df.agg(
        F.count("*").alias("__total"),
        *[
            F.sum(F.when(~rules[n], 1).otherwise(0)).cast("long").alias(f"__v_{i}")
            for i, n in enumerate(names)
        ],
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(n).alias("rule"),
                F.col(f"__v_{i}").alias("violations"),
                F.col("__total").alias("total"),
            )
            for i, n in enumerate(names)
        ]
    )
    return (
        agg.select(F.explode(pairs).alias("p"))
        .select(
            "p.rule",
            "p.violations",
            "p.total",
            exact_div(
                F.lit(10000) * (F.col("p.total") - F.col("p.violations")),
                F.col("p.total"),
                0,
            ).alias("pass_bp"),
        )
        .orderBy("rule")
    )


def drift_report(
    base: DataFrame,
    current: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_buckets: int = 10,
) -> DataFrame:
    """[EXT] Distribution-drift report between two table versions (the
    check a training pipeline runs when a new source drop or upstream
    code change lands: did the value distribution move?): fixed-edge
    histogram of ``value_col`` on both frames, per-bucket population
    shares in integer basis points, and their signed delta. The caller
    derives headline numbers from the rows (total-variation distance =
    sum(abs(delta_bp))/2/10000); PSI needs ln() and is deliberately left
    float-free here so the report hash-matches across engines.

    Bucket law: NULL → -1, else clamp(floor((v - lo)/width), 0, n-1)
    with width = (hi - lo)/n_buckets — fixed edges shared by BOTH frames
    (quantile edges would re-fit to the drifted data and mask the
    drift). Empty buckets are emitted with zero counts so the report
    always has one row per bucket and a consumer can diff reports
    positionally.

    Scale: one scan + one n_buckets-row aggregate per side; the join and
    the share-of-total window run on ≤ n_buckets+1 rows (metadata
    scale). Shares use truncating integer division — exact, engine-
    independent.
    """
    width = (hi - lo) / n_buckets

    def hist(df: DataFrame, n_alias: str) -> DataFrame:
        v = F.col(value_col)
        bucket = F.when(v.isNull(), F.lit(-1)).otherwise(
            F.least(
                F.lit(n_buckets - 1),
                F.greatest(F.lit(0), F.floor((v - F.lit(lo)) / F.lit(width)).cast("int")),
            )
        )
        return df.select(bucket.alias("bucket")).groupBy("bucket").agg(
            F.count(F.lit(1)).alias(n_alias)
        )

    buckets = base.sparkSession.range(-1, n_buckets).select(
        F.col("id").cast("int").alias("bucket")
    )
    joined = (
        buckets.join(hist(base, "base_n"), "bucket", "left")
        .join(hist(current, "cur_n"), "bucket", "left")
        .na.fill(0, ["base_n", "cur_n"])
    )
    w = Window.partitionBy()  # ≤ n_buckets+1 rows: a single tiny partition
    shares = joined.select(
        "bucket",
        "base_n",
        "cur_n",
        F.expr("CAST(10000 * base_n AS BIGINT)").alias("__b"),
        F.expr("CAST(10000 * cur_n AS BIGINT)").alias("__c"),
        F.sum("base_n").over(w).alias("__bt"),
        F.sum("cur_n").over(w).alias("__ct"),
    ).select(
        "bucket",
        "base_n",
        "cur_n",
        F.expr("__b div nullif(__bt, 0)").alias("base_share_bp"),
        F.expr("__c div nullif(__ct, 0)").alias("cur_share_bp"),
        F.expr("(__c div nullif(__ct, 0)) - (__b div nullif(__bt, 0))").alias(
            "delta_bp"
        ),
    )
    # drop the NULL bucket row when neither side has NULLs (keeps the
    # common case at exactly n_buckets rows)
    return shares.filter(
        (F.col("bucket") >= 0) | (F.col("base_n") > 0) | (F.col("cur_n") > 0)
    ).orderBy("bucket")
