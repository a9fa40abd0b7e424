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

from pyspark.sql import DataFrame
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
