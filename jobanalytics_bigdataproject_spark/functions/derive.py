"""Column-derivation helpers (SURVEY.md §2.8, §2.10 T2).

Re-expresses every scalar-function pattern the reference uses as reusable
``Column``-level helpers. All pure built-ins — these stay inside
whole-stage codegen; zero Python UDFs (reference registers none either,
SURVEY.md §2.12).

Reference citations:
- upper/trim + lower/trim standardization: code/01_DataPreprocessing.scala:64-65,229-233
- epoch-ms → timestamp: code/01_DataPreprocessing.scala:52-63
- date decomposition (to_date/month/dayofweek/hour): code/01_DataPreprocessing.scala:255-258
- split + element_at key extraction: code/01_DataPreprocessing.scala:152-158,268-274
- 19-branch when-chain value mapping: code/01_DataPreprocessing.scala:275-295
- log1p features: code/01_DataPreprocessing.scala:247-248,304-306
- percentile tier bucketing: code/02_RDDOperations.scala:111-156
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def std_upper(c: Column | str) -> Column:
    """``upper(trim(x))`` standardization (reference 01:64-65,233)."""
    return F.upper(F.trim(F.col(c) if isinstance(c, str) else c))


def std_lower(c: Column | str) -> Column:
    """``lower(trim(x))`` standardization (reference 01:230-231)."""
    return F.lower(F.trim(F.col(c) if isinstance(c, str) else c))


def epoch_ms_to_ts(c: Column | str) -> Column:
    """Epoch-milliseconds → TimestampType (reference 01:52-63).

    ``timestamp_millis`` is the exact integer-safe form of the reference's
    ``to_timestamp(from_unixtime(x/1000))`` (which truncates sub-second)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.timestamp_millis(col.cast("long"))


def decompose_timestamp(df: DataFrame, ts_col: str, prefix: str = "") -> DataFrame:
    """Append date/month/dayofweek/hour columns (reference 01:255-258).

    Spark ``dayofweek`` is 1=Sunday..7=Saturday; the DuckDB oracle must use
    ``dayofweek(ts)+1`` (its convention is 0=Sunday) — SURVEY.md §5.3."""
    ts = F.col(ts_col)
    return (
        df.withColumn(f"{prefix}date", F.to_date(ts))
        .withColumn(f"{prefix}month", F.month(ts))
        .withColumn(f"{prefix}dow", F.dayofweek(ts))
        .withColumn(f"{prefix}hour", F.hour(ts))
    )


def parse_key_token(c: Column | str, sep: str, index: int) -> Column:
    """``element_at(split(x, sep), index)`` with negative-index support
    (reference 01:152-158,268-274). Returns NULL on NULL input — the
    null-guarded 01:268-274 semantics, chosen as canonical over the
    unguarded 01:152-158 variant (SURVEY.md §3.1 item 4)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.element_at(F.split(F.trim(col), sep), index)


def map_lookup(
    c: Column | str,
    mapping: Mapping[str, str],
    default: Column | str | None = None,
) -> Column:
    """Literal-map lookup generalizing the reference's 19-branch when-chain
    (reference 01:275-295).

    Implemented as ``element_at(map(...), key)`` — a single codegen'd
    expression rather than N nested CaseWhen branches; Catalyst constant-folds
    the literal map once per plan, and (unlike a join against a tiny dim
    table) it ships inside the task binary, so at 100 TB it costs zero
    shuffle and zero broadcast."""
    col = F.col(c) if isinstance(c, str) else c
    pairs: list[Column] = []
    for k, v in mapping.items():
        pairs.append(F.lit(k))
        pairs.append(F.lit(v))
    looked = F.element_at(F.create_map(*pairs), col)
    if default is not None:
        default_col = F.col(default) if isinstance(default, str) else default
        looked = F.coalesce(looked, default_col)
    return looked


def with_log_features(df: DataFrame, cols: Sequence[str], prefix: str = "log_") -> DataFrame:
    """``log1p(coalesce(x, 0))`` feature columns (reference 01:247-248)."""
    for c in cols:
        df = df.withColumn(f"{prefix}{c}", F.log1p(F.coalesce(F.col(c), F.lit(0.0))))
    return df


def bucketize(
    df: DataFrame,
    value_col: str,
    out_col: str = "tier",
    probabilities: Sequence[float] = (0.33, 0.67),
    labels: Sequence[str] = ("LOW", "MID", "HIGH"),
    relative_error: float = 0.0,
) -> DataFrame:
    """Percentile tier bucketing, distributed (SURVEY.md §2.10 T2).

    The reference computes p33/p67 by ``collect().sorted`` on the driver
    (code/02_RDDOperations.scala:111-133) — a driver-memory cliff at scale.
    Here the cutoffs come from ``approxQuantile`` (exact when
    ``relative_error=0``; at 100 TB pass e.g. 0.001 for a single-pass
    Greenwald-Khanna sketch instead), then the labels are a codegen'd
    when-chain (reference 02:144-156)."""
    if len(labels) != len(probabilities) + 1:
        raise ValueError("need len(labels) == len(probabilities) + 1")
    cuts = df.approxQuantile(value_col, list(probabilities), relative_error)
    v = F.col(value_col)
    expr = F.when(v <= F.lit(cuts[0]), F.lit(labels[0]))
    for i in range(1, len(cuts)):
        expr = expr.when(v <= F.lit(cuts[i]), F.lit(labels[i]))
    expr = expr.otherwise(F.lit(labels[-1]))
    return df.withColumn(out_col, expr)
