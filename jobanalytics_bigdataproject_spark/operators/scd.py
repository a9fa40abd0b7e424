"""[EXT] Slowly-changing-dimension (SCD Type 2) operators: build validity
intervals from a change log, and merge new changes into an existing
dimension incrementally — the lakehouse upsert primitive (Delta/Iceberg
MERGE's most common use) expressed as pure DataFrame ops.

Scale: interval derivation is two per-key windows (lag to collapse no-op
changes, lead to close intervals) — state per task is the largest single
key's history, never N. The incremental merge re-derives ONLY the keys
present in the update batch (semi/anti join split): untouched keys — the
overwhelming majority of a 100 TB dimension under a daily trickle —
pass through without reprocessing or reshuffling beyond the anti-join
probe, and the update side is typically broadcastable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TS_FMT = "yyyy-MM-dd HH:mm:ss"


def scd2_from_log(
    log: DataFrame,
    key: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak: str = "event_id",
) -> DataFrame:
    """Collapse a (key, state, ts) change log into SCD2 validity intervals:
    consecutive duplicate states merge into one interval; ``valid_to`` is
    the next state's start (NULL ⇒ current row). Timestamps are emitted
    formatted (SURVEY.md §5.3 cross-engine caution)."""
    w = Window.partitionBy(key).orderBy(ts_col, tiebreak)
    collapsed = (
        log.select(key, state_col, ts_col, tiebreak)
        .withColumn("__prev", F.lag(state_col).over(w))
        .filter(F.col("__prev").isNull() | (F.col("__prev") != F.col(state_col)))
    )
    w2 = Window.partitionBy(key).orderBy(ts_col, tiebreak)
    nxt = F.lead(ts_col).over(w2)
    return collapsed.select(
        F.col(key),
        F.col(state_col).alias("state"),
        F.date_format(ts_col, _TS_FMT).alias("valid_from"),
        F.date_format(nxt, _TS_FMT).alias("valid_to"),
        nxt.isNull().alias("is_current"),
        # raw ts retained so scd2_apply can re-derive without parsing strings
        F.col(ts_col).alias("__ts"),
        F.col(tiebreak).alias("__tb"),
    )


def scd2_dim(log: DataFrame, **kw) -> DataFrame:
    """Presentation form of ``scd2_from_log`` (internal re-derivation
    columns dropped) — the oracle-checked query surface."""
    kcol = kw.get("key", "user_id")
    return scd2_from_log(log, **kw).select(
        kcol, "state", "valid_from", "valid_to", "is_current"
    )


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    key: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak: str = "event_id",
) -> DataFrame:
    """Merge a batch of new change rows into an existing SCD2 dimension
    (the output of ``scd2_from_log``). Only keys appearing in *updates*
    are re-derived — their stored intervals are folded back into log form
    (each interval's start IS its log event) and unioned with the new
    rows; every other key passes through untouched via anti-join.
    Late/out-of-order updates are handled for free: re-derivation sorts
    the merged history, rewriting downstream intervals of that key."""
    affected = updates.select(key).distinct()
    untouched = current.join(F.broadcast(affected), key, "left_anti")
    replay = (
        current.join(F.broadcast(affected), key, "left_semi")
        .select(key, F.col("state").alias(state_col), F.col("__ts").alias(ts_col), F.col("__tb").alias(tiebreak))
        .unionByName(updates.select(key, state_col, ts_col, tiebreak))
    )
    rebuilt = scd2_from_log(replay, key=key, state_col=state_col, ts_col=ts_col, tiebreak=tiebreak)
    return untouched.unionByName(rebuilt)
