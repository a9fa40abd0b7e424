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
    collapse: bool = True,
) -> DataFrame:
    """Turn a (key, state, ts) change log into SCD2 validity intervals;
    ``valid_to`` is the next row's start (NULL ⇒ current). With
    ``collapse=True`` (presentation form) consecutive duplicate states
    merge into one interval. With ``collapse=False`` every log event
    keeps its own row — the MERGEABLE internal form ``scd2_apply``
    requires: collapsing is lossy under out-of-order merges (a late
    B@t2 landing between a collapsed A@t1..A@t3 run could never recover
    the A@t3 transition), so collapse belongs to read time, not storage.
    Timestamps are emitted formatted (SURVEY.md §5.3 caution)."""
    w = Window.partitionBy(key).orderBy(ts_col, tiebreak)
    rows = log.select(key, state_col, ts_col, tiebreak)
    if collapse:
        rows = rows.withColumn("__prev", F.lag(state_col).over(w)).filter(
            F.col("__prev").isNull() | (F.col("__prev") != F.col(state_col))
        )
    nxt = F.lead(ts_col).over(Window.partitionBy(key).orderBy(ts_col, tiebreak))
    return rows.select(
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
    """Merge a batch of new change rows into an existing SCD2 dimension in
    the UNCOLLAPSED internal form (``scd2_from_log(collapse=False)``).
    Only keys appearing in *updates* are re-derived — their stored rows
    fold back into log form (every original event is still there, which
    is exactly why the internal form doesn't collapse) and union with the
    new rows; every other key passes through untouched via anti-join.
    Late/out-of-order updates are handled for free: re-derivation sorts
    the merged history, rewriting downstream intervals of that key.
    Render with ``scd2_present`` for the collapsed business view."""
    affected = updates.select(key).distinct()
    untouched = current.join(F.broadcast(affected), key, "left_anti")
    replay = (
        current.join(F.broadcast(affected), key, "left_semi")
        .select(key, F.col("state").alias(state_col), F.col("__ts").alias(ts_col), F.col("__tb").alias(tiebreak))
        .unionByName(updates.select(key, state_col, ts_col, tiebreak))
    )
    rebuilt = scd2_from_log(
        replay, key=key, state_col=state_col, ts_col=ts_col, tiebreak=tiebreak, collapse=False
    )
    return untouched.unionByName(rebuilt)


def scd2_compact(
    dim: DataFrame,
    horizon,
    key: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak: str = "event_id",
) -> DataFrame:
    """Bound the uncollapsed internal dimension's growth: collapse
    consecutive same-state runs whose events are OLDER than *horizon*
    (a late-data watermark — the caller's promise that no event with
    ``ts < horizon`` will ever arrive again), keeping one row per run
    (the run leader). Events at/inside the horizon keep the event-level
    form so ``scd2_apply`` can still splice late arrivals between them.

    This is exactly the trade the uncollapsed form defers: collapsing is
    lossy only if a late event can land inside a collapsed run, and the
    horizon contract rules that out. ``scd2_present`` of the compacted
    dimension equals ``scd2_present`` of the full one (equivalence-tested),
    and row count per key is bounded by (#true state changes before the
    horizon) + (#events inside the horizon) instead of the whole event log.

    Scale: one window pair on the same (key → ts, tiebreak) partition
    spec as derivation — run-ids via change-flag running sum, run leader
    via row_number — so compaction adds no extra exchange beyond the
    per-key shuffle it shares with re-derivation.

    *horizon* is a timestamp string (``yyyy-MM-dd[ HH:mm:ss]``) or Column.
    """
    hz = F.to_timestamp(F.lit(horizon)) if isinstance(horizon, str) else horizon
    log = dim.select(
        key,
        F.col("state").alias(state_col),
        F.col("__ts").alias(ts_col),
        F.col("__tb").alias(tiebreak),
    )
    w = Window.partitionBy(key).orderBy(ts_col, tiebreak)
    prev = F.lag(state_col).over(w)
    flag = F.when(prev.isNull() | (prev != F.col(state_col)), 1).otherwise(0)
    runs = log.withColumn(
        "__run", F.sum(flag).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    wrun = Window.partitionBy(key, "__run").orderBy(ts_col, tiebreak)
    kept = (
        runs.withColumn("__rn", F.row_number().over(wrun))
        .filter((F.col(ts_col) >= hz) | (F.col("__rn") == 1))
        .drop("__run", "__rn")
    )
    return scd2_from_log(
        kept, key=key, state_col=state_col, ts_col=ts_col, tiebreak=tiebreak, collapse=False
    )


def scd2_present(
    dim: DataFrame,
    key: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak: str = "event_id",
) -> DataFrame:
    """Collapse an uncollapsed internal dimension (``scd2_apply`` output /
    streaming sink storage) into the presentation view: consecutive
    same-state intervals merged, one row per true state change."""
    log = dim.select(
        key,
        F.col("state").alias(state_col),
        F.col("__ts").alias(ts_col),
        F.col("__tb").alias(tiebreak),
    )
    return scd2_from_log(log, key=key, state_col=state_col, ts_col=ts_col, tiebreak=tiebreak)


def scd2_streaming_sink(
    changes_stream,
    path: str,
    key: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak: str = "event_id",
    compact_lag_days: float | None = None,
):
    """Streaming SCD2 maintenance: each micro-batch of change rows is
    merged into the parquet dimension at *path* with ``scd2_apply`` —
    only the batch's keys are re-derived, so per-batch cost tracks batch
    size, not dimension size. Late/out-of-order arrivals across batches
    are absorbed by the per-key replay (tested by reversing batch order).

    With ``compact_lag_days`` set, each batch also runs ``scd2_compact``
    at horizon = (max event ts seen) - lag, so stored rows stop tracking
    the event log and track (state changes + a sliding late-data tail)
    instead — the bounded-storage operational form. The horizon scalar is
    one single-row aggregate (metadata-scale collect, not a data move).

    Durability: "does a dimension already exist" is decided by an EXPLICIT
    FileSystem.exists() probe, never by catching read errors — a corrupt
    footer / transient FS error / permission failure must abort the batch
    (foreachBatch retries it), not be mistaken for first-batch and
    overwrite the whole history with one micro-batch. The rewrite itself
    is write-to-temp-then-swap: the new dimension is fully materialized in
    a sibling ``<path>__tmp`` directory (reading the still-intact current
    files — no read-overwrite conflict, no checkpoint needed) before the
    old directory is replaced, so a crash mid-write leaves the current
    dimension untouched. A table format with MERGE (Delta/Iceberg) is the
    production sink — the merge LOGIC is this same scd2_apply split.
    Returns a DataStreamWriter; caller starts it."""

    def _apply(batch_df, _batch_id):
        sp = batch_df.sparkSession
        kw = dict(key=key, state_col=state_col, ts_col=ts_col, tiebreak=tiebreak)
        jvm = sp._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = hpath.getFileSystem(sp._jsc.hadoopConfiguration())
        if fs.exists(hpath):
            # any read failure past this point is a REAL error and propagates
            dim = scd2_apply(sp.read.parquet(path), batch_df, **kw)
        else:
            dim = scd2_from_log(batch_df, collapse=False, **kw)
        if compact_lag_days is not None:
            hi = dim.agg(F.max("__ts")).first()[0]
            if hi is not None:
                lag_s = int(compact_lag_days * 86400)
                dim = scd2_compact(
                    dim, F.lit(hi) - F.expr(f"INTERVAL {lag_s} SECONDS"), **kw
                )
        tmp = path.rstrip("/") + "__tmp"
        htmp = jvm.org.apache.hadoop.fs.Path(tmp)
        if fs.exists(htmp):  # leftover from a crashed batch — stale, discard
            fs.delete(htmp, True)
        dim.write.mode("overwrite").parquet(tmp)
        # swap: current dim stays valid until the instant of the rename
        if fs.exists(hpath):
            fs.delete(hpath, True)
        if not fs.rename(htmp, hpath):
            raise IOError(f"scd2_streaming_sink: rename {tmp} -> {path} failed")

    return changes_stream.writeStream.foreachBatch(_apply)


def scd2_change_feed(
    old_current: DataFrame,
    new_current: DataFrame,
    key: str = "user_id",
) -> DataFrame:
    """[EXT] CDC change feed between two dimension snapshots (the Delta
    CHANGE DATA FEED / Debezium-diff shape): full-outer join of the two
    current-state views on the key, classifying each key as INSERT (new
    only), DELETE (old only), UPDATE (state differs) — unchanged keys drop
    out. Inputs are ``scd2_present``-style frames filtered to
    ``is_current``; one row per key each.

    Scale shape: ONE full-outer shuffle join on the dimension key (both
    sides are current-state sized — one row per key, far smaller than the
    event log); the classifier is a codegen'd CASE. At 100 TB the
    dimension is bucketable on the key, making the diff co-located."""
    o = old_current.select(F.col(key), F.col("state").alias("old_state"))
    n = new_current.select(F.col(key).alias("__nk"), F.col("state").alias("new_state"))
    joined = o.join(n, o[key] == n["__nk"], "full_outer")
    change = (
        F.when(F.col(key).isNull(), F.lit("INSERT"))
        .when(F.col("__nk").isNull(), F.lit("DELETE"))
        .when(F.col("old_state") != F.col("new_state"), F.lit("UPDATE"))
    )
    return (
        joined.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(
            F.coalesce(F.col(key), F.col("__nk")).alias(key),
            "change",
            "old_state",
            "new_state",
        )
        # no presentation sort: the feed is dimension-sized
    )


def apply_change_feed(
    old_current: DataFrame,
    feed: DataFrame,
    key: str = "user_id",
) -> DataFrame:
    """[EXT] Apply a CDC change feed to the snapshot it was diffed FROM —
    the consumer half of ``scd2_change_feed`` (Debezium-sink / Delta
    `APPLY CHANGES` shape): a downstream table that can't re-read the
    source replays just the feed to catch up. Round-trip law (tested both
    directions, so the DELETE arm is exercised too)::

        apply_change_feed(old, scd2_change_feed(old, new)) == new

    Mechanics: drop the keys the feed rewrites or removes (one LEFT ANTI
    join on UPDATE/DELETE keys), then union the feed's INSERT/UPDATE rows
    carrying ``new_state``. Both inputs are dimension-sized (one row per
    key); at 100 TB both sides bucket on the key, making the anti-join
    co-located — the feed is usually tiny and AQE will broadcast it.
    """
    touched = feed.filter(F.col("change").isin("UPDATE", "DELETE")).select(key)
    kept = old_current.select(key, "state").join(touched, key, "left_anti")
    added = feed.filter(F.col("change").isin("INSERT", "UPDATE")).select(
        F.col(key), F.col("new_state").alias("state")
    )
    return kept.unionByName(added)
    # no presentation sort: dimension-sized output, order-insensitive compare


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    key_cols: list[str] | tuple[str, ...] = ("o_orderkey",),
) -> DataFrame:
    """[EXT] MERGE INTO (upsert form): WHEN MATCHED update every non-key
    column from the source, WHEN NOT MATCHED insert the source row — the
    Type-1 sibling of the SCD2 merge above, and the other half of the
    lakehouse MERGE surface.  Expressed declaratively so it is fully
    oracle-checkable (DuckDB twin: FULL OUTER JOIN + per-column COALESCE
    with source precedence), unlike engine-specific MERGE DML.

    Scale: one shuffle per side on the key (or zero for bucketed
    targets — tests/test_bucketing.py's layout applies directly); the
    update batch is typically broadcastable and AQE will choose that at
    runtime.  Untouched target rows stream through the join without
    per-column work (COALESCE short-circuits on the NULL source side).
    Deletes are out of scope here — pair with an anti-join (`P9`/
    `dedup_exact` shapes) for MERGE's DELETE clause."""
    keys = list(key_cols)
    value_cols = [c for c in target.columns if c not in keys]
    if source.columns != target.columns:
        missing = set(target.columns) ^ set(source.columns)
        raise ValueError(f"merge_upsert requires identical schemas; differ on {missing}")
    t = target.alias("t")
    # presence marker instead of testing a source key for NULL: exact even
    # if a (pathological) null-keyed row rides the null-safe join
    s = source.withColumn("__src", F.lit(1)).alias("s")
    merged = t.join(
        s,
        on=F.expr(" AND ".join(f"t.{k} <=> s.{k}" for k in keys)),
        how="full_outer",
    )
    out_keys = [F.coalesce(F.col(f"s.{k}"), F.col(f"t.{k}")).alias(k) for k in keys]
    # source precedence column-wise ONLY when the source row exists at all
    # (matched or inserted); a NULL in a matched source column still wins,
    # matching MERGE's UPDATE SET t.c = s.c semantics
    src_exists = F.col("s.__src").isNotNull()
    out_vals = [
        F.when(src_exists, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
        for c in value_cols
    ]
    return merged.select(*out_keys, *out_vals)
