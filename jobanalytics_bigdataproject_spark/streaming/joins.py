"""[EXT] Stream-stream interval joins (SURVEY.md §2.11 depth — the
reference is batch-only; nearest analog is its event decomposition,
code/01_DataPreprocessing.scala:52-63).

Written against plain DataFrames like streaming/windows.py: the SAME
function runs in batch (oracle-checkable plain SQL join) and on two
``readStream`` frames, where Spark's stream-stream join machinery kicks in.
For the streaming case both inputs MUST carry watermarks and the join
condition MUST bound event time on both sides — that is what lets Spark
expire buffered state; this module's interval condition provides exactly
that bound.

Scale: a stream-stream interval join shuffles both sides on the equality
key and buffers only rows inside the watermark-bounded interval —
state is O(rate × interval), independent of stream length. The batch
equivalent is a plain shuffled equi-join with a range residual; AQE
handles skewed keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    upper: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join rows of *right* to rows of *left* with the same *key* whose
    timestamp falls in ``[left.ts, left.ts + upper]`` — the standard
    event-attribution interval join. Equality on *key* keeps the join a
    hash join (the range is a residual filter, never a cartesian).

    ``how='left_outer'`` (VERDICT r4 #9) keeps unmatched LEFT rows: in
    streaming, Spark buffers them in state and emits the null-padded row
    only once the watermark passes the interval's upper bound — i.e. when
    no matching right row can still arrive. Until the watermark advances
    past a row's expiry, the row sits in state unemitted (a final
    micro-batch after further watermark movement flushes it — see the
    equivalence test, which forces a second batch with a sentinel file).
    Both sides still need watermarks; the interval condition is exactly
    the event-time bound outer state expiry requires."""
    lf = left.alias("l")
    rf = right.alias("r")
    lts, rts = F.col(f"l.{ts_col}"), F.col(f"r.{ts_col}")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (rts >= lts)
        & (rts <= lts + F.expr(f"INTERVAL {upper}"))
    )
    if how == "left_anti":
        # Spark's stream-stream join machinery has no native left-anti, but
        # the streaming-legal composition is exact: LEFT OUTER buffers the
        # left row and emits it null-padded only once the watermark proves
        # no in-interval right row can still arrive — filtering on the
        # null-padded equality key keeps precisely those rows (the key is
        # never null on a matched row, the equi-condition saw to that).
        # Projecting to the left columns restores true anti-join shape.
        joined = lf.join(rf, cond, "left_outer")
        return joined.filter(F.col(f"r.{key}").isNull()).select(
            *[F.col(f"l.{c}").alias(c) for c in left.columns]
        )
    return lf.join(rf, cond, how)


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    key: str,
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join — the third streaming-join variant
    next to stream-stream interval joins (above) and the windowed aggs
    (streaming/windows.py): attach dimension attributes to a fact stream.

    Spark plans a stream-static join statelessly: the static side needs
    no watermark and holds no streaming state; with the explicit
    ``broadcast`` hint each micro-batch is a map-side hash join — the
    stream side NEVER shuffles, which is the only acceptable shape for a
    100 TB/day firehose against a dimension table. The static plan is
    re-evaluated per micro-batch, so pairing the dim side with
    ``sources.snapshots.read_snapshot`` pins a VERSION for exactly-
    reproducible enrichment (or, inside ``foreachBatch``, re-resolves
    the latest version each batch — slowly-changing enrichment).

    The same function on two batch frames is the oracle-checkable twin
    (equivalence tested in tests/test_streaming_join.py).
    """
    return stream.join(F.broadcast(dim), key, how)


def click_purchase_attribution(
    events: DataFrame, upper: str = "10 minutes", how: str = "inner"
) -> DataFrame:
    """Attribute each purchase to the clicks of the same user in the
    preceding ``upper`` interval. Emits formatted timestamps + the raw
    value so the batch form hash-checks against the oracle; the identical
    function over two watermarked ``readStream`` frames is the streaming
    form (tests/test_streaming_join.py).

    ``how='left_outer'`` keeps unconverted clicks with NULL purchase
    columns — the funnel-drop view; in streaming those rows emit at
    watermark expiry instead of being silently dropped.
    ``how='full_outer'`` additionally keeps purchases no click preceded
    (organic/dark-traffic conversions) with NULL click columns; the
    user_id is coalesced from whichever side survives — a no-op for
    inner/left rows, where the equi-join guarantees both sides agree.
    ``how='right_outer'`` is the organic-conversion view on its own:
    every purchase, attributed where a click preceded it, NULL click
    columns otherwise — in streaming the unmatched purchase emits once
    the watermark proves no in-interval click can still arrive (the
    mirror of the left-outer path; VERDICT r7 #9 closes the how= family).
    ``how='left_semi'`` emits each CONVERTED click exactly once however
    many purchases followed it (the funnel-entry dedup view — an inner
    join would multiply clicks by their purchase count). In streaming,
    Spark emits the click when its first match arrives and drops
    unmatched clicks at watermark expiry; only left columns exist, so
    the output schema narrows to (user_id, click_ts) — SQL-expressible
    as EXISTS, hence oracle-checkable unlike most streaming shapes.
    ``how='left_anti'`` is the NOT-EXISTS twin (VERDICT r8 #3): each
    click NO purchase followed within the interval — the unattributed-
    events audit that completes the how= family. In streaming the click
    emits only once the watermark passes its interval's upper bound
    (no in-interval purchase can still arrive); schema is the same
    (user_id, click_ts) narrow shape as left_semi."""
    clicks = events.filter(F.col("event_type") == "click").select("user_id", "ts")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    joined = interval_join(
        clicks, purchases, key="user_id", ts_col="ts", upper=upper, how=how
    )
    if how == "left_anti":
        return joined.select(
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        )
    if how == "left_semi":
        return joined.select(
            F.col("l.user_id").alias("user_id"),
            F.date_format("l.ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        )
    return joined.select(
        F.coalesce(F.col("l.user_id"), F.col("r.user_id")).alias("user_id"),
        F.date_format("l.ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        F.date_format("r.ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        # raw double passthrough (no arithmetic) — bit-identical across engines
        F.col("r.value").alias("purchase_value"),
    )
