"""[EXT] Behavioral event analytics: conversion funnel, cohort retention,
gap-based sessionization. Nearest reference analogs are its event-log
timestamp decomposition and per-key aggregation passes
(code/01_DataPreprocessing.scala:52-63, code/02_DataFrameOperations.scala
keyed aggregates); the funnel/retention/session shapes themselves are the
standard product-analytics suite a job-postings/clickstream warehouse runs
on top of exactly those primitives.

Scale shape (100 TB): every operator here shuffles the events fact exactly
once, on ``user_id`` — funnel and retention use per-user window minima
(map-side partial for the groupBy forms is impossible for ordered logic,
but the window partitioning is a single hash exchange and per-user state is
O(1) or O(session count)); the downstream rollups operate on user-sized or
(cohort × offset)-sized frames, which are orders of magnitude smaller than
the fact. Nothing sorts globally; nothing collects.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    steps: Sequence[str] = ("view", "click", "purchase"),
    horizon_s: int = 86400,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered conversion funnel: a user converts step k iff they performed
    ``steps[k]`` strictly after their step-(k-1) conversion time, all within
    ``horizon_s`` seconds of their first step-0 event. Returns one row per
    step: users reaching it + basis-point conversion vs step 0.

    One shuffle: all step times are per-user window minima over the SAME
    ``partitionBy(user)`` spec, so Catalyst plans a single hash exchange and
    evaluates the chained Window operators on the co-located partition —
    sequential, because step k's predicate references step k-1's time. The
    final rollup is a global agg over per-user flag rows (map-side partial,
    tiny), then an explode of the step vector — never a per-step re-scan of
    the fact.
    """
    w = Window.partitionBy(user_col)
    df = events.select(user_col, type_col, ts_col)
    prev_t, limit_t = None, None
    t_cols: list[str] = []
    for k, step in enumerate(steps):
        name = f"_t{k}"
        if k == 0:
            cond = F.col(type_col) == step
        else:
            cond = (
                (F.col(type_col) == step)
                & F.col(prev_t).isNotNull()
                & (F.col(ts_col) > F.col(prev_t))
                & (F.col(ts_col) <= F.col(limit_t))
            )
        df = df.withColumn(name, F.min(F.when(cond, F.col(ts_col))).over(w))
        if k == 0:
            df = df.withColumn(
                "_limit", F.timestamp_add("SECOND", F.lit(horizon_s), F.col(name))
            )
            limit_t = "_limit"
        prev_t = name
        t_cols.append(name)

    per_user = df.groupBy(user_col).agg(
        *[
            F.max(F.col(t_cols[k]).isNotNull().cast("long")).alias(f"_r{k}")
            for k in range(len(steps))
        ]
    )
    totals = per_user.agg(
        *[F.sum(f"_r{k}").alias(f"_n{k}") for k in range(len(steps))]
    )
    # explode the step vector so the result is one tidy row per step; the
    # step-0 denominator is on the same (single) totals row, so conversion
    # is computed before the explode — no window needed
    pairs = F.array(
        *[
            F.struct(
                F.lit(k).alias("step_idx"),
                F.lit(steps[k]).alias("step"),
                F.col(f"_n{k}").cast("long").alias("n_users"),
                F.expr(f"CAST(10000 * _n{k} div nullif(_n0, 0) AS BIGINT)").alias(
                    "conv_bp"
                ),
            )
            for k in range(len(steps))
        ]
    )
    return (
        totals.select(F.explode(pairs).alias("p"))
        .select("p.step_idx", "p.step", "p.n_users", "p.conv_bp")
        .orderBy("step_idx")
    )


def retention_cohorts(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Daily cohort retention triangle: cohort = a user's first-ever event
    date; for each (cohort_day, day_offset) count distinct users active that
    day. The classic growth-accounting matrix.

    One fact shuffle on ``user_id`` (window min for the cohort date — the
    same exchange a groupBy-join-back would take, without the join), then a
    distinct + rollup on (cohort, offset), whose cardinality is
    O(active_days²) — trivially small at any corpus size.
    """
    w = Window.partitionBy(user_col)
    day = F.to_date(F.col(ts_col))
    return (
        events.select(user_col, day.alias("_day"))
        .withColumn("cohort_day", F.min("_day").over(w))
        .select(
            user_col,
            "cohort_day",
            F.datediff(F.col("_day"), F.col("cohort_day")).cast("long").alias("day_offset"),
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.count_distinct(F.col(user_col)).alias("n_users"))
        .orderBy("cohort_day", "day_offset")
    )


def sessionize(
    events: DataFrame,
    gap_s: int = 1800,
    ts_col: str = "ts",
    user_col: str = "user_id",
    id_col: str = "event_id",
) -> DataFrame:
    """Gap-based sessionization (gaps-and-islands): a new session starts at
    a user's first event or after ≥``gap_s`` seconds of silence; returns one
    row per session with bounds, event count, and duration. The batch twin
    of ``streaming.windows.session_window_agg`` — this form assigns stable
    per-user session sequence numbers instead of merged window bounds.

    One shuffle on ``user_id``; both windows (the lag and the running sum)
    share the identical (partition, order) spec so the per-user sort happens
    once. Per-user state during the scan is O(1). Session rows out are
    strictly fewer than events in; the final per-session agg reuses the same
    user-hash partitioning, so AQE-coalesced local aggregation follows with
    no extra exchange.
    """
    wo = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(id_col))
    # integer microsecond arithmetic end-to-end: gap tests and durations
    # stay exact (no float-epoch half-boundary hazards vs the oracle)
    gap = F.unix_micros(F.col(ts_col)) - F.unix_micros(F.lag(F.col(ts_col)).over(wo))
    is_new = (gap.isNull() | (gap >= gap_s * 1_000_000)).cast("long")
    with_sess = events.select(user_col, ts_col, id_col).withColumn(
        "session_seq",
        F.sum(is_new).over(
            Window.partitionBy(user_col)
            .orderBy(F.col(ts_col), F.col(id_col))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    dur = F.expr("(unix_micros(_end) - unix_micros(_start)) div 1000000")
    return (
        with_sess.groupBy(user_col, "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.min(ts_col).alias("_start"),
            F.max(ts_col).alias("_end"),
        )
        .select(
            user_col,
            F.col("session_seq").cast("long").alias("session_seq"),
            F.col("n_events").cast("long").alias("n_events"),
            F.date_format("_start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("_end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            dur.cast("long").alias("duration_s"),
        )
        # no presentation sort: session-count output is fact-adjacent at
        # scale; the driver compare is order-insensitive
    )


def daily_anomaly(
    events: DataFrame,
    z: int = 2,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """[EXT] Integer-exact volume-anomaly detection: flag (event_type, day)
    cells whose daily count deviates from that type's mean by more than
    ``z`` population standard deviations — the data-quality tripwire every
    ingestion pipeline runs on its daily partition counts.

    The z-test is evaluated WITHOUT floats: |c − μ| > z·σ with μ = T/n and
    σ² = (n·S − T²)/n² (T = Σc, S = Σc², n = #days observed for the type)
    multiplies out to ``(c·n − T)² > z²·(n·S − T²)`` — pure int64, so the
    flag is bit-identical on any engine and any summation order (a float
    stddev differs in the last ulp between Spark's partial aggregation tree
    and a single-node oracle, which can flip a borderline flag). int64 is
    safe while c·n < 3·10⁹; beyond that (trillions of events/day) the
    quadratic terms need decimal(38,0) — same shape, wider lanes.

    Scale shape: one shuffle on (type, day) for the daily counts (map-side
    partial combine does the heavy lifting); the per-type moments roll up
    from the tiny daily frame and broadcast back onto it.
    """
    daily = events.groupBy(
        F.col(type_col), F.to_date(ts_col).alias("day")
    ).agg(F.count("*").alias("cnt"))
    stats = daily.groupBy(type_col).agg(
        F.count("*").alias("n_days"),
        F.sum("cnt").alias("total"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("sumsq"),
    )
    lhs = F.col("cnt") * F.col("n_days") - F.col("total")
    rhs = F.lit(z * z) * (
        F.col("n_days") * F.col("sumsq") - F.col("total") * F.col("total")
    )
    return (
        daily.join(F.broadcast(stats), type_col)
        .select(
            type_col,
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "cnt",
            (lhs * lhs > rhs).alias("is_anomaly"),
        )
        .orderBy(type_col, "day")
    )


def hourly_gapfill(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """[EXT] Time-series regularization: one row per (event_type, hour) on
    a dense hourly grid spanning the data, with the count zero-filled and
    the last-seen event id forward-filled across empty hours — the
    resample-and-ffill primitive behind rate dashboards and downstream
    as-of features.

    Scale shape: the dense grid is generated DISTRIBUTED (``sequence`` +
    ``explode`` per type — never a driver loop) and is |types|×|hours|,
    vanishingly small next to the fact; the fact is touched once by the
    (type, hour) count agg with map-side combine. The forward-fill window
    partitions by type over the grid frame, so per-task state is one
    type's hour span. Every output column is integer or formatted string —
    exact on any engine.
    """
    hours = events.agg(
        F.date_trunc("hour", F.min(ts_col)).alias("h0"),
        F.date_trunc("hour", F.max(ts_col)).alias("h1"),
    )
    grid = (
        events.select(type_col)
        .distinct()
        .crossJoin(F.broadcast(hours))
        .select(
            type_col,
            F.explode(
                F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
            ).alias("hour"),
        )
    )
    hourly = events.groupBy(
        F.col(type_col), F.date_trunc("hour", F.col(ts_col)).alias("hour")
    ).agg(F.count("*").alias("cnt"), F.max(id_col).alias("max_id"))
    wff = (
        Window.partitionBy(type_col)
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(hourly, [type_col, "hour"], "left")
        .select(
            type_col,
            F.date_format("hour", "yyyy-MM-dd HH:00:00").alias("hour"),
            F.coalesce("cnt", F.lit(0)).alias("cnt"),
            F.last("max_id", ignorenulls=True).over(wff).alias("last_event_id"),
        )
        .orderBy(type_col, "hour")
    )


def transition_matrix(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """[EXT] First-order Markov transition counts/probabilities between
    consecutive event types per user — the "what do users do next" report.

    One shuffle on ``user_col`` for the lag window (total-ordered by
    (ts, event_id) so ties are deterministic); the aggregate runs on
    (prev, next) pairs — ≤ |types|² groups — and the per-prev probability
    denominator comes from a window over that already-tiny frame.
    Probabilities use the scaled-integer division rule (functions/exact.py)
    so both engines round identically."""
    from jobanalytics_bigdataproject_spark.functions.exact import exact_div

    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    pairs = (
        events.select(user_col, ts_col, id_col, type_col)
        .withColumn("prev_type", F.lag(type_col).over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col(type_col).alias("next_type"))
        .agg(F.count("*").alias("n"))
    )
    wp = Window.partitionBy("prev_type")
    return (
        pairs.withColumn("prev_total", F.sum("n").over(wp))
        .select(
            "prev_type",
            "next_type",
            "n",
            exact_div(F.col("n"), F.col("prev_total"), 4).alias("p"),
        )
        .orderBy("prev_type", "next_type")
    )


def rfm_segments(
    orders: DataFrame,
    date_col: str = "o_orderdate",
    user_col: str = "o_custkey",
    amount_col: str = "o_totalprice",
) -> DataFrame:
    """[EXT] RFM (recency / frequency / monetary) scoring, 1–4 per axis.

    Scale discipline: scores come from exact global quartile CUTOFFS
    (three scalar rows, broadcast) applied with a when-chain — NOT from a
    global ``ntile`` window, which would single-partition the entire
    customer frame (the same rule as t2_price_tiers; the cliff of exact
    percentile at ~1e9 rows is documented there, with the sketch variant
    as the relief valve).

    Determinism: recency is an integer day count, frequency an integer,
    monetary integer cents — the quartile cutoffs interpolate between
    integers (k.25/k.5/k.75 values are exactly representable doubles), so
    both engines compute identical cutoffs and every >=/<= comparison
    agrees.  Score convention: higher = better (recent, frequent, big
    spender); values AT a cutoff take the higher score on both engines."""
    from jobanalytics_bigdataproject_spark.functions.exact import cents

    # global reference date: one-row aggregate, broadcast — never a window
    # over the fact or the customer frame
    ref = orders.agg(F.max(date_col).alias("__ref_date"))
    per_user = (
        orders.crossJoin(F.broadcast(ref))
        .groupBy(user_col)
        .agg(
            F.datediff(F.first("__ref_date"), F.max(date_col)).alias("recency_days"),
            F.count("*").alias("frequency"),
            F.sum(cents(amount_col)).alias("monetary_cents"),
        )
    )
    # all nine quartile cutoffs in ONE one-row aggregate over the
    # customer-sized frame, broadcast back (t2_price_tiers discipline; the
    # exact-percentile ~1e9-row buffer cliff and its sketch relief valve
    # are documented there)
    cuts = per_user.agg(
        *[
            F.expr(f"percentile({m}, {p})").alias(f"__{m}_{int(p * 100)}")
            for m in ("recency_days", "frequency", "monetary_cents")
            for p in (0.25, 0.5, 0.75)
        ]
    )

    def scored(col: str, invert: bool):
        c = F.col(col)
        q25, q50, q75 = (F.col(f"__{col}_{k}") for k in (25, 50, 75))
        if invert:  # smaller is better (recency)
            return F.when(c <= q25, 4).when(c <= q50, 3).when(c <= q75, 2).otherwise(1)
        return F.when(c >= q75, 4).when(c >= q50, 3).when(c >= q25, 2).otherwise(1)

    return (
        per_user.crossJoin(F.broadcast(cuts))
        .select(
            user_col,
            "recency_days",
            "frequency",
            (F.col("monetary_cents") / F.lit(100.0)).alias("monetary"),
            scored("recency_days", invert=True).alias("r_score"),
            scored("frequency", invert=False).alias("f_score"),
            scored("monetary_cents", invert=False).alias("m_score"),
        )
        .withColumn(
            "segment",
            F.when((F.col("r_score") >= 3) & (F.col("f_score") >= 3), "loyal")
            .when(F.col("r_score") <= 2, "lapsing")
            .otherwise("developing"),
        )
    )


def session_time_per_day(
    events: DataFrame,
    gap_s: int = 1800,
    ts_col: str = "ts",
    user_col: str = "user_id",
    id_col: str = "event_id",
) -> DataFrame:
    """[EXT] Daily engagement seconds with midnight proration: sessions are
    derived as in ``sessionize``, then each session interval is SPLIT at
    day boundaries and every day is credited exactly its overlapped
    seconds — the interval-splitting aggregation a naive
    groupBy(to_date(start)) gets wrong for sessions crossing midnight.

    Determinism: all interval math is integer microseconds
    (unix_micros div), so both engines agree exactly; a session ending
    exactly at midnight contributes a 0-second row to that day on both.

    Scale: one shuffle on user for the session windows; the day explode
    fans ≤ (duration_days) rows per session (1 for almost all); the final
    per-day aggregate is map-side combined into |days| rows.
    """
    wo = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(id_col))
    gap = F.unix_micros(F.col(ts_col)) - F.unix_micros(F.lag(F.col(ts_col)).over(wo))
    is_new = (gap.isNull() | (gap >= gap_s * 1_000_000)).cast("long")
    sessions = (
        events.select(user_col, ts_col, id_col)
        .withColumn(
            "session_seq",
            F.sum(is_new).over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
        )
        .groupBy(user_col, "session_seq")
        .agg(F.min(ts_col).alias("s_start"), F.max(ts_col).alias("s_end"))
    )
    exploded = sessions.withColumn(
        "day", F.explode(F.sequence(F.to_date("s_start"), F.to_date("s_end")))
    )
    p_start = F.greatest(F.col("s_start"), F.col("day").cast("timestamp"))
    p_end = F.least(F.col("s_end"), F.date_add(F.col("day"), 1).cast("timestamp"))
    secs = (F.unix_micros(p_end) - F.unix_micros(p_start)) / F.lit(1_000_000)
    secs = F.floor(secs).cast("long")
    return (
        exploded.select(user_col, "day", secs.alias("secs"))
        .groupBy("day")
        .agg(
            F.sum("secs").cast("long").alias("engaged_seconds"),
            F.count("*").alias("n_session_days"),
            F.countDistinct(user_col).alias("n_users"),
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "engaged_seconds",
            "n_session_days",
            "n_users",
        )
        .orderBy("day")
    )


def time_to_convert(
    events: DataFrame,
    from_type: str = "view",
    to_type: str = "purchase",
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """[EXT] Conversion-latency distribution: per user, the seconds from
    the FIRST ``from_type`` event to the first ``to_type`` event strictly
    after it; report converting-user count and exact p50/p90/max latency.

    One shuffle on user for the two window minima (same partition spec);
    latencies are integer seconds (micros div), so the exact percentiles
    interpolate on representable k.5 boundaries and both engines agree.
    The percentile input is one row per converting user — customer-scale,
    not event-scale; the documented exact-percentile cliff and its sketch
    relief valve (t2_price_tiers) apply at 1e9+ users."""
    w = Window.partitionBy(user_col)
    t0 = F.min(F.when(F.col(type_col) == from_type, F.col(ts_col))).over(w)
    per_event = events.select(user_col, type_col, ts_col).withColumn("__t0", t0)
    t1 = F.min(
        F.when(
            (F.col(type_col) == to_type)
            & F.col("__t0").isNotNull()
            & (F.col(ts_col) > F.col("__t0")),
            F.col(ts_col),
        )
    ).over(w)
    per_user = (
        per_event.withColumn("__t1", t1)
        .groupBy(user_col)
        .agg(
            F.first("__t0").alias("t0"),
            F.first("__t1").alias("t1"),
        )
        .filter(F.col("t0").isNotNull() & F.col("t1").isNotNull())
        .select(
            F.expr("(unix_micros(t1) - unix_micros(t0)) div 1000000").alias("latency_s")
        )
    )
    return per_user.agg(
        F.count("*").alias("n_converted"),
        F.expr("CAST(percentile(latency_s, 0.5) AS DOUBLE)").alias("p50_s"),
        F.expr("CAST(percentile(latency_s, 0.9) AS DOUBLE)").alias("p90_s"),
        F.max("latency_s").alias("max_s"),
    )


def dow_seasonality(
    events: DataFrame,
    ts_col: str = "ts",
) -> DataFrame:
    """[EXT] Day-of-week seasonality profile with per-day deviation: daily
    event counts, the mean count for that weekday across the whole log,
    and the day's deviation from its weekday norm in basis points — the
    "is this Monday unusually quiet" report (seasonal twin of
    ``daily_anomaly``, which scores against the global mean).

    Determinism: counts are integers; the weekday mean is an exact
    integer-sum / integer-count division done identically on both engines
    (scaled-integer rounding for the output ratio).  Spark ``dayofweek``
    is 1=Sunday; the oracle spells DuckDB's ``dayofweek()+1``
    (SURVEY.md §5.3).

    Scale: one shuffle to daily counts (|days| rows), everything after is
    metadata-sized; the weekday profile joins back by broadcast."""
    from jobanalytics_bigdataproject_spark.functions.exact import exact_div

    daily = events.groupBy(F.to_date(ts_col).alias("day")).agg(
        F.count("*").alias("n")
    ).withColumn("dow", F.dayofweek("day"))
    prof = daily.groupBy("dow").agg(
        F.sum("n").alias("dow_total"), F.count("*").alias("dow_days")
    )
    return (
        daily.join(F.broadcast(prof), "dow")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "dow",
            "n",
            exact_div(
                F.col("dow_total").cast("double"), F.col("dow_days").cast("double"), 2
            ).alias("dow_mean"),
            (
                exact_div(
                    F.lit(10000.0) * F.col("n") * F.col("dow_days"),
                    F.col("dow_total"),
                    0,
                )
                - F.lit(10000)
            ).alias("deviation_bp"),
        )
        .orderBy("day")
    )


def ewma_daily(
    events: DataFrame,
    alpha_tenths: int = 3,
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """[EXT] Exponentially-weighted moving average of daily event volume
    per type — the smoothing baseline behind alerting/trend dashboards
    (pairs with ``daily_anomaly``'s z-score tripwire: EWMA tracks level,
    the tripwire flags spikes).

    EXACTLY reproducible, unlike float EWMA: daily counts are scaled to
    integer micro-units and folded left-to-right with the all-integer
    recurrence ``acc ← (acc·(10−a) + x·a) div 10`` (α = a/10, truncating
    division each step) — no float enters the fold, so Spark's
    ``aggregate`` HOF and DuckDB's ``list_reduce`` produce bit-identical
    results and the query is oracle hash-checkable. A closed-form
    Σ α(1−α)^i float evaluation could not be (power rounding diverges).

    Scale shape: the events→daily-counts aggregation is the only
    corpus-scale stage (map-side combined, shuffle moves |types × days|
    rows). The fold runs on a per-type array of length |days| —
    bounded by the calendar horizon, KBs per group — so the interpreted
    HOF lambda touches trivially few elements (the textfns.py "HOFs are
    slow on token arrays" caveat does not apply at |days| scale).
    Per-day ordering inside the collected array comes from
    ``array_sort`` on (day, cnt) structs — deterministic, no window.
    """
    if not 1 <= alpha_tenths <= 9:
        raise ValueError("alpha_tenths must be in [1, 9]")
    daily = events.groupBy(
        F.col(type_col).alias("event_type"), F.to_date(ts_col).alias("day")
    ).agg(F.count("*").alias("cnt"))
    series = daily.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("day", "cnt"))),
            lambda r: r["cnt"].cast("long") * F.lit(1_000_000),
        ).alias("seq"),
        F.count("*").alias("n_days"),
    )
    a, b = alpha_tenths, 10 - alpha_tenths
    return series.select(
        "event_type",
        "n_days",
        F.expr(
            f"aggregate(slice(seq, 2, size(seq)-1), element_at(seq, 1), "
            f"(acc, x) -> (acc*{b} + x*{a}) div 10)"
        ).alias("ewma_micro"),
    ).orderBy("event_type")


def holt_daily(
    events: DataFrame,
    alpha_tenths: int = 3,
    beta_tenths: int = 2,
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """[EXT] Holt double-exponential smoothing (level + trend) of daily
    event volume per type, with a one-step-ahead forecast — ``ewma_daily``
    tracks level only; this adds the trend term that makes the smoother
    usable for capacity forecasting (is tomorrow's volume growing?).

    Same exactness device as ``ewma_daily``: micro-unit integers, the
    coupled recurrences (α = a/10, β = c/10)::

        l_t = (a·x_t + (10−a)·(l_{t−1}+b_{t−1})) div 10
        b_t = (c·(l_t − l_{t−1}) + (10−c)·b_{t−1}) div 10

    folded as an all-integer STRUCT accumulator (Spark ``aggregate``
    with ``named_struct``; truncating division — Spark ``div`` and
    DuckDB ``//`` both truncate toward zero, verified on negatives,
    which the trend term produces). l_t is textually repeated inside
    the b_t arm because a fold lambda can't bind a local — and exactly
    that duplicated-subexpression shape exposed a DuckDB 1.0
    ``list_reduce`` miscompilation (multi-step folds return values no
    stepwise evaluation produces; single steps are correct), so the
    ORACLE does the identical fold as a WITH RECURSIVE CTE instead —
    standard SQL, stepwise-verified. Init: l₀ = x₀, b₀ = 0.
    Forecast = lₙ + bₙ.

    Scale shape: identical to ``ewma_daily`` — corpus-scale work is one
    map-side daily count; the fold touches a per-type |days|-bounded
    array.
    """
    for v in (alpha_tenths, beta_tenths):
        if not 1 <= v <= 9:
            raise ValueError("alpha_tenths/beta_tenths must be in [1, 9]")
    daily = events.groupBy(
        F.col(type_col).alias("event_type"), F.to_date(ts_col).alias("day")
    ).agg(F.count("*").alias("cnt"))
    series = daily.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("day", "cnt"))),
            lambda r: r["cnt"].cast("long") * F.lit(1_000_000),
        ).alias("seq"),
        F.count("*").alias("n_days"),
    )
    a, na = alpha_tenths, 10 - alpha_tenths
    c, nc = beta_tenths, 10 - beta_tenths
    new_l = f"(({a}*x + {na}*(acc.l + acc.b)) div 10)"
    new_b = f"(({c}*({new_l} - acc.l) + {nc}*acc.b) div 10)"
    fold = (
        f"aggregate(slice(seq, 2, size(seq)-1), "
        f"named_struct('l', element_at(seq, 1), 'b', CAST(0 AS BIGINT)), "
        f"(acc, x) -> named_struct('l', {new_l}, 'b', {new_b}))"
    )
    return series.select(
        "event_type",
        "n_days",
        F.expr(f"({fold}).l").alias("level_micro"),
        F.expr(f"({fold}).b").alias("trend_micro"),
        F.expr(f"({fold}).l + ({fold}).b").alias("forecast_next_micro"),
    ).orderBy("event_type")


def last_touch_attribution(
    events: DataFrame,
    convert_type: str = "purchase",
    lookback_days: int = 7,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """[EXT] Last-touch conversion attribution: each conversion credits the
    user's most recent PRECEDING non-conversion event, but only if it
    happened within ``lookback_days`` — older touches (or none at all)
    fall into the '(none)' bucket.  The marketing-analytics sibling of
    ``time_to_convert``; per attributed channel report conversions and
    distinct converting users.

    Determinism: the per-user ordering is (ts, event_id) — the repo-wide
    total order — and the credited touch is picked by LAST(...) IGNORE
    NULLS over a rows-frame, which both engines define identically on a
    total order.

    Scale: one shuffle on user for the window; conversions filter before
    the tiny per-channel aggregate (map-side combined, |types|+1 rows)."""
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = F.last(
        F.when(
            F.col(type_col) != convert_type,
            F.struct(F.col(ts_col).alias("pts"), F.col(type_col).alias("ptype")),
        ),
        ignorenulls=True,
    ).over(w)
    attributed = F.coalesce(
        F.when(
            F.col("prev.pts")
            >= F.col(ts_col) - F.expr(f"INTERVAL {int(lookback_days)} DAYS"),
            F.col("prev.ptype"),
        ),
        F.lit("(none)"),
    )
    return (
        events.select(user_col, ts_col, type_col, id_col)
        .withColumn("prev", prev)
        .filter(F.col(type_col) == convert_type)
        .select(attributed.alias("attributed_type"), user_col)
        .groupBy("attributed_type")
        .agg(
            F.count("*").alias("n_conversions"),
            F.countDistinct(user_col).alias("n_users"),
        )
        .orderBy("attributed_type")
    )


def contingency_audit(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """[EXT] Integer-exact chi-square contingency audit of event type ×
    day-of-week: observed cell counts against the independence-hypothesis
    expectation, per-cell deviation, and the chi-square contribution —
    the "did our traffic mix change by weekday?" independence test, the
    categorical sibling of ``daily_anomaly``'s z-test.

    Exactness (same discipline as ``daily_anomaly``): with O the cell
    count, R/C the row/column totals and G the grand total, the textbook
    statistic (O − E)²/E with E = R·C/G multiplies out to

        chi2_cell = (O·G − R·C)² / (G·R·C)

    — evaluated in DECIMAL(38,0) integer arithmetic with one truncating
    division to micro-units at the end, so every reported number is
    bit-identical on any engine and any partitioning (a float E differs
    in the last ulp between Spark's agg tree and a single-node oracle).
    decimal(38,0) holds (O·G − R·C)² up to ~10³⁸ — safe beyond 10¹⁸
    events; the per-cell deviation in basis points uses only linear
    terms.

    Scale: one shuffle for the (type, dow) cell counts (map-side combine
    does the reduction; the cell frame is |types|×7 rows). Row/column/
    grand totals are windows over that TINY frame — the single-partition
    window is |types|×7 rows of longs, never the event log. The caller
    sums ``chi2_micro`` and compares to a χ² critical value at
    (|types|−1)(7−1) degrees of freedom.
    """
    cells = events.groupBy(
        F.col(type_col).alias("event_type"),
        F.dayofweek(F.col(ts_col)).alias("dow"),
    ).agg(F.count(F.lit(1)).alias("observed"))
    totals = cells.select(
        "event_type",
        "dow",
        "observed",
        F.sum("observed").over(Window.partitionBy("event_type")).alias("row_total"),
        F.sum("observed").over(Window.partitionBy("dow")).alias("col_total"),
        F.sum("observed").over(Window.partitionBy()).alias("grand"),
    )
    dec = "decimal(38,0)"
    o, r, c, g = (
        F.col("observed").cast(dec),
        F.col("row_total").cast(dec),
        F.col("col_total").cast(dec),
        F.col("grand").cast(dec),
    )
    diff = o * g - r * c
    return totals.select(
        "event_type",
        "dow",
        "observed",
        (r * c * F.lit(1_000_000).cast(dec)).alias("__e_num"),
        (diff * F.lit(10_000).cast(dec)).alias("__d_num"),
        (diff * diff * F.lit(1_000_000).cast(dec)).alias("__x_num"),
        (r * c).alias("__rc"),
        (g * r * c).alias("__grc"),
        g.alias("__g"),
    ).select(
        "event_type",
        "dow",
        "observed",
        F.expr("CAST(__e_num div __g AS BIGINT)").alias("expected_micro"),
        F.expr("CAST(__d_num div __rc AS BIGINT)").alias("dev_bp"),
        F.expr("CAST(__x_num div __grc AS BIGINT)").alias("chi2_micro"),
    ).orderBy("event_type", "dow")
