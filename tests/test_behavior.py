"""Behavioral event analytics (operators/behavior.py + the full-outer
reconciliation in analytics.py): hand-computed funnel/retention/session
fixtures covering ordering, horizon, and gap edge cases."""

from __future__ import annotations

import datetime

from jobanalytics_bigdataproject_spark.operators import behavior
from jobanalytics_bigdataproject_spark.operators.analytics import reconcile_daily_totals

T0 = datetime.datetime(2024, 1, 1, 12, 0, 0)


def _events(spark, rows):
    """rows: (event_id, user_id, event_type, seconds_after_T0)"""
    return spark.createDataFrame(
        [(eid, T0 + datetime.timedelta(seconds=s), uid, et, 1.0, "{}")
         for eid, uid, et, s in rows],
        ["event_id", "ts", "user_id", "event_type", "value", "props"],
    )


def test_funnel_ordering_and_horizon(spark):
    df = _events(
        spark,
        [
            # user 1: full ordered conversion
            (1, 1, "view", 0), (2, 1, "click", 10), (3, 1, "purchase", 20),
            # user 2: purchase BEFORE any click → stops at view
            (4, 2, "view", 0), (5, 2, "purchase", 5),
            # user 3: click only → never enters the funnel
            (6, 3, "click", 0),
            # user 4: click outside the 1-day horizon → stops at view
            (7, 4, "view", 0), (8, 4, "click", 2 * 86400),
        ],
    )
    out = {r.step: r for r in behavior.funnel(df).collect()}
    assert (out["view"].n_users, out["click"].n_users, out["purchase"].n_users) == (3, 1, 1)
    assert out["view"].conv_bp == 10000
    assert out["click"].conv_bp == out["purchase"].conv_bp == 3333  # 10000*1 div 3


def test_funnel_click_after_first_view_only(spark):
    # click precedes the FIRST view but follows none → not a conversion
    df = _events(spark, [(1, 1, "click", 0), (2, 1, "view", 10)])
    out = {r.step: r for r in behavior.funnel(df).collect()}
    assert out["view"].n_users == 1 and out["click"].n_users == 0


def test_retention_cohort_triangle(spark):
    day = 86400
    df = _events(
        spark,
        [
            (1, 1, "view", 0), (2, 1, "view", day + 5), (3, 1, "view", 3 * day),
            (4, 2, "view", day), (5, 2, "view", day + 60),
        ],
    )
    out = {(str(r.cohort_day), r.day_offset): r.n_users
           for r in behavior.retention_cohorts(df).collect()}
    assert out == {
        ("2024-01-01", 0): 1, ("2024-01-01", 1): 1, ("2024-01-01", 3): 1,
        ("2024-01-02", 0): 1,
    }


def test_sessionize_gap_boundary(spark):
    df = _events(
        spark,
        [
            (1, 1, "view", 0), (2, 1, "view", 100),
            (3, 1, "view", 100 + 1800),          # gap == 1800s → NEW session
            (4, 1, "view", 100 + 1800 + 1799),   # gap 1799s → same session
            (5, 2, "view", 50),
        ],
    )
    rows = {(r.user_id, r.session_seq): r for r in behavior.sessionize(df).collect()}
    assert set(rows) == {(1, 1), (1, 2), (2, 1)}
    assert rows[(1, 1)].n_events == 2 and rows[(1, 1)].duration_s == 100
    assert rows[(1, 2)].n_events == 2 and rows[(1, 2)].duration_s == 1799
    assert rows[(2, 1)].n_events == 1 and rows[(2, 1)].duration_s == 0
    assert rows[(1, 2)].session_start == "2024-01-01 12:31:40"


def test_reconcile_daily_totals_both_null_sides(spark):
    orders = spark.createDataFrame(
        [
            (1, datetime.date(2024, 1, 1), 10.00),
            (2, datetime.date(2024, 1, 2), 20.00),
        ],
        ["o_orderkey", "o_orderdate", "o_totalprice"],
    )
    events = _events(
        spark,
        [
            (1, 1, "purchase", 86400),        # 2024-01-02
            (2, 1, "purchase", 2 * 86400),    # 2024-01-03
            (3, 1, "view", 0),                # non-purchase: ignored
        ],
    )
    out = {str(r.day): r for r in reconcile_daily_totals(orders, events).collect()}
    assert out["2024-01-01"].status == "orders_only"
    assert (out["2024-01-01"].order_cents, out["2024-01-01"].event_cents) == (1000, 0)
    assert out["2024-01-02"].status == "both"
    assert out["2024-01-02"].diff_cents == 2000 - 100
    assert out["2024-01-03"].status == "events_only"
    assert out["2024-01-03"].diff_cents == -100


# ---------------------------------------------------------------------------
# transition_matrix / rfm_segments
# ---------------------------------------------------------------------------


def test_transition_matrix_counts_and_probs(spark):
    from datetime import datetime

    from jobanalytics_bigdataproject_spark.operators.behavior import transition_matrix

    def ts(m):
        return datetime(2024, 1, 1, 0, m)

    ev = spark.createDataFrame(
        [
            (1, 1, ts(0), "view"), (1, 2, ts(1), "click"), (1, 3, ts(2), "view"),
            (2, 4, ts(0), "view"), (2, 5, ts(1), "click"), (2, 6, ts(2), "purchase"),
        ],
        "user_id long, event_id long, ts timestamp, event_type string",
    )
    rows = {(r.prev_type, r.next_type): (r.n, r.p) for r in transition_matrix(ev).collect()}
    assert rows == {
        ("view", "click"): (2, 1.0),
        ("click", "view"): (1, 0.5),
        ("click", "purchase"): (1, 0.5),
    }


def test_transition_matrix_no_cross_user_pairs(spark):
    from datetime import datetime

    from jobanalytics_bigdataproject_spark.operators.behavior import transition_matrix

    ev = spark.createDataFrame(
        [(1, 1, datetime(2024, 1, 1), "a"), (2, 2, datetime(2024, 1, 2), "b")],
        "user_id long, event_id long, ts timestamp, event_type string",
    )
    assert transition_matrix(ev).count() == 0  # one event per user -> no pairs


def test_rfm_scores_and_no_global_window(spark, tables):
    from jobanalytics_bigdataproject_spark.operators.behavior import rfm_segments
    from jobanalytics_bigdataproject_spark.plans.inspect import formatted_plan

    df = rfm_segments(tables["orders"])
    plan = formatted_plan(df)
    assert "Window" not in plan, "cutoff bucketing must not use a global window"
    rows = df.collect()
    assert all(1 <= r.r_score <= 4 and 1 <= r.f_score <= 4 and 1 <= r.m_score <= 4 for r in rows)
    # quartile balance: each recency score bucket holds >= 15% of customers
    n = len(rows)
    from collections import Counter

    c = Counter(r.r_score for r in rows)
    assert all(c[s] >= 0.15 * n for s in (1, 2, 3, 4)), c
    # the best customers must be 'loyal', the stale ones 'lapsing'
    for r in rows:
        if r.r_score >= 3 and r.f_score >= 3:
            assert r.segment == "loyal"
        elif r.r_score <= 2:
            assert r.segment == "lapsing"


def test_session_time_per_day_prorates_across_midnight(spark):
    from datetime import datetime

    from pyspark.sql import functions as F

    from jobanalytics_bigdataproject_spark.operators.behavior import session_time_per_day

    ev = spark.createDataFrame(
        [
            # one session 23:50 -> 00:10 next day (gap 1200s < 1800s)
            (1, 1, datetime(2024, 1, 1, 23, 50)),
            (1, 2, datetime(2024, 1, 2, 0, 10)),
            # separate same-day session 12:00 -> 12:05
            (2, 3, datetime(2024, 1, 1, 12, 0)),
            (2, 4, datetime(2024, 1, 1, 12, 5)),
        ],
        "user_id long, event_id long, ts timestamp",
    ).withColumn("value", F.lit(1.0))
    rows = {r.day: (r.engaged_seconds, r.n_session_days, r.n_users)
            for r in session_time_per_day(ev).collect()}
    assert rows == {
        "2024-01-01": (600 + 300, 2, 2),  # 10 min before midnight + 5 min
        "2024-01-02": (600, 1, 1),        # 10 min after midnight
    }


def test_last_touch_attribution_lookback_edges(spark):
    from jobanalytics_bigdataproject_spark.operators.behavior import (
        last_touch_attribution,
    )

    rows = [
        # user 1: click 1 day before purchase -> attributed to click
        (1, "2024-01-01 00:00:00", "click", 1),
        (2, "2024-01-02 00:00:00", "purchase", 1),
        # user 2: view 8 days before purchase -> outside 7d lookback
        (3, "2024-01-01 00:00:00", "view", 2),
        (4, "2024-01-09 00:00:01", "purchase", 2),
        # user 3: purchase with no prior events at all
        (5, "2024-01-05 00:00:00", "purchase", 3),
        # user 4: view then click (same lookback) -> LAST touch (click) wins;
        # an intervening purchase must not become a touch for the second one
        (6, "2024-01-10 00:00:00", "view", 4),
        (7, "2024-01-10 01:00:00", "click", 4),
        (8, "2024-01-10 02:00:00", "purchase", 4),
        (9, "2024-01-10 03:00:00", "purchase", 4),  # prev non-conv is still click
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, event_type string, user_id long"
    ).selectExpr("event_id", "CAST(ts AS TIMESTAMP) AS ts", "event_type", "user_id")
    got = {
        r.attributed_type: (r.n_conversions, r.n_users)
        for r in last_touch_attribution(ev).collect()
    }
    assert got == {"click": (3, 2), "(none)": (2, 2)}


def test_ewma_daily_hand_computed(spark):
    # type "a": days with counts [10, 20, 40]; type "b": single day [5]
    rows = []
    eid = 0
    for day, n in [(1, 10), (2, 20), (3, 40)]:
        for _ in range(n):
            rows.append((eid, f"2024-01-0{day} 12:00:00", "a", 1))
            eid += 1
    for _ in range(5):
        rows.append((eid, "2024-01-02 08:00:00", "b", 2))
        eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, event_type string, user_id long"
    ).selectExpr("event_id", "CAST(ts AS TIMESTAMP) AS ts", "event_type", "user_id")
    got = {r.event_type: (r.n_days, r.ewma_micro) for r in behavior.ewma_daily(ev).collect()}
    # alpha=0.3: acc0=10e6; acc1=(10e6*7+20e6*3)//10=13e6; acc2=(13e6*7+40e6*3)//10=21.1e6
    assert got == {"a": (3, 21_100_000), "b": (1, 5_000_000)}


def test_holt_daily_hand_computed(spark):
    # counts [10, 20, 40] -> scaled micro: l0=10e6, b0=0
    # step2: l=(3*20e6+7*10e6)//10=13e6, b=(2*3e6+0)//10=0.6e6
    # step3: l=(3*40e6+7*13.6e6)//10=21.52e6, b=(2*8.52e6+8*0.6e6)//10=2.184e6
    rows = []
    eid = 0
    for day, n in [(1, 10), (2, 20), (3, 40)]:
        for _ in range(n):
            rows.append((eid, f"2024-01-0{day} 12:00:00", "a", 1))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, event_type string, user_id long"
    ).selectExpr("event_id", "CAST(ts AS TIMESTAMP) AS ts", "event_type", "user_id")
    r = behavior.holt_daily(ev).collect()[0]
    assert (r.n_days, r.level_micro, r.trend_micro) == (3, 21_520_000, 2_184_000)
    assert r.forecast_next_micro == 21_520_000 + 2_184_000


def test_contingency_audit_hand_case(spark):
    from pyspark.sql import functions as F

    from jobanalytics_bigdataproject_spark.operators.behavior import contingency_audit

    # 2 types x 2 weekdays (2024-01-01 Mon, 2024-01-02 Tue):
    #   A: Mon 3, Tue 1;  B: Mon 1, Tue 3  -> every E = 4*4/8 = 2
    rows = (
        [("A", "2024-01-01 10:00:00")] * 3 + [("A", "2024-01-02 10:00:00")]
        + [("B", "2024-01-01 10:00:00")] + [("B", "2024-01-02 10:00:00")] * 3
    )
    ev = spark.createDataFrame(rows, "event_type string, ts_s string").select(
        "event_type", F.col("ts_s").cast("timestamp").alias("ts")
    )
    out = {(r.event_type, r.dow): r for r in contingency_audit(ev).collect()}
    assert len(out) == 4
    mon_a = out[("A", 2)]  # Spark dayofweek: Monday = 2
    assert mon_a.observed == 3
    assert mon_a.expected_micro == 2_000_000
    # dev = (O*G - R*C)*1e4 / (R*C) = (24-16)*1e4/16 = 5000 bp over expected
    assert mon_a.dev_bp == 5000
    # chi2 cell = (3-2)^2/2 = 0.5 -> 500000 micro
    assert mon_a.chi2_micro == 500_000
    tue_a = out[("A", 3)]
    assert (tue_a.observed, tue_a.dev_bp, tue_a.chi2_micro) == (1, -5000, 500_000)
    # symmetric table: total chi2 = 4 * 0.5 = 2.0
    assert sum(r.chi2_micro for r in out.values()) == 2_000_000
