"""Round-3 analytic extensions: TPC-H Q7/Q10 join shapes, the
RANGE-interval rolling window, integer-exact daily anomaly flagging,
dense-grid hourly gap-fill, and corpus-unigram log-prob scoring.
Value-exactness vs DuckDB is the correctness gate's job
(tools/check_correctness.py); these tests pin semantics on constructed
inputs and the plan shapes on the fixture tables."""

from __future__ import annotations

import math
from datetime import datetime

from pyspark.sql import functions as F

from jobanalytics_bigdataproject_spark.operators import analytics, behavior, corpus
from jobanalytics_bigdataproject_spark.plans.inspect import (
    count_exchanges,
    formatted_plan,
    has_broadcast_hash_join,
)


def _ts(s):
    return datetime.fromisoformat(s)


# ---------------------------------------------------------------------------
# TPC-H Q7 / Q10
# ---------------------------------------------------------------------------


def test_q7_only_cross_pairs_and_broadcast_nation(spark, tables):
    df = analytics.tpch_q7_volume_shipping(
        tables["customer"], tables["orders"], tables["lineitem"],
        tables["supplier"], tables["nation"],
    )
    rows = df.collect()
    pairs = {(r.supp_nation, r.cust_nation) for r in rows}
    assert pairs <= {("NATION_1", "NATION_2"), ("NATION_2", "NATION_1")}
    assert all(r.l_year in (1996, 1997) for r in rows)
    assert all(r.revenue > 0 for r in rows)
    assert has_broadcast_hash_join(df)


def test_q10_topk_descending_revenue(spark, tables):
    df = analytics.tpch_q10_returned_items(
        tables["customer"], tables["orders"], tables["lineitem"], tables["nation"]
    )
    rows = df.collect()
    assert 0 < len(rows) <= 20
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)
    # top-k must be TakeOrderedAndProject, never a global sort
    assert "TakeOrderedAndProject" in formatted_plan(df)


# ---------------------------------------------------------------------------
# customer_rolling_spend (RANGE-interval frame)
# ---------------------------------------------------------------------------


def test_rolling_spend_window_semantics(spark):
    orders = spark.createDataFrame(
        [
            (1, 10, 100.0, _ts("2024-01-01")),
            (2, 10, 50.0, _ts("2024-02-15")),   # 45 days later: inside 90d
            (3, 10, 25.0, _ts("2024-06-01")),   # >90d after both: alone
            (4, 20, 10.0, _ts("2024-01-01")),
            (5, 20, 10.0, _ts("2024-01-01")),   # same-day peer: summed both rows
        ],
        ["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"],
    )
    out = {
        r.o_orderkey: r.spend_90d
        for r in analytics.customer_rolling_spend(orders).collect()
    }
    assert out[1] == 100.0
    assert out[2] == 150.0
    assert out[3] == 25.0
    # RANGE frame includes all peers of the current row's order value
    assert out[4] == 20.0 and out[5] == 20.0


def test_rolling_spend_single_exchange(spark, tables):
    df = analytics.customer_rolling_spend(tables["orders"])
    assert count_exchanges(df) == 1  # one hash partition by customer


# ---------------------------------------------------------------------------
# events_daily_anomaly
# ---------------------------------------------------------------------------


def test_daily_anomaly_flags_spike_exactly(spark):
    # 9 quiet days of 10 + one day of 100: mean=19, pop-std ~27 ⇒ spike z≈3
    rows = []
    eid = 0
    for d in range(1, 10):
        for _ in range(10):
            rows.append((eid, _ts(f"2024-01-{d:02d} 12:00:00"), 1, "click", 1.0, "{}"))
            eid += 1
    for _ in range(100):
        rows.append((eid, _ts("2024-01-10 12:00:00"), 1, "click", 1.0, "{}"))
        eid += 1
    events = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    out = {r.day: r.is_anomaly for r in behavior.daily_anomaly(events).collect()}
    assert out["2024-01-10"] is True
    assert all(not v for d, v in out.items() if d != "2024-01-10")
    # integer z-test agrees with the float formula on this fixture
    cnts = [10] * 9 + [100]
    mu = sum(cnts) / 10
    sd = math.sqrt(sum((c - mu) ** 2 for c in cnts) / 10)
    assert abs(100 - mu) > 2 * sd and abs(10 - mu) <= 2 * sd


# ---------------------------------------------------------------------------
# events_hourly_gapfill
# ---------------------------------------------------------------------------


def test_gapfill_dense_grid_and_ffill(spark):
    events = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:10:00"), 1, "click", 1.0, "{}"),
            (2, _ts("2024-01-01 03:20:00"), 1, "click", 1.0, "{}"),
            (3, _ts("2024-01-01 01:00:00"), 1, "view", 1.0, "{}"),
        ],
        ["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    out = behavior.hourly_gapfill(events).collect()
    # grid spans 00:00..03:00 for BOTH types: 4 hours x 2 types
    assert len(out) == 8
    clicks = {r.hour: r for r in out if r.event_type == "click"}
    assert [clicks[h].cnt for h in sorted(clicks)] == [1, 0, 0, 1]
    # empty hours carry the last seen event id forward
    assert [clicks[h].last_event_id for h in sorted(clicks)] == [1, 1, 1, 2]
    views = {r.hour: r for r in out if r.event_type == "view"}
    # hour before the first view event: zero count, no id yet
    assert views["2024-01-01 00:00:00"].cnt == 0
    assert views["2024-01-01 00:00:00"].last_event_id is None
    assert views["2024-01-01 01:00:00"].last_event_id == 3


# ---------------------------------------------------------------------------
# docs_unigram_logprob
# ---------------------------------------------------------------------------


def test_unigram_logprob_hand_computed(spark):
    docs = spark.createDataFrame(
        [(1, "aa aa bb"), (2, "aa cc")],
        ["doc_id", "text"],
    )
    # corpus: aa x3, bb x1, cc x1, total 5
    out = {r.doc_id: r for r in corpus.unigram_logprob(docs).collect()}
    lp = {
        "aa": round(math.log(3 / 5) * 1e6),
        "bb": round(math.log(1 / 5) * 1e6),
        "cc": round(math.log(1 / 5) * 1e6),
    }
    exp1 = round(100.0 * (2 * lp["aa"] + lp["bb"]) / 3) / 100.0
    exp2 = round(100.0 * (lp["aa"] + lp["cc"]) / 2) / 100.0
    assert out[1].n_tokens == 3 and out[1].avg_lp_micro == exp1
    assert out[2].n_tokens == 2 and out[2].avg_lp_micro == exp2
    # more typical docs (heavier on frequent tokens) must score higher
    assert out[1].avg_lp_micro > out[2].avg_lp_micro


def test_bigram_logprob_hand_computed(spark):
    docs = spark.createDataFrame(
        [(1, "aa bb aa bb"), (2, "aa cc"), (3, "dd")],
        ["doc_id", "text"],
    )
    # bigrams: doc1 = (aa,bb)x2 (bb,aa)x1; doc2 = (aa,cc)x1; doc3 none (<2 toks)
    # c_ctx: aa->3, bb->1; V = |{aa,bb,cc}| = 3 (dd never in a bigram)
    out = {r.doc_id: r for r in corpus.bigram_logprob(docs).collect()}
    lp = {
        ("aa", "bb"): round(math.log((2 + 1) / (3 + 3)) * 1e6),
        ("bb", "aa"): round(math.log((1 + 1) / (1 + 3)) * 1e6),
        ("aa", "cc"): round(math.log((1 + 1) / (3 + 3)) * 1e6),
    }
    exp1 = round(100.0 * (2 * lp[("aa", "bb")] + lp[("bb", "aa")]) / 3) / 100.0
    exp2 = round(100.0 * lp[("aa", "cc")] / 1) / 100.0
    assert out[1].n_bigrams == 3 and out[1].avg_lp_micro == exp1
    assert out[2].n_bigrams == 1 and out[2].avg_lp_micro == exp2
    assert 3 not in out  # single-token doc has no bigrams
    # the doc made of the corpus's dominant bigram scores higher
    assert out[1].avg_lp_micro > out[2].avg_lp_micro


# ---------------------------------------------------------------------------
# docs_temperature_mix / nation_price_quartiles
# ---------------------------------------------------------------------------


def test_temperature_mix_upweights_rare_sources(spark, tables):
    docs = tables["documents"]
    kept = corpus.temperature_mix(docs, temperature=0.7, target_frac=0.5)
    rates = {
        r.source: r.rate_bp for r in kept.select("source", "rate_bp").distinct().collect()
    }
    counts = {r.source: r.n for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    # T<1: rarer source must get a keep-rate >= a more common source's
    srcs = sorted(counts, key=counts.get)
    for rare, common in zip(srcs, srcs[1:]):
        if rare in rates and common in rates:
            assert rates[rare] >= rates[common]
    # deterministic: same rows on a second evaluation
    a = sorted(r.doc_id for r in kept.collect())
    b = sorted(r.doc_id for r in corpus.temperature_mix(docs).collect())
    assert a == b and len(a) > 0


def test_nation_quartiles_ordered(spark, tables):
    rows = analytics.nation_price_quartiles(
        tables["orders"], tables["customer"], tables["nation"]
    ).collect()
    assert len(rows) == 25
    for r in rows:
        assert r.p25 <= r.p50 <= r.p75
        assert r.n_orders > 0


# ---------------------------------------------------------------------------
# part_cheapest_supplier / orders_price_histogram
# ---------------------------------------------------------------------------


def test_argmin_deterministic_on_price_ties(spark):
    li = spark.createDataFrame(
        [
            (1, 100, 7, 50.0),
            (1, 100, 3, 50.0),   # tie on price: lower suppkey must win
            (1, 100, 9, 40.0),
            (2, 200, 5, 10.0),
        ],
        ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice"],
    )
    out = {r.l_partkey: r for r in analytics.part_cheapest_supplier(li).collect()}
    assert out[100].cheapest_suppkey == 9 and out[100].min_price == 40.0
    assert out[100].n_lines == 3
    assert out[200].cheapest_suppkey == 5
    # ties resolve to the smallest suppkey, not an arbitrary peer
    li2 = li.filter("l_extendedprice >= 50.0")
    out2 = {r.l_partkey: r for r in analytics.part_cheapest_supplier(li2).collect()}
    assert out2[100].cheapest_suppkey == 3


def test_histogram_bucket_edges(spark):
    orders = spark.createDataFrame(
        [(i, 1, s, v, _ts("2024-01-01"), "P") for i, (s, v) in enumerate(
            [("O", -5.0), ("O", 0.0), ("O", 49999.99), ("O", 50000.0), ("O", 600000.0)]
        )],
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"],
    )
    out = {r.bucket: r.n_orders for r in analytics.orders_price_histogram(orders).collect()}
    # -5 underflows to 0; 0 and 49999.99 in bucket 1; 50000 starts bucket 2;
    # hi itself overflows to n+1
    assert out == {0: 1, 1: 2, 2: 1, 13: 1}


# ---------------------------------------------------------------------------
# plan-shape regression gates for the round-3 operators
# ---------------------------------------------------------------------------


def test_round3_exchange_budgets(spark, tables):
    """Lock the shuffle budget of each new operator: a regression that adds
    an exchange (e.g. a presentation sort on a fact-sized output) fails
    here before it costs anything at scale."""
    from jobanalytics_bigdataproject_spark.operators import dedup, scd, similarity

    budgets = {
        # argmin: ONE groupBy exchange, no output sort
        "cheapest": (analytics.part_cheapest_supplier(tables["lineitem"]), 1),
        # histogram: count agg + 14-row presentation sort
        "histogram": (analytics.orders_price_histogram(tables["orders"]), 2),
        # derivation + compaction share one per-key partitioning
        "scd2_compact": (
            scd.scd2_compact(
                scd.scd2_from_log(tables["events"], collapse=False), "2024-01-16"
            ),
            1,
        ),
        # vocab agg + scalar + doc rollup (join reuses vocab partitioning)
        "unigram": (corpus.unigram_logprob(tables["documents"]), 4),
        # per-dim means (+2 tiny scalar aggs) + per-vector window
        "centered": (similarity.center_embeddings(tables["embeddings"]), 3),
        # swept in round 3: one 16-byte-key exchange, no output sort
        "exact_dup_groups": (dedup.exact_dup_groups(tables["documents"]), 1),
        # per-user windows + per-session rollup share one partitioning
        "sessionize": (behavior.sessionize(tables["events"]), 1),
    }
    for name, (df, budget) in budgets.items():
        n = count_exchanges(df)
        assert n <= budget, f"{name}: {n} exchanges > budget {budget}"


def test_round3_broadcasts(spark, tables):
    """Dimension/rate/grid sides must broadcast — the fact side never
    shuffles for these joins."""
    from jobanalytics_bigdataproject_spark.operators import behavior as bh

    assert has_broadcast_hash_join(corpus.temperature_mix(tables["documents"]))
    assert has_broadcast_hash_join(bh.hourly_gapfill(tables["events"]))
    assert has_broadcast_hash_join(
        analytics.tpch_q10_returned_items(
            tables["customer"], tables["orders"], tables["lineitem"], tables["nation"]
        )
    )


# ---------------------------------------------------------------------------
# first/last/nth window + exact correlation
# ---------------------------------------------------------------------------


def test_first_last_orders_semantics(spark):
    orders = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01"), 100.0),
            (1, 11, _ts("2024-02-01"), 200.0),
            (1, 12, _ts("2024-03-01"), 300.0),
            (2, 13, _ts("2024-01-15"), 50.0),
        ],
        "o_custkey long, o_orderkey long, o_orderdate timestamp, o_totalprice double",
    )
    rows = {r.o_custkey: r for r in analytics.first_last_orders(orders).collect()}
    assert (rows[1].first_price, rows[1].last_price, rows[1].second_price,
            rows[1].n_orders) == (100.0, 300.0, 200.0, 3)
    assert (rows[2].first_price, rows[2].last_price, rows[2].second_price) == (
        50.0, 50.0, None)


def test_price_qty_corr_matches_numpy_and_is_bounded(spark, tables):
    import numpy as np

    rows = analytics.price_quantity_corr(tables["lineitem"]).collect()
    assert rows and all(-1.0 <= r.price_qty_corr <= 1.0 for r in rows)
    pdf = tables["lineitem"].select(
        "l_returnflag", "l_extendedprice", "l_quantity"
    ).toPandas()
    for r in rows:
        g = pdf[pdf.l_returnflag == r.l_returnflag]
        x = np.round(g.l_extendedprice.to_numpy() * 100)
        y = np.round(g.l_quantity.to_numpy() * 100)
        want = np.corrcoef(x, y)[0, 1]
        assert abs(r.price_qty_corr - want) < 1e-4


def test_pareto_frontier_matches_brute_force_with_ties_and_dups(spark):
    import itertools

    pts = [
        (1, 10, 5), (2, 10, 5),   # duplicate points: both kept
        (3, 10, 7),               # same x, worse y: dominated
        (4, 8, 9), (5, 12, 3),    # frontier members
        (6, 9, 9),                # dominated by (4,8,9)? x=9>8,y=9==9 -> dominated
        (7, 20, 1),
    ]
    df = spark.createDataFrame(pts, "id long, xv long, yv long")
    got = {
        (r.id, r.x, r.y)
        for r in analytics.pareto_frontier(
            df, F.col("xv"), F.col("yv"), ["id"], shards=3
        ).collect()
    }
    brute = set()
    for a in pts:
        dominated = any(
            b[1] <= a[1] and b[2] <= a[2] and (b[1] < a[1] or b[2] < a[2])
            for b in pts
        )
        if not dominated:
            brute.add((a[0], a[1], a[2]))
    assert got == brute


def test_pareto_frontier_invariant_under_sharding(spark, tables):
    args = (F.round(F.col("p_retailprice") * 100).cast("long"),
            F.col("p_size").cast("long"), ["p_partkey"])
    r1 = analytics.pareto_frontier(tables["part"], *args, shards=2).collect()
    r64 = analytics.pareto_frontier(tables["part"], *args, shards=64).collect()
    assert sorted(map(tuple, r1)) == sorted(map(tuple, r64))


def test_late_round3_exchange_budgets(spark, tables):
    """Shuffle budgets for the late-round operators (same regression
    discipline as test_round3_exchange_budgets)."""
    from pyspark.sql import functions as F

    from jobanalytics_bigdataproject_spark.operators import (
        corpus as cp,
        joins,
        sampling,
        tpch,
    )
    from jobanalytics_bigdataproject_spark.operators.behavior import (
        dow_seasonality,
        rfm_segments,
        session_time_per_day,
        time_to_convert,
        transition_matrix,
    )

    budgets = {
        # chunking: zero data shuffles + presentation sort
        "chunking": (cp.chunk_documents(tables["documents"]), 1),
        # lag window + pair agg + per-prev window + presentation sort
        "transition": (transition_matrix(tables["events"]), 4),
        # the per-user frame feeds BOTH the cutoff agg and the final
        # select, so its groupBy exchange (and the ref-date agg upstream)
        # appears twice in the static plan (5 total); Spark's
        # ReuseExchange dedupes identical subtrees at runtime
        "rfm": (rfm_segments(tables["orders"]), 5),
        # session windows + day rollup
        "session_day": (session_time_per_day(tables["events"]), 3),
        # user window + converting-user agg + scalar agg
        "ttc": (time_to_convert(tables["events"]), 3),
        # daily agg + dow profile agg (broadcast back) + sort
        "dow": (dow_seasonality(tables["events"]), 4),
        # md5-rank window + WindowGroupLimit
        "k_per_group": (
            sampling.deterministic_k_per_group(tables["documents"], "source", "doc_id", 5),
            1,
        ),
        # q6: pure scan-agg — a single one-row exchange at most
        "q6": (tpch.q6_forecast_revenue(tables["lineitem"]), 1),
        # q13: custkey agg + c_count agg + sort
        "q13": (tpch.q13_customer_distribution(tables["customer"], tables["orders"]), 4),
    }
    for name, (df, budget) in budgets.items():
        n = count_exchanges(df)
        assert n <= budget, f"{name}: {n} exchanges > budget {budget}"


def test_yoy_revenue_growth_hand_computed(spark):
    from jobanalytics_bigdataproject_spark.operators.analytics import yoy_revenue_growth

    li = spark.createDataFrame(
        [
            ("1995-03-01", 100.0), ("1995-07-01", 150.0),   # 1995: 250.00
            ("1996-01-01", 500.0),                            # 1996: 500.00 -> +100%
            ("1997-06-15", 250.0),                            # 1997: 250.00 -> -50%
        ],
        "l_shipdate string, l_extendedprice double",
    ).selectExpr("CAST(l_shipdate AS TIMESTAMP) AS l_shipdate", "l_extendedprice")
    rows = yoy_revenue_growth(li).collect()
    assert [(r.year, r.revenue, r.growth_bp) for r in rows] == [
        (1995, 250.0, None),
        (1996, 500.0, 10000),
        (1997, 250.0, -5000),
    ]
