"""TPC-H batch-2 shapes (operators/tpch.py): Q4/Q6/Q8/Q12/Q13/Q15/Q16/
Q17/Q18/Q21/Q22 adapted to the fixture schema.  Value-exactness vs DuckDB
is the correctness gate's job (tools/check_correctness.py); these tests
pin the *semantics* on constructed inputs and the *plan shapes* (pushdown,
broadcast, no single-partition windows) on the fixture tables."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from jobanalytics_bigdataproject_spark.operators import tpch
from jobanalytics_bigdataproject_spark.plans.inspect import (
    formatted_plan,
    has_broadcast_hash_join,
)


def _ts(s):
    return datetime.fromisoformat(s)


# ---------------------------------------------------------------------------
# semantics on constructed frames
# ---------------------------------------------------------------------------


def test_q4_counts_orders_once_regardless_of_late_line_count(spark):
    """An order with 3 late lines must count once (semi-join, not inner)."""
    orders = spark.createDataFrame(
        [
            (1, "1-URGENT", _ts("1996-02-01")),
            (2, "1-URGENT", _ts("1996-02-01")),
            (3, "5-LOW", _ts("1995-01-01")),  # outside window
        ],
        "o_orderkey long, o_orderpriority string, o_orderdate timestamp",
    )
    lineitem = spark.createDataFrame(
        [(1, _ts("1996-06-01"))] * 3 + [(2, _ts("1996-02-10"))],
        "l_orderkey long, l_shipdate timestamp",
    )
    rows = tpch.q4_order_priority(orders, lineitem).collect()
    assert [(r.o_orderpriority, r.order_count) for r in rows] == [("1-URGENT", 1)]


def test_q13_keeps_zero_order_customers(spark):
    """The excluded-priority predicate must live in the join condition:
    a customer whose only orders are excluded lands in the c_count=0 bin."""
    customer = spark.createDataFrame([(1,), (2,), (3,)], "c_custkey long")
    orders = spark.createDataFrame(
        [
            (10, 1, "1-URGENT"),
            (11, 1, "1-URGENT"),
            (12, 2, "4-NOT SPECIFIED"),  # excluded -> cust 2 has 0
        ],
        "o_orderkey long, o_custkey long, o_orderpriority string",
    )
    dist = {
        r.c_count: r.custdist
        for r in tpch.q13_customer_distribution(customer, orders).collect()
    }
    assert dist == {2: 1, 0: 2}


def test_q15_keeps_all_tied_max_suppliers(spark):
    lineitem = spark.createDataFrame(
        [
            (1, 100.0, 0.0, _ts("1996-02-01")),
            (2, 100.0, 0.0, _ts("1996-02-01")),
            (3, 50.0, 0.0, _ts("1996-02-01")),
            (1, 999.0, 0.0, _ts("1995-01-01")),  # outside window
        ],
        "l_suppkey long, l_extendedprice double, l_discount double, l_shipdate timestamp",
    )
    supplier = spark.createDataFrame(
        [(1, "s1"), (2, "s2"), (3, "s3")], "s_suppkey long, s_name string"
    )
    rows = tpch.q15_top_supplier(lineitem, supplier).collect()
    assert [(r.s_suppkey, r.total_revenue) for r in rows] == [(1, 100.0), (2, 100.0)]


def test_q17_threshold_is_per_part(spark):
    """Part A avg qty 10 (thresh 2) — its qty-1 line qualifies; part B avg
    qty 1 (thresh 0.2) — nothing qualifies despite identical quantities."""
    part = spark.createDataFrame(
        [(1, "Brand#2", "SMALL"), (2, "Brand#2", "SMALL")],
        "p_partkey long, p_brand string, p_type string",
    )
    lineitem = spark.createDataFrame(
        [
            (1, 19.0, 700.0),
            (1, 1.0, 700.0),  # 1 < 0.2*10=2  -> qualifies
            (2, 1.0, 700.0),  # 1 < 0.2*1=0.2 -> no
        ],
        "l_partkey long, l_quantity double, l_extendedprice double",
    )
    rows = tpch.q17_small_quantity_revenue(lineitem, part).collect()
    assert rows[0].avg_yearly == 100.0  # one qualifying $700 line / 7 years


def test_q21_sole_late_supplier_semantics(spark):
    """Order 1: supplier 1 late, supplier 2 on time -> counts for 1.
    Order 2: suppliers 1 and 3 both late -> counts for nobody.
    Order 3: single-supplier order, late -> no other supplier, excluded."""
    nation = spark.createDataFrame([(0, "NATION_1")], "n_nationkey long, n_name string")
    supplier = spark.createDataFrame(
        [(1, "s1", 0), (2, "s2", 0), (3, "s3", 0)],
        "s_suppkey long, s_name string, s_nationkey long",
    )
    orders = spark.createDataFrame(
        [(1, "F", _ts("1996-01-01")), (2, "F", _ts("1996-01-01")), (3, "F", _ts("1996-01-01"))],
        "o_orderkey long, o_orderstatus string, o_orderdate timestamp",
    )
    late, ontime = _ts("1996-06-01"), _ts("1996-01-15")
    lineitem = spark.createDataFrame(
        [(1, 1, late), (1, 2, ontime), (2, 1, late), (2, 3, late), (3, 1, late)],
        "l_orderkey long, l_suppkey long, l_shipdate timestamp",
    )
    rows = tpch.q21_waiting_supplier(supplier, lineitem, orders, nation).collect()
    assert [(r.s_name, r.numwait) for r in rows] == [("s1", 1)]


def test_q22_anti_join_is_against_recent_orders_only(spark):
    customer = spark.createDataFrame(
        [(1, "Customer#000000100", 5000.0), (2, "Customer#000000102", 5000.0),
         (3, "Customer#000000104", 1.0)],
        "c_custkey long, c_name string, c_acctbal double",
    )
    orders = spark.createDataFrame(
        [(10, 1, _ts("2001-01-01")),   # cust 1 recent -> not idle
         (11, 2, _ts("1996-01-01"))],  # cust 2 old only -> idle
        "o_orderkey long, o_custkey long, o_orderdate timestamp",
    )
    rows = tpch.q22_idle_customers(customer, orders).collect()
    assert [(r.cntrycode, r.numcust, r.totacctbal) for r in rows] == [("02", 1, 5000.0)]


def test_q12_high_low_split_partitions_every_line(spark, tables):
    df = tpch.q12_priority_shipping(tables["orders"], tables["lineitem"])
    rows = df.collect()
    joined_total = (
        tables["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(tables["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .count()
    )
    assert sum(r.high_line_count + r.low_line_count for r in rows) == joined_total


def test_q8_share_bounded_and_total_covers_market(spark, tables):
    rows = tpch.q8_market_share(
        tables["customer"], tables["orders"], tables["lineitem"],
        tables["supplier"], tables["nation"], tables["region"],
    ).collect()
    assert rows, "EUROPE market must be non-empty"
    assert all(0.0 <= r.mkt_share <= 1.0 for r in rows)
    years = [r.o_year for r in rows]
    assert years == sorted(years)


# ---------------------------------------------------------------------------
# plan shapes on the fixture tables
# ---------------------------------------------------------------------------


def test_q6_filters_push_to_parquet_scan(spark, tables):
    df = tpch.q6_forecast_revenue(tables["lineitem"])
    plan = formatted_plan(df)
    assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters", 1)[1][:400]
    # 4-column projection, never the full table
    assert "l_returnflag" not in plan.split("ReadSchema", 1)[1][:400]


def test_q15_no_single_partition_window(spark, tables):
    df = tpch.q15_top_supplier(tables["lineitem"], tables["supplier"])
    plan = formatted_plan(df)
    assert "Window" not in plan, "global max must be an aggregate, not a window"
    assert has_broadcast_hash_join(df)


def test_q18_broadcasts_having_survivors(spark, tables):
    df = tpch.q18_large_volume_customers(
        tables["customer"], tables["orders"], tables["lineitem"], min_qty=100.0
    )
    assert has_broadcast_hash_join(df)
    assert "TakeOrderedAndProject" in formatted_plan(df)


def test_q16_anti_join_and_partial_distinct(spark, tables):
    df = tpch.q16_supplier_variety(
        tables["lineitem"], tables["part"], tables["supplier"]
    )
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    rows = df.collect()
    assert all(r.supplier_cnt >= 1 for r in rows)
    assert all(r.p_brand != "Brand#1" and r.p_type != "PROMO" for r in rows)


def test_q9_profit_is_revenue_minus_retail_cost(spark):
    """One line: qty 2 at retail 10.00, sold for 30.00 undiscounted →
    profit 30.00 − 20.00 = 10.00, keyed to the supplier nation / order year."""
    lineitem = spark.createDataFrame(
        [(100, 1, 1, 2.0, 30.0, 0.0)],
        "l_orderkey long, l_partkey long, l_suppkey long,"
        " l_quantity double, l_extendedprice double, l_discount double",
    )
    part = spark.createDataFrame(
        [(1, "red widget", 10.0), (2, "blue bolt", 5.0)],
        "p_partkey long, p_name string, p_retailprice double",
    )
    supplier = spark.createDataFrame([(1, 7)], "s_suppkey long, s_nationkey int")
    nation = spark.createDataFrame([(7, "NATION_7")], "n_nationkey int, n_name string")
    orders = spark.createDataFrame(
        [(100, _ts("1996-03-01"))], "o_orderkey long, o_orderdate timestamp"
    )
    rows = tpch.q9_product_profit(lineitem, part, supplier, nation, orders).collect()
    assert [(r.nation, r.o_year, r.sum_profit) for r in rows] == [("NATION_7", 1996, 10.0)]


def test_q9_name_filter_and_broadcast_dims(spark, tables):
    df = tpch.q9_product_profit(
        tables["lineitem"], tables["part"], tables["supplier"],
        tables["nation"], tables["orders"],
    )
    assert has_broadcast_hash_join(df)
    # non-matching part names contribute nothing
    assert df.count() > 0


def test_q11_threshold_is_against_nation_total(spark):
    """part 1 carries 9999/10000 of the value, part 2 only 1/10000 —
    at 1000 ppm only part 1 survives; lines from other nations' suppliers
    are excluded entirely."""
    lineitem = spark.createDataFrame(
        [(1, 1, 1, 9999.0), (2, 2, 1, 1.0), (3, 1, 2, 500.0)],
        "l_orderkey long, l_partkey long, l_suppkey long, l_extendedprice double",
    )
    supplier = spark.createDataFrame(
        [(1, 3), (2, 4)], "s_suppkey long, s_nationkey int"
    )
    nation = spark.createDataFrame(
        [(3, "NATION_3"), (4, "NATION_4")], "n_nationkey int, n_name string"
    )
    rows = tpch.q11_important_stock(lineitem, supplier, nation).collect()
    assert [(r.l_partkey, r.stock_value) for r in rows] == [(1, 9999.0)]


def test_q11_total_reuses_partkey_exchange(spark, tables):
    """The global total must not rescan/re-shuffle lineitem at runtime:
    after execution, AQE's final plan reuses the partkey exchange for the
    total branch (ReusedExchange), leaving one live corpus scan."""
    df = tpch.q11_important_stock(
        tables["lineitem"], tables["supplier"], tables["nation"]
    )
    assert len(df.collect()) > 0  # execute THIS plan (count() plans separately)
    plan = formatted_plan(df)  # post-execution: adaptive final plan
    assert "ReusedExchange" in plan, "total branch recomputed the corpus aggregate"
    assert has_broadcast_hash_join(df)
