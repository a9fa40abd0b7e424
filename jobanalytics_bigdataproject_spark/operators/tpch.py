"""TPC-H-shaped analytic queries, part 2 [EXT].

The reference exercises exactly one join (`code/01_DataPreprocessing.scala:
177-179`); SURVEY.md §2.3 commits this engine to the full equi/semi/anti
join family because the star-schema `queries()` need them.  Q3/Q5/Q7/Q10/
Q14/Q19 live in ``operators/analytics.py``; this module completes the
remaining TPC-H query *shapes* that the fixture schema can express
(no partsupp table, no l_commitdate/l_shipmode columns — those queries are
adapted, and each docstring states the adaptation).

Determinism: every money aggregate uses the integer-cents discipline from
``functions/exact.py`` so the DuckDB oracle hash-matches bit-for-bit
regardless of partitioning (the same property that makes results stable
across cluster sizes at 100 TB).

Scale notes per query state the intended 1000-executor plan: which side
broadcasts, where the shuffles land, and why no driver-side collect exists
anywhere in this module.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from jobanalytics_bigdataproject_spark.functions.exact import cents, exact_div, money_sum
from jobanalytics_bigdataproject_spark.operators.analytics import revenue_cents


def q4_order_priority(
    orders: DataFrame,
    lineitem: DataFrame,
    start: str = "1996-01-01",
    end: str = "1996-07-01",
) -> DataFrame:
    """TPC-H Q4 shape: priority distribution of orders with at least one
    late-shipped line (EXISTS semi-join).

    Adaptation: the fixture has no ``l_commitdate``/``l_receiptdate``, so
    "late" is ``l_shipdate > o_orderdate + 60 days`` (shipped more than two
    months after ordering).

    Scale: the date filter prunes the orders scan; the semi-join shuffles
    both sides on orderkey but emits each order at most once (no
    fan-out), and the final groupBy is a 5-row hash aggregate with
    map-side partials.
    """
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit(start).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(end).cast("timestamp"))
    )
    # Timestamp-preserving lateness: `o_orderdate + INTERVAL` keeps the
    # time-of-day, matching the oracle's `+ INTERVAL 60 DAY`; F.date_add
    # would truncate to midnight and silently diverge on intraday orders
    # (ADVICE r3).
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(lineitem, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q6_forecast_revenue(
    lineitem: DataFrame,
    start: str = "1996-01-01",
    end: str = "1997-01-01",
    disc_lo: float = 0.05,
    disc_hi: float = 0.07,
    max_qty: float = 24.0,
) -> DataFrame:
    """TPC-H Q6: potential revenue increase from eliminating discounts in a
    band — a pure scan+filter+scalar-aggregate.

    Scale: the canonical pushdown showcase — all three predicates reach the
    parquet reader (PushedFilters), only 4 columns are read, the aggregate
    is a single map-side partial per partition plus one exchange of one row
    per partition.  Revenue = Σ round(extprice·discount) in exact cents.
    """
    disc_cents = F.round(F.col("l_extendedprice") * F.col("l_discount") * 100).cast("long")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(start).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(end).cast("timestamp"))
            & (F.col("l_discount").between(disc_lo, disc_hi))
            & (F.col("l_quantity") < max_qty)
        )
        .agg(
            (F.sum(disc_cents) / F.lit(100.0)).alias("revenue"),
            F.count("*").alias("line_count"),
        )
    )


def q8_market_share(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    target_nation: str = "NATION_3",
    market_region: str = "EUROPE",
) -> DataFrame:
    """TPC-H Q8 shape: the target nation's supplier market share, per order
    year, inside one regional customer market.

    Adaptation: no part/type restriction (the original filters on
    ``p_type``; the fixture join through part adds nothing here), market =
    customers whose nation is in ``market_region``.

    Scale: region→nation→(customer) is a broadcast chain that prunes orders
    before the fact-fact shuffle on orderkey; supplier⋈nation is broadcast
    onto lineitem; the CASE/total division happens on the 6-row-per-year
    aggregate.  Share uses ``exact_div`` (scaled-integer rounding) so both
    engines round identically.
    """
    mkt_nations = (
        nation.join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == market_region)
        .select("n_nationkey")
    )
    supp_nation = supplier.join(
        nation.select("n_nationkey", F.col("n_name").alias("supp_nation")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "supp_nation")
    rev = revenue_cents()
    return (
        customer.join(F.broadcast(mkt_nations), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("o_custkey") == F.col("c_custkey"))
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .withColumn("o_year", F.year("o_orderdate"))
        .groupBy("o_year")
        .agg(
            F.sum(F.when(F.col("supp_nation") == target_nation, rev).otherwise(F.lit(0))).alias(
                "target_cents"
            ),
            F.sum(rev).alias("total_cents"),
        )
        .select(
            "o_year",
            exact_div(F.col("target_cents"), F.col("total_cents"), 4).alias("mkt_share"),
        )
        .orderBy("o_year")
    )


def q12_priority_shipping(
    orders: DataFrame,
    lineitem: DataFrame,
    start: str = "1996-01-01",
    end: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q12 shape: per shipping class, how many high- vs low-priority
    orders it carried (conditional CASE aggregation after a fact-fact join).

    Adaptation: no ``l_shipmode`` column — the class is ``l_linestatus``
    with the same high/low priority split as the original
    (1-URGENT/2-HIGH vs the rest).

    Scale: the shipdate filter prunes the lineitem scan; one shuffle on
    orderkey; the CASE sums fold into the same hash aggregate (no second
    pass).
    """
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(start).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(end).cast("timestamp"))
        )
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


def q13_customer_distribution(
    customer: DataFrame,
    orders: DataFrame,
    exclude_priority: str = "4-NOT SPECIFIED",
) -> DataFrame:
    """TPC-H Q13: distribution of customers by how many qualifying orders
    they placed — left outer join (zeros kept), then a second groupBy over
    the per-customer counts.

    Adaptation: the original excludes orders by comment pattern; the
    fixture has no comment column, so one order priority is excluded
    instead (same shape: the filter must live in the JOIN condition, not
    WHERE, or zero-order customers vanish).

    Scale: two shuffles by design (custkey, then c_count); the second
    aggregate input is one row per customer — already small.  No skew:
    custkey is near-uniform.
    """
    o = orders.filter(F.col("o_orderpriority") != exclude_priority)
    per_cust = (
        customer.join(o, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def q15_top_supplier(
    lineitem: DataFrame,
    supplier: DataFrame,
    start: str = "1996-01-01",
    end: str = "1996-04-01",
) -> DataFrame:
    """TPC-H Q15: the supplier(s) with maximum revenue in a quarter —
    aggregate, then keep the rows equal to the global max (ties kept, like
    the original's scalar-subquery formulation).

    Scale: revenue is a lineitem-sized shuffle on suppkey; the global max
    is a one-row aggregate broadcast back onto the revenue frame (NOT an
    empty-frame window, which would force the whole |suppliers|-sized
    frame through a single partition at 100 TB); supplier join is
    broadcast.  The revenue subtree appears twice in the plan (max input +
    filter input) but Spark's ReuseExchange rule materializes its shuffle
    once and feeds both consumers.
    """
    rev = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(start).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(end).cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(revenue_cents()).alias("total_cents"))
    )
    max_rev = rev.agg(F.max("total_cents").alias("max_cents"))
    return (
        rev.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_cents") == F.col("max_cents"))
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            (F.col("total_cents") / F.lit(100.0)).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


def q16_supplier_variety(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    exclude_brand: str = "Brand#1",
    exclude_type: str = "PROMO",
) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers can deliver each
    (brand, type, size) combination, excluding one brand/type and
    "complaint" suppliers.

    Adaptation: supplier↔part association comes from observed lineitems
    (no partsupp table); complaint suppliers = negative account balance.

    Scale: the excluded-supplier set is a broadcast anti-join (tiny);
    distinct-count shuffles once on (brand, type, size) after map-side
    partial-distinct on (brand, type, size, suppkey).
    """
    bad_supp = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    p = part.filter(
        (F.col("p_brand") != exclude_brand) & (F.col("p_type") != exclude_type)
    )
    return (
        lineitem.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(bad_supp),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


def q17_small_quantity_revenue(
    lineitem: DataFrame,
    part: DataFrame,
    brand: str = "Brand#2",
    ptype: str = "SMALL",
) -> DataFrame:
    """TPC-H Q17: average yearly revenue lost if small-quantity orders
    (below 20% of the part's average quantity) were not filled — a
    per-part correlated-aggregate subquery decorrelated into an
    aggregate + re-join.

    Adaptation: the original filters on p_container (absent); ``p_type``
    plays that role.

    Determinism: l_quantity is integral-valued double, so SUM/COUNT are
    exact and the 0.2·avg threshold is the same IEEE double on both
    engines.  Final division by 7 uses the scaled-integer rule.

    Scale: per-part avg is a lineitem shuffle on partkey; the threshold
    frame is |parts|-sized and broadcast back onto the filtered fact scan —
    the classic decorrelation Spark's optimizer cannot synthesize from an
    imperative loop but expresses naturally here.
    """
    target = part.filter((F.col("p_brand") == brand) & (F.col("p_type") == ptype)).select(
        "p_partkey"
    )
    li = lineitem.join(F.broadcast(target), F.col("l_partkey") == F.col("p_partkey"))
    thresholds = (
        li.groupBy("p_partkey")
        .agg(
            (F.lit(0.2) * (F.sum("l_quantity") / F.count("l_quantity"))).alias("qty_threshold")
        )
        .select(F.col("p_partkey").alias("t_partkey"), "qty_threshold")
    )
    return (
        li.join(F.broadcast(thresholds), F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            exact_div(F.sum(cents("l_extendedprice")), F.lit(700.0), 2).alias("avg_yearly")
        )
    )


def q18_large_volume_customers(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    min_qty: float = 300.0,
    top_k: int = 100,
) -> DataFrame:
    """TPC-H Q18: customers who placed orders totalling more than
    ``min_qty`` units — HAVING-sum subquery turned into aggregate→semi-join.

    Scale: the qualifying-order set is tiny after HAVING, so it broadcasts
    into both fact joins; per-order quantity re-aggregation groups on keys
    that are functionally dependent on o_orderkey (no extra exchange after
    AQE coalesces).  Top-k is TakeOrderedAndProject.
    """
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > min_qty)
    )
    return (
        orders.join(F.broadcast(big.select("l_orderkey", "total_qty")),
                    F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            F.col("o_totalprice").alias("total_price"),
            F.col("total_qty"),
        )
        .orderBy(F.desc("total_price"), "o_orderkey")
        .limit(top_k)
    )


def q21_waiting_supplier(
    supplier: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    nation: DataFrame,
    nation_name: str = "NATION_1",
    late_days: int = 60,
    top_k: int = 20,
) -> DataFrame:
    """TPC-H Q21 shape: suppliers in one nation who were the *sole* late
    shipper on a finished multi-supplier order (EXISTS + NOT EXISTS pair).

    Adaptation: no l_commitdate/l_receiptdate — "late" is
    ``l_shipdate > o_orderdate + late_days``.

    Scale: the EXISTS (another supplier on the order) is a semi-join and
    the NOT EXISTS (another LATE supplier) an anti-join, both shuffling on
    orderkey against progressively smaller inputs; nation filter broadcasts
    onto supplier, supplier broadcasts onto the fact chain.  No driver
    collect; ties broken by name for a total order.
    """
    nat_supp = supplier.join(
        F.broadcast(nation.filter(F.col("n_name") == nation_name).select("n_nationkey")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name")
    finished = orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderdate")
    # Timestamp-preserving INTERVAL arithmetic (not date_add's midnight
    # truncation) so intraday order timestamps match the oracle (ADVICE r3).
    li = lineitem.join(finished, F.col("l_orderkey") == F.col("o_orderkey")).withColumn(
        "is_late",
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr(f"INTERVAL {int(late_days)} DAYS"),
    )
    l1 = (
        li.filter(F.col("is_late"))
        .join(F.broadcast(nat_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("l_orderkey", "l_suppkey", "s_name")
    )
    others = li.select(
        F.col("l_orderkey").alias("o2_orderkey"),
        F.col("l_suppkey").alias("o2_suppkey"),
        F.col("is_late").alias("o2_late"),
    )
    exists_other = (F.col("l_orderkey") == F.col("o2_orderkey")) & (
        F.col("l_suppkey") != F.col("o2_suppkey")
    )
    not_exists_other_late = exists_other & F.col("o2_late")
    return (
        l1.join(others, exists_other, "left_semi")
        .join(others, not_exists_other_late, "left_anti")
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(top_k)
    )


def q22_idle_customers(
    customer: DataFrame,
    orders: DataFrame,
    codes: tuple[str, ...] = ("00", "02", "04", "06", "08"),
    lapse_cutoff: str = "2000-06-01",
) -> DataFrame:
    """TPC-H Q22 shape: wealthy customers gone idle, grouped by a code
    derived from the identifier — scalar subquery (global avg over
    positive balances) + NOT EXISTS anti-join + substring grouping.

    Adaptation: no phone column, and every fixture customer has *some*
    order — the "country code" is the last two digits of ``c_name`` (even
    codes kept) and "idle" means no order on/after ``lapse_cutoff``
    (lapsed rather than never-ordered; identical anti-join shape).

    Scale: the positive-balance average is one scalar broadcast; the anti
    join shuffles on custkey against the date-pruned orders scan; the
    final aggregate has ≤|codes| groups.  Balance sums use exact cents.
    """
    base = customer.withColumn("cntrycode", F.substring("c_name", -2, 2)).filter(
        F.col("cntrycode").isin(*codes)
    )
    avg_bal = (
        base.filter(F.col("c_acctbal") > 0)
        .agg((F.sum(cents("c_acctbal")) / F.count("c_acctbal") / F.lit(100.0)).alias("a"))
        .select("a")
    )
    recent = orders.filter(F.col("o_orderdate") >= F.lit(lapse_cutoff).cast("timestamp"))
    return (
        base.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(recent, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count("*").alias("numcust"),
            money_sum("c_acctbal").alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


def q9_product_profit(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    orders: DataFrame,
    name_fragment: str = "red",
) -> DataFrame:
    """TPC-H Q9 shape: profit on a product line, by supplier nation and
    order year — the classic 5-way star join whose fact-fact edge is the
    lineitem⋈orders shuffle.

    Adaptation: the fixture has no ``partsupp``, so unit cost is
    ``p_retailprice`` (the only cost-like column) — profit per line is
    ``round(extprice·(1−disc)·100) − round(p_retailprice·100)·qty`` in
    exact integer cents (the quantity cast is safe: fixture quantities are
    integral doubles, on which Spark's truncating and DuckDB's rounding
    double→bigint casts agree).

    Scale: part (name-filtered), supplier and nation are broadcast onto
    the lineitem scan, so the only big shuffle is lineitem⋈orders on
    orderkey; the aggregate is |nations|×|years| rows with map-side
    partials. Profit can be negative — integer cents keep the sum exact
    under any partitioning either way.
    """
    p = part.filter(F.col("p_name").like(f"%{name_fragment}%")).select(
        "p_partkey", "p_retailprice"
    )
    s = supplier.join(
        nation.select("n_nationkey", F.col("n_name").alias("nation")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "nation")
    cost_cents = cents("p_retailprice") * F.col("l_quantity").cast("long")
    return (
        lineitem.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders.select("o_orderkey", "o_orderdate"), F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "nation",
            F.year("o_orderdate").alias("o_year"),
            (revenue_cents() - cost_cents).alias("profit_cents"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("profit_cents") / F.lit(100.0), 2).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


def q11_important_stock(
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    target_nation: str = "NATION_3",
    fraction_ppm: int = 1000,
) -> DataFrame:
    """TPC-H Q11 shape: parts representing a significant share of one
    nation's supplied value — GROUP BY plus a HAVING threshold computed
    from a global scalar over the *same* grouped frame.

    Adaptation: no ``partsupp``, so "stock value" is the shipped value
    ``Σ round(l_extendedprice·100)`` of lines from the target nation's
    suppliers, per part; the significance test keeps parts whose value
    exceeds ``fraction_ppm`` parts-per-million of the nation total.

    Scale: supplier⋈nation is broadcast onto lineitem; ONE corpus-scale
    groupBy on partkey. The total branch re-aggregates the same grouped
    frame — AQE's runtime exchange reuse turns it into a ReusedExchange
    of the partkey shuffle (asserted post-execution in
    tests/test_tpch2.py), so the corpus is scanned and shuffled once; the
    one-row total then broadcasts. The ppm comparison stays in int64 —
    ``v·10⁶`` bounds the nation total at ~9e12 dollars; past that,
    rescale to ppb on decimal(38,0)/hugeint.
    """
    s = supplier.join(
        F.broadcast(nation.filter(F.col("n_name") == target_nation)),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey")
    grouped = (
        lineitem.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(cents("l_extendedprice")).alias("v"))
    )
    total = grouped.agg(F.sum("v").alias("total"))
    return (
        grouped.crossJoin(F.broadcast(total))
        .filter(F.col("v") * F.lit(1_000_000) > F.col("total") * F.lit(fraction_ppm))
        .select("l_partkey", F.round(F.col("v") / F.lit(100.0), 2).alias("stock_value"))
        .orderBy(F.desc("stock_value"), "l_partkey")
    )
