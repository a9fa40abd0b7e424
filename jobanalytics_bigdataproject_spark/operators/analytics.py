"""Analytics queries: the reference's 5 SQL queries (Q1-Q5) and 5 RDD tasks
(T1-T5) re-expressed as parameterized DataFrame functions over the star
schema (SURVEY.md §2.4-§2.6, §2.10; FIXTURES.md §C mapping).

Scale notes (100 TB posture), applied throughout:
- dimension joins (``nation``, small post-agg frames) are explicit
  ``F.broadcast`` hints — no shuffle of the fact side;
- fact-fact joins shuffle on the join key and rely on AQE for skew;
- global RANK windows are fed *pre-aggregated* frames only (thousands of
  groups, never raw fact rows) and carry deterministic tiebreaks;
- float aggregates are ROUND-ed (2dp) so results are reproducible across
  engines/summation orders (SURVEY.md §5.3);
- every computed column is aliased identically in the DuckDB oracle
  (__spark_entry__.oracle_sql) — driver hash-compares by column name.

Reference citations per function in docstrings.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from jobanalytics_bigdataproject_spark.functions.exact import (
    cents,
    exact_div,
    money_avg,
    money_median,
    money_sum,
)
from jobanalytics_bigdataproject_spark.functions.textfns import tokenize

# Stopword list for T3 word-count, mirroring the reference's hand-rolled set
# (code/02_RDDOperations.scala:221-225) adapted to the fixture corpus.
STOPWORDS: tuple[str, ...] = (
    "the", "and", "for", "with", "from", "this", "that", "are", "was",
    "not", "all", "any", "can", "has", "have", "will", "you",
)


def q1_pricing_summary(lineitem: DataFrame, min_count: int = 50) -> DataFrame:
    """Q1 shape (reference code/03_SQLOperations.scala:28-43): 2-key GROUP BY
    + COUNT/AVG/MIN/MAX suite + HAVING + ORDER BY.

    Realized as the TPC-H-Q1-like pricing summary on lineitem. One hash
    aggregate with map-side partials; the two grouping keys have tiny
    cardinality (~6 groups) so the shuffle is negligible at any scale."""
    return (
        lineitem.filter(F.col("l_shipdate").isNotNull())
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("line_count"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            money_avg("l_extendedprice").alias("avg_price"),
            F.round(F.min("l_extendedprice"), 2).alias("min_price"),
            F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        )
        .filter(F.col("line_count") > min_count)
        .orderBy(F.desc("line_count"), "l_returnflag", "l_linestatus")
    )


def q2_top_nations(
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    min_orders: int = 100,
    top_k: int = 10,
) -> DataFrame:
    """Q2 shape (reference 03:54-68): top-10 groups by avg with exact median,
    SUM cast to BIGINT, HAVING count ≥ N, LIMIT.

    orders⋈customer shuffles on custkey (both fact-sized at 100 TB);
    nation is broadcast. Median is exact ``F.median`` (not
    percentile_approx) per SURVEY.md §5.3 so the oracle hash-matches."""
    joined = (
        orders.join(customer, orders.o_custkey == customer.c_custkey, "inner")
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey, "inner")
    )
    return (
        joined.groupBy("n_name")
        .agg(
            F.count("*").alias("order_count"),
            money_avg("o_totalprice").alias("avg_order_value"),
            money_median("o_totalprice").alias("median_order_value"),
            F.floor(F.sum(cents("o_totalprice")) / F.lit(100.0)).cast("bigint").alias("total_value"),
        )
        .filter(F.col("order_count") >= min_orders)
        .orderBy(F.desc("avg_order_value"), "n_name")
        .limit(top_k)
    )


def q3_priority_vs_overall(orders: DataFrame) -> DataFrame:
    """Q3 shape (reference 03:79-94): group avg vs ``AVG(AVG(x)) OVER ()``
    + diff column — aggregate-inside-window over an empty window spec.

    The empty-window AVG runs on the *post-aggregate* frame (5 rows here;
    group-count rows generally), so the single-partition window exchange
    touches only group rows — safe at any fact-table scale."""
    w = Window.partitionBy()
    agg = orders.groupBy("o_orderpriority").agg(
        F.count("*").alias("order_count"),
        money_avg("o_totalprice").alias("avg_price"),
    )
    # AVG(AVG(x)) OVER () over exact cents of the already-rounded group avgs:
    # integer window-sum is order-independent, so the overall avg hashes
    # identically on any engine/partitioning (functions/exact.py rationale).
    overall = F.round(
        F.round(F.sum(cents("avg_price")).over(w) / F.count(F.lit(1)).over(w))
        / F.lit(100.0),
        2,
    )
    return agg.select(
        "o_orderpriority",
        "order_count",
        "avg_price",
        overall.alias("overall_avg"),
        F.round(F.col("avg_price") - overall, 2).alias("diff_from_overall"),
    ).orderBy("o_orderpriority")


def q4_brand_rank(
    lineitem: DataFrame,
    part: DataFrame,
    min_lines: int = 100,
    max_rank: int = 15,
) -> DataFrame:
    """Q4 shape (reference 03:106-127): CTE stats + COUNT(DISTINCT) + HAVING
    + RANK() ≤ k with ties.

    The RANK window is global but runs on the aggregated per-brand frame
    (25 brands; bounded cardinality), and Spark ≥3.5 inserts a
    WindowGroupLimit so the rank-filter prunes early. Tiebreak on p_brand
    makes ties deterministic (SURVEY.md §5.3)."""
    stats = (
        lineitem.join(part, lineitem.l_partkey == part.p_partkey, "inner")
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("line_count"),
            F.countDistinct("l_suppkey").alias("supplier_count"),
            money_sum("l_extendedprice").alias("total_revenue"),
        )
        .filter(F.col("line_count") >= min_lines)
    )
    w = Window.orderBy(F.desc("line_count"), "p_brand")
    return (
        stats.withColumn("popularity_rank", F.rank().over(w))
        .filter(F.col("popularity_rank") <= max_rank)
        .orderBy("popularity_rank")
    )


def q5_event_mix(events: DataFrame) -> DataFrame:
    """Q5 shape (reference 03:138-152): derived ratio metric with NULLIF
    div-by-zero guard + empty-window total.

    Per event_type: count, rounded avg value, and pct-of-all-events =
    100*count/NULLIF(total,0) — the conversion-rate pattern."""
    w = Window.partitionBy()
    agg = events.groupBy("event_type").agg(
        F.count("*").alias("event_count"),
        money_avg("value").alias("avg_value"),
        money_sum("value").alias("total_value"),
    )
    total = F.sum("event_count").over(w)
    return agg.select(
        "event_type",
        "event_count",
        "avg_value",
        "total_value",
        exact_div(F.lit(100) * F.col("event_count"), total, 2).alias("pct_of_events"),
    ).orderBy("event_type")


def t1_filter_lines(lineitem: DataFrame, returnflag: str = "N") -> DataFrame:
    """T1 (reference code/02_RDDOperations.scala:45-49): filter + not-null,
    re-expressed declaratively (the reference drops to RDD). Both predicates
    push down to the parquet scan."""
    return lineitem.filter(
        (F.upper(F.trim(F.col("l_returnflag"))) == returnflag)
        & F.col("l_extendedprice").isNotNull()
    ).select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        "l_linestatus",
        F.round("l_extendedprice", 2).alias("extendedprice"),
    )


def t2_price_tiers(
    lineitem: DataFrame,
    probabilities: Sequence[float] = (0.33, 0.67),
    labels: Sequence[str] = ("LOW", "MID", "HIGH"),
) -> DataFrame:
    """T2 (reference 02:111-202): percentile tier bucketing + distribution.

    The reference collects every salary to the driver and indexes the sorted
    array (02:111-133) — a driver-memory cliff. Here the cutoffs are a
    distributed exact interpolated percentile (``F.percentile``, ==
    DuckDB ``quantile_cont`` so the oracle matches), cross-joined back as a
    1-row broadcast; bucketing is a codegen'd CASE; distribution is one
    tiny hash agg. Fully distributed, two passes over the fact table.

    Scale note: exact percentile buffers the column's values during the
    final merge — fine to ~1e9 rows, a memory cliff beyond. At 100 TB use
    the sketch path (``sampling.quantile_cutoffs`` with relative_error>0 or
    ``percentile_approx`` — see the rows-only ``approx_median_nations``);
    exactness here is what makes the oracle hash-match."""
    cuts = lineitem.agg(
        F.percentile("l_extendedprice", F.lit(list(probabilities))).alias("__cuts")
    )
    v = F.col("l_extendedprice")
    tier = F.when(v <= F.element_at("__cuts", 1), F.lit(labels[0]))
    for i in range(1, len(probabilities)):
        tier = tier.when(v <= F.element_at("__cuts", i + 1), F.lit(labels[i]))
    tier = tier.otherwise(F.lit(labels[-1]))
    w = Window.partitionBy()
    return (
        lineitem.filter(v.isNotNull())
        .crossJoin(F.broadcast(cuts))
        .withColumn("tier", tier)
        .groupBy("tier")
        .agg(F.count("*").alias("tier_count"))
        .select(
            "tier",
            "tier_count",
            exact_div(F.lit(100) * F.col("tier_count"), F.sum("tier_count").over(w), 2).alias(
                "tier_pct"
            ),
        )
        .orderBy("tier")
    )


def t3_word_count(
    documents: DataFrame,
    stopwords: Sequence[str] = STOPWORDS,
    min_len: int = 3,
    top_k: int = 20,
) -> DataFrame:
    """T3 (reference 02:221-264): tokenize/strip/stopword-filter word count,
    top-k. RDD flatMap+reduceByKey re-expressed as explode + hash agg —
    map-side partial aggregation replaces the reference's reduceByKey
    exactly; deterministic tiebreak on the word."""
    words = documents.select(F.explode(tokenize("text", min_len)).alias("word"))
    return (
        words.filter(~F.col("word").isin(*stopwords) & (F.length("word") >= min_len))
        .groupBy("word")
        .agg(F.count("*").alias("word_count"))
        .orderBy(F.desc("word_count"), "word")
        .limit(top_k)
    )


def t4_segment_stats(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """T4 (reference 02:298-341): hand-rolled (k,(sum,sum,flag,cnt))
    reduceByKey → one declarative groupBy.agg. ``avg`` ignores NULLs
    natively, replacing the reference's manual null-flag counter
    (SURVEY.md §2.4 A10)."""
    joined = orders.join(customer, orders.o_custkey == customer.c_custkey, "inner")
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("order_count"),
            money_sum("o_totalprice").alias("total_value"),
            money_avg("o_totalprice").alias("avg_value"),
            F.countDistinct("o_custkey").alias("customer_count"),
        )
        .orderBy(F.desc("order_count"), "c_mktsegment")
    )


def _nation_stats(
    orders: DataFrame, customer: DataFrame, nation: DataFrame, min_orders: int
) -> DataFrame:
    joined = (
        orders.join(customer, orders.o_custkey == customer.c_custkey, "inner")
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey, "inner")
    )
    return (
        joined.groupBy("n_name")
        .agg(
            F.count("*").alias("order_count"),
            money_avg("o_totalprice").alias("avg_order_value"),
        )
        .filter((F.col("order_count") >= min_orders) & (F.col("avg_order_value") > 0))
    )


def t5_ranking_top(
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    min_orders: int = 30,
    top_k: int = 20,
) -> DataFrame:
    """T5 top-k (reference 02:384-413): filter n≥N & avg>0, sort desc, take k
    — ``orderBy.limit`` stays distributed (TakeOrderedAndProject), unlike
    the reference's driver-side ``take``."""
    return _nation_stats(orders, customer, nation, min_orders).orderBy(
        F.desc("avg_order_value"), "n_name"
    ).limit(top_k)


def t5_ranking_bottom(
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    min_orders: int = 30,
    bottom_k: int = 10,
) -> DataFrame:
    """T5 bottom-k (reference 02:433-435 does collect-then-takeRight on the
    driver — SURVEY.md §2.6 O8 anti-pattern). Ascending orderBy + limit is
    the distributed equivalent."""
    return _nation_stats(orders, customer, nation, min_orders).orderBy(
        F.asc("avg_order_value"), "n_name"
    ).limit(bottom_k)


def agg_join_report(
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
) -> DataFrame:
    """Phase-1 Step-4 report (reference 01:160-179): two per-key aggregates
    left-joined and sorted — counts/sum/countDistinct on one side, avg +
    exact median on the other, J1 left join on the group key.

    Both sides are post-aggregate (≤ group-count rows) so Catalyst picks a
    broadcast-hash join automatically; the explicit hint keeps it that way
    at any fact scale."""
    base = (
        orders.join(customer, orders.o_custkey == customer.c_custkey, "inner")
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey, "inner")
    )
    counts = base.groupBy("n_name").agg(
        F.count("*").alias("total_orders"),
        money_sum("o_totalprice").alias("total_value"),
        F.countDistinct("o_custkey").alias("distinct_customers"),
    )
    salary = base.groupBy("n_name").agg(
        money_avg("o_totalprice").alias("avg_value"),
        money_median("o_totalprice").alias("median_value"),
    )
    return (
        counts.join(F.broadcast(salary), on="n_name", how="left")
        .orderBy(F.desc("total_orders"), "n_name")
    )


def revenue_cents(extendedprice: Column | str = "l_extendedprice", discount: Column | str = "l_discount") -> Column:
    """Per-line revenue ``extprice*(1-discount)`` as exact integer cents —
    sums of float products are summation-order-dependent, so the product is
    rounded to cents per row BEFORE aggregation (functions/exact.py rule).
    Oracle: ``CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT)``."""
    ep = F.col(extendedprice) if isinstance(extendedprice, str) else extendedprice
    d = F.col(discount) if isinstance(discount, str) else discount
    return F.round(ep * (F.lit(1.0) - d) * 100).cast("long")


def tpch_q3_shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    cutoff: str = "1998-01-01",
    top_k: int = 10,
) -> DataFrame:
    """TPC-H Q3 shape [EXT]: 3-way fact join with selective filters on both
    sides, revenue aggregation, top-k.

    Scale shape: both date/segment filters push to the scans; the two
    fact-fact joins shuffle on o_orderkey/o_custkey with AQE; the top-k is
    TakeOrderedAndProject. Revenue accumulates in exact cents."""
    return (
        customer.filter(F.col("c_mktsegment") == segment)
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < F.lit(cutoff).cast("timestamp"))
        .join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.lit(cutoff).cast("timestamp"))
        .groupBy("o_orderkey", "o_orderpriority")
        .agg((F.sum(revenue_cents()) / F.lit(100.0)).alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(top_k)
    )


def tpch_q5_local_supplier_volume(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str = "ASIA",
) -> DataFrame:
    """TPC-H Q5 shape [EXT]: 6-way join with the local-supplier condition
    (customer and supplier in the SAME nation), per-nation revenue.

    Scale shape: region→nation is a broadcast chain pruning the fact rows
    early; lineitem⋈supplier and orders⋈customer shuffle on their keys;
    the same-nation predicate is an equi-condition (c_nationkey ==
    s_nationkey) so everything stays hash-joinable — no theta join."""
    return (
        region.filter(F.col("r_name") == region_name)
        .join(F.broadcast(nation), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(customer, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("o_custkey") == F.col("c_custkey"))
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            supplier,
            (F.col("s_suppkey") == F.col("l_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg((F.sum(revenue_cents()) / F.lit(100.0)).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


def tpch_q7_volume_shipping(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    nation_a: str = "NATION_1",
    nation_b: str = "NATION_2",
    start: str = "1996-01-01",
    end: str = "1998-01-01",
) -> DataFrame:
    """TPC-H Q7 shape [EXT]: bilateral trade volume — revenue shipped
    between two specific nations (both directions), per supplier nation ×
    customer nation × ship year.

    Scale shape: the nation-pair predicate is applied to the DIMENSION
    sides first — customer and supplier each broadcast-join the 2-row
    nation slice BEFORE touching a fact table, so the orders⋈customer and
    lineitem⋈supplier probes only keep rows from the two nations and the
    big lineitem⋈orders shuffle moves the pruned minority, not the full
    fact. The cross-pair condition (exclude same-nation trade) is a cheap
    residual filter on two broadcast-joined label columns, never a theta
    join. Revenue accumulates in exact integer cents."""
    ns = nation.filter(F.col("n_name").isin(nation_a, nation_b))
    supp_n = ns.select(
        F.col("n_nationkey").alias("__s_nk"), F.col("n_name").alias("supp_nation")
    )
    cust_n = ns.select(
        F.col("n_nationkey").alias("__c_nk"), F.col("n_name").alias("cust_nation")
    )
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(start).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(end).cast("timestamp"))
        )
        .join(
            supplier.join(F.broadcast(supp_n), F.col("s_nationkey") == F.col("__s_nk")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            customer.join(F.broadcast(cust_n), F.col("c_nationkey") == F.col("__c_nk")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg((F.sum(revenue_cents()) / F.lit(100.0)).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def tpch_q10_returned_items(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    start: str = "1996-01-01",
    end: str = "1996-04-01",
    top_k: int = 20,
) -> DataFrame:
    """TPC-H Q10 shape [EXT]: which customers returned the most revenue in
    a quarter — lost-revenue attribution over a 4-way join, top-k.

    Scale shape: the quarter filter pushes to the orders scan and the
    returnflag filter to the lineitem scan, so both fact inputs shrink
    before the o_orderkey shuffle; nation broadcasts onto the surviving
    customers; the wide groupBy key (custkey + display attrs) adds no
    second exchange because custkey is already the join key's functional
    parent; top-k is TakeOrderedAndProject, never a global sort."""
    return (
        orders.filter(
            (F.col("o_orderdate") >= F.lit(start).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(end).cast("timestamp"))
        )
        .join(lineitem.filter(F.col("l_returnflag") == "R"), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg((F.sum(revenue_cents()) / F.lit(100.0)).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(top_k)
    )


def customer_rolling_spend(
    orders: DataFrame, days: int = 90, dp: int = 2
) -> DataFrame:
    """[EXT] Trailing-``days`` spend per customer at each order: a
    time-RANGE window frame (``RANGE BETWEEN INTERVAL .. PRECEDING``),
    the one window frame shape the surface didn't yet cover (lag / ntile /
    rowsBetween / rank all exist). Spark's rangeBetween needs a numeric
    ordering key, so the frame runs over epoch seconds — value-identical
    to DuckDB's interval RANGE frame.

    Scale shape: partitioned by ``o_custkey`` — millions of independent
    small frames, one hash exchange, per-task state bounded by one
    customer's orders inside the window, never N. Peer rows (same customer,
    same date) are summed into the frame identically on both engines
    because RANGE frames include all order-key peers. Spend accumulates in
    integer cents; the final division is the only float op."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-days * 86400, 0)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        F.round(F.sum(cents("o_totalprice")).over(w) / F.lit(100.0), dp).alias(
            f"spend_{days}d"
        ),
    )


def priority_mapping_report(
    orders: DataFrame, mapping: Mapping[str, str] | None = None
) -> DataFrame:
    """When-chain / map-lookup standardization report (reference 01:275-295
    generalized per SURVEY.md §2.8): map raw priority codes to standardized
    labels, count per label."""
    from jobanalytics_bigdataproject_spark.functions.derive import map_lookup

    mapping = mapping or {
        "1-URGENT": "URGENT",
        "2-HIGH": "HIGH",
        "3-MEDIUM": "MEDIUM",
        "4-NOT SPECIFIED": "UNSPECIFIED",
        "5-LOW": "LOW",
    }
    return (
        orders.withColumn("priority_std", map_lookup("o_orderpriority", mapping, F.lit("OTHER")))
        .groupBy("priority_std")
        .agg(
            F.count("*").alias("order_count"),
            money_avg("o_totalprice").alias("avg_price"),
        )
        .orderBy("priority_std")
    )


def promo_revenue_ratio(lineitem: DataFrame, part: DataFrame, promo_type: str = "ECONOMY") -> DataFrame:
    """TPC-H Q14 shape [EXT]: per-ship-month share of revenue coming from a
    part type — the conditional-aggregation-over-a-join pattern (one join,
    then two sums distinguished by a predicate on the dimension column).

    Scale shape: ``part`` is dimension-sized, so the fact table never
    shuffles — broadcast join, then a per-month partial agg; the ratio is
    ``exact_div`` over two exact cent sums so the basis-point result is
    hash-identical across engines and summation orders."""
    rev = revenue_cents()
    is_promo = (F.col("p_type") == promo_type).cast("long")
    return (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.month("l_shipdate").alias("ship_month"))
        .agg(
            F.sum(rev * is_promo).alias("promo_cents"),
            F.sum(rev).alias("total_cents"),
        )
        .select(
            "ship_month",
            "promo_cents",
            "total_cents",
            exact_div(F.col("promo_cents"), F.col("total_cents")).alias("promo_share"),
        )
        .orderBy("ship_month")
    )


def reconcile_daily_totals(orders: DataFrame, events: DataFrame) -> DataFrame:
    """[EXT] Full-outer reconciliation of two independently-aggregated
    daily ledgers — booked order revenue by order date vs observed purchase
    event value by event date — the closing-the-books query shape (which
    side has days the other lacks, and by how much do overlapping days
    differ). Exercises the full-outer join with null handling on BOTH
    sides; nearest reference analog is its left join of two aggregates
    (code/02_DataFrameOperations.scala:224-443 report join).

    Scale shape: each fact aggregates down to one row per day BEFORE the
    join (map-side partials), so the full-outer join runs on two
    calendar-sized frames — thousands of rows at 100 TB, never fact-sized.
    Exact integer cents on both sides keep the diff hash-stable.
    """
    o_daily = orders.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(cents("o_totalprice")).alias("order_cents")
    )
    e_daily = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.sum(cents("value")).alias("event_cents"))
    )
    status = (
        F.when(F.col("order_cents").isNull(), "events_only")
        .when(F.col("event_cents").isNull(), "orders_only")
        .otherwise("both")
    )
    return (
        o_daily.join(e_daily, "day", "full_outer")
        .select(
            "day",
            F.coalesce("order_cents", F.lit(0)).cast("long").alias("order_cents"),
            F.coalesce("event_cents", F.lit(0)).cast("long").alias("event_cents"),
            (
                F.coalesce("order_cents", F.lit(0)) - F.coalesce("event_cents", F.lit(0))
            ).cast("long").alias("diff_cents"),
            status.alias("status"),
        )
        .orderBy("day")
    )


def nation_price_quartiles(
    orders: DataFrame, customer: DataFrame, nation: DataFrame
) -> DataFrame:
    """[EXT] Per-nation exact order-price quartiles — GROUPED interpolated
    percentiles (the global forms live in t2/percentiles_price; the
    grouped form is the per-entity distribution report a warehouse runs
    per market/tenant/day).

    Scale shape: nation broadcasts onto customer, the orders⋈customer
    shuffle carries only (custkey, cents), and ONE ``percentile(col,
    array(...))`` pass per group computes all three quartiles — not three
    sorts. Exact percentile holds the group's values per task: fine while
    a single nation's orders fit an executor (the sf-independent caveat
    documented at sampling.percentiles_exact; the sketch path is
    approxQuantile). Cents-first rounding keeps the interpolated midpoint
    on a representable half, so both engines round identically."""
    c = cents("o_totalprice")
    joined = (
        orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    agg = joined.groupBy("n_name").agg(
        F.percentile(c, F.lit([0.25, 0.5, 0.75])).alias("__ps"),
        F.count("*").alias("n_orders"),
    )
    return agg.select(
        "n_name",
        *[
            (F.round(F.element_at("__ps", i + 1)) / F.lit(100.0)).alias(f"p{p}")
            for i, p in enumerate((25, 50, 75))
        ],
        "n_orders",
    ).orderBy("n_name")


def part_cheapest_supplier(lineitem: DataFrame) -> DataFrame:
    """[EXT] Deterministic per-group argmin (the TPC-H Q2 min-cost-supplier
    shape on the tables this schema has): for each part, the supplier
    offering its lowest line price. Realized as ``MIN(struct(price_cents,
    suppkey))`` — ONE ordinary min aggregate with map-side partials and a
    |parts|-row shuffle, where a window row_number would shuffle every
    line. The struct's lexicographic order makes the suppkey tiebreak
    part of the aggregate itself, so ties resolve identically on any
    engine and any merge order (a bare min_by/arg_min picks an arbitrary
    peer — not reproducible)."""
    pair = F.struct(
        cents("l_extendedprice").alias("pc"), F.col("l_suppkey").alias("sk")
    )
    m = F.min(pair)
    # no presentation orderBy: the output is |parts|-sized (fact-adjacent at
    # 100 TB) and the driver compare is order-insensitive — a global sort
    # here would be a pure-waste range exchange on a billion-row result
    return lineitem.groupBy("l_partkey").agg(
        (m.getField("pc") / F.lit(100.0)).alias("min_price"),
        m.getField("sk").alias("cheapest_suppkey"),
        F.count("*").alias("n_lines"),
    )


def orders_price_histogram(
    orders: DataFrame, lo: float = 0.0, hi: float = 600000.0, n_buckets: int = 12
) -> DataFrame:
    """[EXT] Equi-width histogram of order value — the profiling/data-viz
    binning primitive. ``width_bucket`` on exact cents (bucket edges are
    integer cents, so bucket assignment has no float boundary) → one
    map-side-combined count agg over ≤ n_buckets+2 groups. Empty buckets
    are absent by construction (the dense-grid variant is
    ``hourly_gapfill``'s sequence/explode pattern)."""
    b = F.width_bucket(
        cents("o_totalprice"),
        F.lit(int(lo * 100)),
        F.lit(int(hi * 100)),
        F.lit(n_buckets),
    )
    return (
        orders.groupBy(b.cast("long").alias("bucket"))
        .agg(
            F.count("*").alias("n_orders"),
            money_sum("o_totalprice").alias("total_value"),
        )
        .orderBy("bucket")
    )


def orders_value_distribution_rank(orders: DataFrame) -> DataFrame:
    """[EXT] percent_rank + cume_dist per order within its priority class —
    the relative-standing window pair the surface didn't yet cover (rank /
    row_number / ntile / lag / frames all exist). The ORDER BY carries an
    orderkey tiebreak so no two rows are peers: both statistics become
    exact rationals of integer positions — (rank−1)/(n−1) and pos/n —
    whose correctly-rounded doubles are engine-identical with no rounding
    step needed.

    Scale shape: one hash exchange on the priority key; per-task state is
    one priority class (5 classes here — at scale partition by a finer
    entity key the same way). No presentation sort on the N-row output."""
    w = Window.partitionBy("o_orderpriority").orderBy(
        cents("o_totalprice"), "o_orderkey"
    )
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.round("o_totalprice", 2).alias("totalprice"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


def tpch_q19_disjunctive_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q19 shape [EXT]: revenue under an OR-of-ANDs predicate — three
    (brand-class × size band × quantity band) arms OR'd together, the
    classic disjunctive join filter.

    Scale shape: the predicate references BOTH sides, so no single arm can
    fully push to either scan — but each side's UNION OF ARMS does:
    Catalyst derives `p_type IN (...)` / `p_size <= 25` for the part scan
    and `l_quantity <= 36` for the lineitem scan from the disjunction
    (constraint propagation), pruning before the broadcast join evaluates
    the exact residual. Per-arm revenue is also reported via conditional
    aggregation so one pass answers all three arms."""
    arm1 = (
        (F.col("p_type") == "PROMO")
        & (F.col("p_size").between(1, 5))
        & (F.col("l_quantity").between(1, 11))
    )
    arm2 = (
        (F.col("p_type") == "ECONOMY")
        & (F.col("p_size").between(1, 10))
        & (F.col("l_quantity").between(10, 20))
    )
    arm3 = (
        (F.col("p_type") == "STANDARD")
        & (F.col("p_size").between(1, 25))
        & (F.col("l_quantity").between(20, 36))
    )
    rev = revenue_cents()
    return (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(arm1 | arm2 | arm3)
        .agg(
            (F.sum(rev) / F.lit(100.0)).alias("revenue"),
            F.count("*").alias("n_lines"),
            (F.sum(F.when(arm1, rev).otherwise(0)) / F.lit(100.0)).alias("rev_arm1"),
            (F.sum(F.when(arm2, rev).otherwise(0)) / F.lit(100.0)).alias("rev_arm2"),
            (F.sum(F.when(arm3, rev).otherwise(0)) / F.lit(100.0)).alias("rev_arm3"),
        )
    )


def first_last_orders(orders: DataFrame) -> DataFrame:
    """[EXT] first_value / last_value / nth_value over a per-customer
    full-frame window: each customer's first, latest, and second order
    value in one pass — the W-family members the reference never uses.

    One shuffle on custkey; all three window functions share the same
    (partition, order, frame) spec so the per-key sort happens once; the
    dedup to one row per customer rides the same partitioning.  The order
    key carries the orderkey tiebreak, so ties are deterministic."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        orders.select(
            "o_custkey",
            F.first_value("o_totalprice").over(w).alias("first_price"),
            F.last_value("o_totalprice").over(w).alias("last_price"),
            F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
            F.count("*").over(w).alias("n_orders"),
        )
        .dropDuplicates(["o_custkey"])
    )


def price_quantity_corr(lineitem: DataFrame) -> DataFrame:
    """[EXT] Pearson correlation of price and quantity per return flag,
    computed from EXACT integer sums -- the statistical-aggregate analog
    of the integer-cents rule: naive ``F.corr`` accumulates float moments
    whose value depends on partition order, so it can't hash-match an
    oracle (nor itself across cluster sizes).  Here the linear sums
    accumulate as int64 over integer cents/centi-units and the product
    sums as decimal(38,0) (x^2 in cents^2 is ~1e14/row and would overflow
    int64 past ~1e5 rows per group; the DuckDB oracle uses HUGEINT); the
    final correlation is ONE per-group float expression over those exact
    integers -- identical on any engine -- rounded at 6dp."""
    d = "decimal(38,0)"
    x = cents("l_extendedprice")
    y = F.round(F.col("l_quantity") * 100).cast("long")
    xd, yd = x.cast(d), y.cast(d)
    g = lineitem.groupBy("l_returnflag").agg(
        F.count("*").cast(d).alias("n"),
        F.sum(x).cast(d).alias("sx"),
        F.sum(y).cast(d).alias("sy"),
        F.sum(xd * yd).alias("sxy"),
        F.sum(xd * xd).alias("sxx"),
        F.sum(yd * yd).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    ) * F.sqrt((F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double"))
    return g.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n_lines"),
        F.round(num / F.nullif(den, F.lit(0.0)), 6).alias("price_qty_corr"),
    ).orderBy("l_returnflag")


def pareto_frontier(
    df: DataFrame,
    x_col: Column,
    y_col: Column,
    id_cols: "Sequence[str]",
    shards: int = 64,
) -> DataFrame:
    """[EXT] 2-D Pareto frontier (skyline): rows not strictly dominated on
    (x, y), both minimized -- "cheapest part for its size class" style
    queries.  Exact duplicates on (x, y) are all kept (neither strictly
    dominates), matching the NOT-EXISTS dominance definition the oracle
    uses.

    Scale shape -- skyline-of-skylines: the frontier of a union equals the
    frontier of per-shard frontiers, for ANY sharding.  Phase 1 computes a
    local skyline per hash shard (window partitioned by shard: per-shard
    sort, no global exchange of the input); phase 2 re-runs the same rule
    globally over the per-shard survivors, which are frontier-sized, not
    input-sized.  The only single-partition window in the plan therefore
    sees |survivors| rows.  x must be integer-valued (cents here) because
    the strictly-smaller-x test is a RANGE frame ending at -1.

    Keep rule per pass: y < min(y over x' <= x-1)  [no strictly-cheaper-x
    row is at-or-below y]  AND  y == min(y over same x)  [not dominated
    within the x tie group; (x,y) duplicates all satisfy equality]."""
    base = df.select(*id_cols, x_col.alias("__x"), y_col.alias("__y")).withColumn(
        "__shard", F.pmod(F.xxhash64(*[F.col(c) for c in id_cols]), F.lit(shards))
    )

    def keep(frame: DataFrame, part_cols: list) -> DataFrame:
        wr = (
            Window.partitionBy(*part_cols)
            .orderBy("__x")
            .rangeBetween(Window.unboundedPreceding, -1)
        )
        wx = Window.partitionBy(*part_cols, "__x")
        m1 = F.min("__y").over(wr)
        mx = F.min("__y").over(wx)
        return frame.withColumn("__m1", m1).withColumn("__mx", mx).filter(
            (F.col("__m1").isNull() | (F.col("__y") < F.col("__m1")))
            & (F.col("__y") == F.col("__mx"))
        ).drop("__m1", "__mx")

    local = keep(base, ["__shard"])
    glob = keep(local.drop("__shard"), [])
    return glob.select(
        *id_cols, F.col("__x").alias("x"), F.col("__y").alias("y")
    ).orderBy("x", "y", *id_cols)


def yoy_revenue_growth(lineitem: DataFrame) -> DataFrame:
    """[EXT] Year-over-year revenue growth: per ship-year exact revenue
    plus the growth vs the previous year in integer basis points.

    Exactness: revenue accumulates as integer cents (functions/exact.py);
    the growth ratio is computed on ``cents div 100`` (whole dollars) with
    Spark ``div`` == DuckDB ``//`` truncating division, so the 10000×
    numerator stays within bigint headroom even at petabyte yearly revenue
    (|rev_usd| < 9.2e14 before overflow) and both engines produce the
    identical integer — no float rounding anywhere.

    Scale: one map-side-combined aggregate to |years| rows; the lag window
    is over that post-aggregate frame (metadata scale), never the fact."""
    yearly = (
        lineitem.groupBy(F.year("l_shipdate").alias("year"))
        .agg(F.sum(cents("l_extendedprice")).alias("rev_cents"))
    )
    w = Window.orderBy("year")
    prev = F.lag(F.expr("rev_cents div 100")).over(w)
    return (
        yearly.withColumn("prev_usd", prev)
        .select(
            "year",
            F.round(F.col("rev_cents") / F.lit(100.0), 2).alias("revenue"),
            F.expr(
                "CASE WHEN prev_usd IS NULL OR prev_usd = 0 THEN NULL "
                "ELSE (10000 * (rev_cents div 100 - prev_usd)) div prev_usd END"
            ).cast("long").alias("growth_bp"),
        )
        .orderBy("year")
    )


def part_supplier_share(lineitem: DataFrame, min_share_bp: int = 2000) -> DataFrame:
    """[EXT] TPC-H Q20-family shape without the partsupp table: suppliers
    carrying at least ``min_share_bp`` basis points of a part's total
    shipped quantity — the supply-concentration screen.

    Exactness: quantities quantize to integer centi-units, the per-part
    total is a window SUM over the (part, supplier) aggregate (never the
    fact), and the share is truncating integer division — Spark ``div``
    == DuckDB ``//``, no float anywhere.

    Scale: one map-side-combined aggregate on (part, supplier), then the
    part-keyed window over that much smaller frame; the share filter
    prunes before the presentation sort."""
    qty_c = F.round(F.col("l_quantity") * 100).cast("long")
    per = lineitem.groupBy("l_partkey", "l_suppkey").agg(F.sum(qty_c).alias("sq"))
    w = Window.partitionBy("l_partkey")
    shared = per.withColumn("tq", F.sum("sq").over(w)).withColumn(
        "share_bp", F.expr("CAST((10000 * sq) div tq AS BIGINT)")
    )
    return (
        shared.filter(F.col("share_bp") >= min_share_bp)
        .select("l_partkey", "l_suppkey", "share_bp")
        .orderBy("l_partkey", "l_suppkey")
    )
