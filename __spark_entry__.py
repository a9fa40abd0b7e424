"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (Q2 shape) at sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 /
FIXTURES.md §C as ``(spark, sf_dir) -> DataFrame`` callables.
``oracle_sql()`` — DuckDB-equivalent ANSI SQL per query (omitted for
RNG/xxhash64-based ops → rows-only checks, as declared in SURVEY.md §5.3).

Column names are aliased identically on both sides; float aggregates are
ROUND-ed; timestamps are emitted as formatted strings (SURVEY.md §5.3).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from jobanalytics_bigdataproject_spark.operators import analytics
from jobanalytics_bigdataproject_spark.sources.readers import load_star


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: top nations by avg order value (Q2 shape — SURVEY.md §7.2
    step 1) on sf0.001."""
    t = load_star(spark, "/root/testdata/sf0.001", ("orders", "customer", "nation"))
    return analytics.q2_top_nations(
        t["orders"], t["customer"], t["nation"], min_orders=20, top_k=10
    )


# ---------------------------------------------------------------------------
# queries(): name -> (spark, sf_dir) -> DataFrame
# ---------------------------------------------------------------------------


def _q(names: tuple[str, ...], fn) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        t = load_star(spark, sf_dir, names)
        return fn(t)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # --- SQL phase shapes (reference code/03_SQLOperations.scala) ---
        "q1_pricing_summary": _q(
            ("lineitem",), lambda t: analytics.q1_pricing_summary(t["lineitem"])
        ),
        "q2_top_nations": _q(
            ("orders", "customer", "nation"),
            lambda t: analytics.q2_top_nations(t["orders"], t["customer"], t["nation"]),
        ),
        "q3_priority_vs_overall": _q(
            ("orders",), lambda t: analytics.q3_priority_vs_overall(t["orders"])
        ),
        "q4_brand_rank": _q(
            ("lineitem", "part"),
            lambda t: analytics.q4_brand_rank(t["lineitem"], t["part"]),
        ),
        "q5_event_mix": _q(("events",), lambda t: analytics.q5_event_mix(t["events"])),
        # --- RDD-task shapes, DataFrame-native (code/02_RDDOperations.scala) ---
        "t1_filter_lines": _q(
            ("lineitem",), lambda t: analytics.t1_filter_lines(t["lineitem"])
        ),
        "t2_price_tiers": _q(
            ("lineitem",), lambda t: analytics.t2_price_tiers(t["lineitem"])
        ),
        "t3_word_count": _q(
            ("documents",), lambda t: analytics.t3_word_count(t["documents"])
        ),
        "t4_segment_stats": _q(
            ("orders", "customer"),
            lambda t: analytics.t4_segment_stats(t["orders"], t["customer"]),
        ),
        "t5_top_nations": _q(
            ("orders", "customer", "nation"),
            lambda t: analytics.t5_ranking_top(t["orders"], t["customer"], t["nation"]),
        ),
        "t5_bottom_nations": _q(
            ("orders", "customer", "nation"),
            lambda t: analytics.t5_ranking_bottom(t["orders"], t["customer"], t["nation"]),
        ),
        # --- Phase-1 ETL report shapes (code/01_DataPreprocessing.scala) ---
        "agg_join_report": _q(
            ("orders", "customer", "nation"),
            lambda t: analytics.agg_join_report(t["orders"], t["customer"], t["nation"]),
        ),
        "priority_mapping_report": _q(
            ("orders",), lambda t: analytics.priority_mapping_report(t["orders"])
        ),
    }


# ---------------------------------------------------------------------------
# oracle_sql(): DuckDB-runnable equivalents (views pre-registered)
# ---------------------------------------------------------------------------


def oracle_sql() -> dict[str, str]:
    return {
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   COUNT(*) AS line_count,
                   ROUND(SUM(l_quantity), 2) AS sum_qty,
                   ROUND(ROUND(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT))*1.0/COUNT(l_extendedprice))/100.0, 2) AS avg_price,
                   ROUND(MIN(l_extendedprice), 2) AS min_price,
                   ROUND(MAX(l_extendedprice), 2) AS max_price
            FROM lineitem
            WHERE l_shipdate IS NOT NULL
            GROUP BY l_returnflag, l_linestatus
            HAVING COUNT(*) > 50
            ORDER BY line_count DESC, l_returnflag, l_linestatus
        """,
        "q2_top_nations": """
            SELECT n_name,
                   COUNT(*) AS order_count,
                   ROUND(ROUND(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT))*1.0/COUNT(o_totalprice))/100.0, 2) AS avg_order_value,
                   ROUND(ROUND(MEDIAN(CAST(ROUND(o_totalprice*100) AS BIGINT)))/100.0, 2) AS median_order_value,
                   CAST(FLOOR(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT))/100.0) AS BIGINT) AS total_value
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
            HAVING COUNT(*) >= 100
            ORDER BY avg_order_value DESC, n_name
            LIMIT 10
        """,
        "q3_priority_vs_overall": """
            WITH g AS (
                SELECT o_orderpriority,
                       COUNT(*) AS order_count,
                       ROUND(ROUND(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT))*1.0/COUNT(o_totalprice))/100.0, 2) AS avg_price
                FROM orders
                GROUP BY o_orderpriority
            )
            SELECT o_orderpriority, order_count, avg_price,
                   ROUND(ROUND(SUM(CAST(ROUND(avg_price*100) AS BIGINT)) OVER ()*1.0/COUNT(*) OVER ())/100.0, 2) AS overall_avg,
                   ROUND(avg_price - ROUND(ROUND(SUM(CAST(ROUND(avg_price*100) AS BIGINT)) OVER ()*1.0/COUNT(*) OVER ())/100.0, 2), 2) AS diff_from_overall
            FROM g
            ORDER BY o_orderpriority
        """,
        "q4_brand_rank": """
            WITH brand_stats AS (
                SELECT p_brand,
                       COUNT(*) AS line_count,
                       COUNT(DISTINCT l_suppkey) AS supplier_count,
                       ROUND(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT))/100.0, 2) AS total_revenue
                FROM lineitem JOIN part ON l_partkey = p_partkey
                GROUP BY p_brand
                HAVING COUNT(*) >= 100
            )
            SELECT p_brand, line_count, supplier_count, total_revenue,
                   RANK() OVER (ORDER BY line_count DESC, p_brand) AS popularity_rank
            FROM brand_stats
            QUALIFY popularity_rank <= 15
            ORDER BY popularity_rank
        """,
        "q5_event_mix": """
            SELECT event_type,
                   COUNT(*) AS event_count,
                   ROUND(ROUND(SUM(CAST(ROUND(value*100) AS BIGINT))*1.0/COUNT(value))/100.0, 2) AS avg_value,
                   ROUND(SUM(CAST(ROUND(value*100) AS BIGINT))/100.0, 2) AS total_value,
                   ROUND(100.0 * COUNT(*) / NULLIF(SUM(COUNT(*)) OVER (), 0), 2)
                       AS pct_of_events
            FROM events
            GROUP BY event_type
            ORDER BY event_type
        """,
        "t1_filter_lines": """
            SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus,
                   ROUND(l_extendedprice, 2) AS extendedprice
            FROM lineitem
            WHERE UPPER(TRIM(l_returnflag)) = 'N' AND l_extendedprice IS NOT NULL
        """,
        "t2_price_tiers": """
            WITH cuts AS (
                SELECT quantile_cont(l_extendedprice, 0.33) AS c1,
                       quantile_cont(l_extendedprice, 0.67) AS c2
                FROM lineitem
            ),
            tiers AS (
                SELECT CASE WHEN l_extendedprice <= c1 THEN 'LOW'
                            WHEN l_extendedprice <= c2 THEN 'MID'
                            ELSE 'HIGH' END AS tier
                FROM lineitem, cuts
                WHERE l_extendedprice IS NOT NULL
            )
            SELECT tier, COUNT(*) AS tier_count,
                   ROUND(100.0 * COUNT(*) / SUM(COUNT(*)) OVER (), 2) AS tier_pct
            FROM tiers
            GROUP BY tier
            ORDER BY tier
        """,
        "t3_word_count": """
            WITH words AS (
                SELECT regexp_replace(
                           unnest(regexp_split_to_array(lower(trim(text)), '\\s+')),
                           '[^a-z]', '', 'g') AS word
                FROM documents
            )
            SELECT word, COUNT(*) AS word_count
            FROM words
            WHERE length(word) >= 3
              AND word NOT IN ('the','and','for','with','from','this','that',
                               'are','was','not','all','any','can','has',
                               'have','will','you')
            GROUP BY word
            ORDER BY word_count DESC, word
            LIMIT 20
        """,
        "t4_segment_stats": """
            SELECT c_mktsegment,
                   COUNT(*) AS order_count,
                   ROUND(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT))/100.0, 2) AS total_value,
                   ROUND(ROUND(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT))*1.0/COUNT(o_totalprice))/100.0, 2) AS avg_value,
                   COUNT(DISTINCT o_custkey) AS customer_count
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment
            ORDER BY order_count DESC, c_mktsegment
        """,
        "t5_top_nations": """
            SELECT n_name, COUNT(*) AS order_count,
                   ROUND(ROUND(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT))*1.0/COUNT(o_totalprice))/100.0, 2) AS avg_order_value
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
            HAVING COUNT(*) >= 30 AND ROUND(ROUND(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT))*1.0/COUNT(o_totalprice))/100.0, 2) > 0
            ORDER BY avg_order_value DESC, n_name
            LIMIT 20
        """,
        "t5_bottom_nations": """
            SELECT n_name, COUNT(*) AS order_count,
                   ROUND(ROUND(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT))*1.0/COUNT(o_totalprice))/100.0, 2) AS avg_order_value
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
            HAVING COUNT(*) >= 30 AND ROUND(ROUND(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT))*1.0/COUNT(o_totalprice))/100.0, 2) > 0
            ORDER BY avg_order_value ASC, n_name
            LIMIT 10
        """,
        "agg_join_report": """
            WITH base AS (
                SELECT n_name, o_totalprice, o_custkey
                FROM orders
                JOIN customer ON o_custkey = c_custkey
                JOIN nation ON c_nationkey = n_nationkey
            ),
            counts AS (
                SELECT n_name, COUNT(*) AS total_orders,
                       ROUND(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT))/100.0, 2) AS total_value,
                       COUNT(DISTINCT o_custkey) AS distinct_customers
                FROM base GROUP BY n_name
            ),
            sal AS (
                SELECT n_name,
                       ROUND(ROUND(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT))*1.0/COUNT(o_totalprice))/100.0, 2) AS avg_value,
                       ROUND(ROUND(MEDIAN(CAST(ROUND(o_totalprice*100) AS BIGINT)))/100.0, 2) AS median_value
                FROM base GROUP BY n_name
            )
            SELECT counts.n_name, total_orders, total_value, distinct_customers,
                   avg_value, median_value
            FROM counts LEFT JOIN sal USING (n_name)
            ORDER BY total_orders DESC, n_name
        """,
        "priority_mapping_report": """
            SELECT CASE o_orderpriority
                       WHEN '1-URGENT' THEN 'URGENT'
                       WHEN '2-HIGH' THEN 'HIGH'
                       WHEN '3-MEDIUM' THEN 'MEDIUM'
                       WHEN '4-NOT SPECIFIED' THEN 'UNSPECIFIED'
                       WHEN '5-LOW' THEN 'LOW'
                       ELSE 'OTHER' END AS priority_std,
                   COUNT(*) AS order_count,
                   ROUND(ROUND(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT))*1.0/COUNT(o_totalprice))/100.0, 2) AS avg_price
            FROM orders
            GROUP BY priority_std
            ORDER BY priority_std
        """,
    }
