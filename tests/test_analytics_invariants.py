"""Query invariants (SURVEY.md §5.2 item 2): tier pcts ≈ 100, rank ≤ k with
ties, window math, multimodal plumbing, null-injection robustness."""

from __future__ import annotations

from pyspark.sql import functions as F

from jobanalytics_bigdataproject_spark.operators import analytics, multimodal


def test_tier_percentages_sum_100(tables):
    out = analytics.t2_price_tiers(tables["lineitem"]).collect()
    assert abs(sum(r.tier_pct for r in out) - 100.0) < 0.05
    assert {r.tier for r in out} == {"LOW", "MID", "HIGH"}


def test_rank_bounded_with_ties(tables):
    out = analytics.q4_brand_rank(tables["lineitem"], tables["part"], min_lines=10).collect()
    assert all(r.popularity_rank <= 15 for r in out)
    ranks = [r.popularity_rank for r in out]
    assert ranks == sorted(ranks)


def test_q3_diff_consistency(tables):
    rows = analytics.q3_priority_vs_overall(tables["orders"]).collect()
    overall = {r.overall_avg for r in rows}
    assert len(overall) == 1  # same overall for every group
    for r in rows:
        assert abs(r.diff_from_overall - round(r.avg_price - r.overall_avg, 2)) < 0.011


def test_null_injection_does_not_change_nonnull_groups(spark, tables):
    """A10 semantics: avg ignores NULLs — injecting null-price orders must
    not change any group's avg (SURVEY.md §5.2 item 3)."""
    orders = tables["orders"]
    schema_cols = orders.columns
    nulls = orders.limit(50).withColumn("o_totalprice", F.lit(None).cast("double"))
    polluted = orders.select(*schema_cols).unionByName(nulls.select(*schema_cols))
    base = {
        r.o_orderpriority: r.avg_price
        for r in analytics.q3_priority_vs_overall(orders).collect()
    }
    with_nulls = {
        r.o_orderpriority: r.avg_price
        for r in analytics.q3_priority_vs_overall(polluted).collect()
    }
    assert base == with_nulls


def test_duplicate_injection_changes_counts_not_keys(tables):
    orders = tables["orders"]
    doubled = orders.unionByName(orders.limit(100))
    base_keys = {r.priority_std for r in analytics.priority_mapping_report(orders).collect()}
    dup_keys = {r.priority_std for r in analytics.priority_mapping_report(doubled).collect()}
    assert base_keys == dup_keys


def test_multimodal_feature_plumbing(tables):
    media = multimodal.attach_binary_payload(tables["documents"].limit(20))
    feats = multimodal.extract_features(media, dim=8).collect()
    assert len(feats) == 20
    for r in feats:
        assert len(r.feat) == 8
        assert all(0.0 <= v <= 1.0 for v in r.feat)
        assert r.n_bytes > 0 and len(r.checksum) == 32


def test_multimodal_rejects_non_bmp_payload(tables):
    # the image decoder is real, so a non-image payload must fail loudly
    # (ValueError from the BMP parser), not silently produce features
    import pytest

    media = multimodal.attach_binary_payload(tables["documents"].limit(1))
    with pytest.raises(Exception, match="not a BMP payload"):
        multimodal.decode_image(media).collect()


def test_entry_contract(spark):
    import __spark_entry__ as mod

    df = mod.entry(spark)
    assert df.count() > 0
    qs = mod.queries()
    oracles = mod.oracle_sql()
    assert set(oracles) <= set(qs)


def test_promo_revenue_ratio_hand_computed(spark):
    import datetime

    from jobanalytics_bigdataproject_spark.operators.analytics import promo_revenue_ratio

    li = spark.createDataFrame(
        [
            (1, datetime.date(2024, 1, 5), 100.0, 0.10),   # promo part, 9000 cents
            (2, datetime.date(2024, 1, 9), 50.0, 0.00),    # non-promo, 5000 cents
            (1, datetime.date(2024, 2, 1), 10.0, 0.50),    # promo, 500 cents
        ],
        ["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )
    part = spark.createDataFrame(
        [(1, "ECONOMY"), (2, "STANDARD")], ["p_partkey", "p_type"]
    )
    out = {r.ship_month: r for r in promo_revenue_ratio(li, part).collect()}
    assert out[1].promo_cents == 9000 and out[1].total_cents == 14000
    assert out[1].promo_share == 0.6429                     # round(9000/14000, 4dp)
    assert out[2].promo_cents == 500 and out[2].total_cents == 500
    assert out[2].promo_share == 1.0
