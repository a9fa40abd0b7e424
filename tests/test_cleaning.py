"""Golden invariants for the cleaning pipeline (SURVEY.md §5.2 item 2):
monotone row-count chain mirroring the reference's count checkpoints
(code/01_DataPreprocessing.scala:70-75,110-115), dedup idempotence."""

from __future__ import annotations

from pyspark.sql import functions as F

from jobanalytics_bigdataproject_spark.operators import cleaning


def test_monotone_cleaning_chain(tables):
    raw = tables["lineitem"]
    n_raw = raw.count()
    deduped = cleaning.dedup_by_key(raw, ["l_orderkey", "l_linenumber"])
    n_dedup = deduped.count()
    dropped = cleaning.drop_null_rows(deduped, ["l_orderkey", "l_partkey"])
    n_drop = dropped.count()
    valid = dropped.filter(cleaning.null_or_in_range("l_extendedprice", 0, 5e6))
    n_valid = valid.count()
    assert n_raw >= n_dedup >= n_drop >= n_valid > 0


def test_dedup_idempotent(tables):
    once = cleaning.dedup_by_key(tables["orders"], ["o_orderkey"])
    twice = cleaning.dedup_by_key(once, ["o_orderkey"])
    assert once.count() == twice.count()


def test_deterministic_dedup_total_order(tables):
    a = cleaning.dedup_by_key_deterministic(
        tables["lineitem"], ["l_orderkey", "l_linenumber"], ["l_partkey", "l_suppkey"]
    )
    b = cleaning.dedup_by_key_deterministic(
        tables["lineitem"], ["l_orderkey", "l_linenumber"], ["l_partkey", "l_suppkey"]
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_null_or_in_range_keeps_nulls(spark):
    df = spark.createDataFrame([(None,), (5.0,), (-1.0,), (10.0,)], ["x"])
    kept = df.filter(cleaning.null_or_in_range("x", 0, 6)).collect()
    vals = sorted((r.x is None, r.x) for r in kept)
    assert len(kept) == 2  # NULL and 5.0; -1 and 10 rejected


def test_impute_and_fill(spark):
    df = spark.createDataFrame([(1, None), (2, 3.0)], ["k", "v"])
    filled = cleaning.fill_nulls(df, {"v": 0.0}).collect()
    assert {r.v for r in filled} == {0.0, 3.0}
    imp = cleaning.impute(df, "v", -1.0).collect()
    assert {r.v for r in imp} == {-1.0, 3.0}


def test_cross_column_guard(spark):
    df = spark.createDataFrame(
        [(1.0, 2.0), (3.0, 1.0), (None, 5.0)], ["lo", "hi"]
    )
    kept = cleaning.filter_cross_column(df, "lo", "hi")
    assert kept.count() == 2  # (1,2) and (None,5); (3,1) rejected


def test_mad_outlier_report_hand_case(spark):
    """9 tight values + one wild one: z-score with the outlier included
    would need sigma ~ the outlier itself; MAD flags it cleanly."""
    from jobanalytics_bigdataproject_spark.operators.cleaning import mad_outlier_report

    rows = [("A", float(v)) for v in (10, 10, 11, 11, 12, 12, 13, 13, 14, 1000)]
    rows += [("B", 5.0), ("B", 5.0), ("B", 5.0)]
    df = spark.createDataFrame(rows, ["l_returnflag", "l_extendedprice"])
    out = {r.l_returnflag: r for r in mad_outlier_report(df).collect()}
    assert out["A"].n_rows == 10 and out["A"].n_outliers == 1
    assert out["A"].median_value == 12.0
    # group of identical values: MAD 0, nothing flagged (dev > 3*0 only if dev>0)
    assert out["B"].n_outliers == 0 and out["B"].mad_value == 0.0
