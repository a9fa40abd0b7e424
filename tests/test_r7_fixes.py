"""Round-7 regression tests for the r6 ADVICE findings.

Covers: decimal-typed prune bounds across a magnitude boundary (string
stats compare lexicographically — '9.5' > '10.00' — so numeric caller
bounds must force exact-Decimal comparison in every stats tier), NULL
text tolerance in the model-based language classifier, and the
classifier's save/load round-trip not leaking temp directories.
"""
from __future__ import annotations

import decimal
import glob
import os

import pytest
from pyspark.sql import functions as F

from jobanalytics_bigdataproject_spark.sources import snapshots as snap

D = decimal.Decimal


@pytest.fixture()
def dec_table(spark, tmp_path):
    """Two files of DECIMAL(10,2) prices, one per side of the 10.00
    magnitude boundary plus one straddler — the lexicographic trap."""
    t = str(tmp_path / "dec_tbl")
    lowf = spark.createDataFrame(
        [(1, D("8.10")), (2, D("8.90"))], "id int, price decimal(10,2)"
    ).repartition(1)
    straddle = spark.createDataFrame(
        [(3, D("9.50")), (4, D("10.50"))], "id int, price decimal(10,2)"
    ).repartition(1)
    highf = spark.createDataFrame(
        [(5, D("11.00")), (6, D("12.00"))], "id int, price decimal(10,2)"
    ).repartition(1)
    snap.write_snapshot(lowf, t, mode="overwrite", stats_cols=["price"])
    snap.write_snapshot(straddle, t, stats_cols=["price"])
    snap.write_snapshot(highf, t, stats_cols=["price"])
    return t


def test_decimal_prune_keeps_straddler(spark, dec_table):
    # ADVICE r6 (medium): min='9.50' > hi='10.00' lexicographically, so
    # the straddling file was silently pruned. prune is file-granular —
    # apply the row filter on top, like every caller must.
    got = (
        snap.read_snapshot(
            spark, dec_table, prune={"price": (D("9.80"), D("10.00"))}
        )
        .where(F.col("price").between(D("9.80"), D("10.00")))
        .collect()
    )
    # the straddler holds no row in [9.80, 10.00] but MUST be scanned;
    # widen slightly to prove rows actually survive
    got2 = (
        snap.read_snapshot(
            spark, dec_table, prune={"price": (D("9.40"), D("10.00"))}
        )
        .select("id")
        .where(F.col("price").between(D("9.40"), D("10.00")))
        .collect()
    )
    assert got == []
    assert sorted(r.id for r in got2) == [3]


def test_decimal_prune_still_skips_disjoint(spark, dec_table):
    # numeric-domain compare must still PRUNE what is provably disjoint:
    # only the low file overlaps [8.00, 8.95]
    df = snap.read_snapshot(spark, dec_table, prune={"price": (D("8.00"), D("8.95"))})
    assert sorted(r.id for r in df.collect()) == [1, 2]
    assert df.inputFiles() and len(df.inputFiles()) == 1


def test_decimal_count_where_magnitude_boundary(spark, dec_table):
    out = snap.count_where(spark, dec_table, "price", D("9.00"), D("11.50"))
    truth = (
        snap.read_snapshot(spark, dec_table)
        .where(F.col("price").between(D("9.00"), D("11.50")))
        .count()
    )
    assert out["n_rows"] == truth == 3
    # the fully-covered high file [11.00, 12.00] ⊄ [9.00, 11.50]; the low
    # file [8.10, 8.90] is provably disjoint and must be skipped
    assert out["files_skipped"] >= 1


def test_decimal_delete_range(spark, dec_table):
    res = snap.delete_range(spark, dec_table, "price", D("10.90"), D("12.50"))
    # [11.00, 12.00] is fully covered by [10.90, 12.50] → zero-I/O drop
    # (rows_deleted counts the dropped file's rows; nothing rewritten)
    assert res["files_dropped"] == 1 and res["files_rewritten"] == 0
    left = sorted(
        r.id for r in snap.read_snapshot(spark, dec_table).select("id").collect()
    )
    assert left == [1, 2, 3, 4]  # 11.00 and 12.00 gone, straddler kept


def test_language_model_null_text(spark):
    # ADVICE r6 (low): NULL text crashed RegexTokenizer inside the
    # model-based classifier; the heuristic path tolerates NULLs.
    from jobanalytics_bigdataproject_spark.ml.language import (
        doc_language_classifier,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog and runs away"),
            (2, None),
            (3, "el perro corre por la calle y salta sobre la mesa grande"),
        ],
        "doc_id int, text string",
    )
    out = doc_language_classifier(docs, text_col="text")
    rows = {r.doc_id: r for r in out.collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[2].predicted_lang is not None  # scored (fallback), not crashed


def test_language_model_no_tmpdir_leak(spark, tmp_path, monkeypatch):
    # ADVICE r6 (low): every save/load round-trip left a mkdtemp behind.
    import tempfile

    from jobanalytics_bigdataproject_spark.ml.language import (
        doc_language_classifier,
    )

    monkeypatch.setenv("TMPDIR", str(tmp_path))
    tempfile.tempdir = None  # force re-read of TMPDIR
    try:
        docs = spark.createDataFrame(
            [
                (i, "the quick brown fox jumps over the lazy dog again and again")
                for i in range(30)
            ]
            + [
                (100 + i, "el perro grande corre por la calle y salta la mesa")
                for i in range(30)
            ],
            "doc_id int, text string",
        )
        doc_language_classifier(docs, text_col="text").collect()
        leftovers = [
            p
            for p in glob.glob(str(tmp_path / "*"))
            if os.path.isdir(p)
        ]
        assert leftovers == []
    finally:
        tempfile.tempdir = None
