"""Persisted classifier stores (ml/model_store.py — VERDICT r9 #2):
fit-once / score-on-arrival for the quality and language models.

The load-bearing law is score-from-STORE == score-from-FRESH-FIT at
fixed seed/params on the same corpus: the persisted PipelineModel plus
the sidecar'd cutoffs/class-mapping must reproduce exactly what the
in-query cold path computes. Plus: exactly-once scoring sinks,
maintain()-driven refresh, kind-mismatch refusal, degenerate-corpus
refusal, and DESCRIBE DETAIL-style telemetry.
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jobanalytics_bigdataproject_spark.ml import model_store
from jobanalytics_bigdataproject_spark.ml.language import doc_language_classifier
from jobanalytics_bigdataproject_spark.ml.quality import doc_quality_classifier
from tests.test_language_model import _corpus


def _docs(tables):
    return tables["documents"].select("doc_id", "text")


def test_quality_store_matches_fresh_fit(spark, tables, tmp_path):
    """save → score-from-store reproduces the cold path's output on the
    same corpus: identical (split, label, pred), prob_good to 1e-6 —
    the fit is deterministic given identical data/partitioning, and the
    store round-trip must not perturb it."""
    docs = _docs(tables)
    store = str(tmp_path / "qmodel")
    meta = model_store.save_quality_model(docs, store)
    assert meta["kind"] == "quality" and len(meta["cuts"]) == 2

    fresh = {r.doc_id: r for r in doc_quality_classifier(docs).collect()}
    stored = {r.doc_id: r for r in model_store.score_quality(spark, docs, store).collect()}
    assert set(fresh) == set(stored) and len(fresh) > 0
    for did, fr in fresh.items():
        sr = stored[did]
        assert (fr.split, fr.label, fr.pred) == (sr.split, sr.label, sr.pred)
        assert abs(fr.prob_good - sr.prob_good) <= 1e-6


def test_quality_store_scores_unseen_arrivals(spark, tables, tmp_path):
    """The point of the store: a batch the fit NEVER saw scores without
    refitting, labeled by the TRAINED cutoffs (not its own batch
    percentiles)."""
    docs = _docs(tables)
    train = docs.filter(F.col("doc_id") % 2 == 0)
    arrivals = docs.filter(F.col("doc_id") % 2 == 1)
    store = str(tmp_path / "qmodel")
    model_store.save_quality_model(train, store)
    out = model_store.score_quality(spark, arrivals, store)
    rows = out.collect()
    assert len(rows) == arrivals.count()
    assert all(r.prob_good is not None for r in rows)


def test_language_store_matches_fresh_fit(spark, tmp_path):
    docs = _corpus(spark)
    store = str(tmp_path / "lmodel")
    meta = model_store.save_language_model(docs.select("doc_id", "text"), store)
    assert meta["kind"] == "language" and len(meta["langs"]) >= 2

    fresh = {
        r.doc_id: r
        for r in doc_language_classifier(docs.select("doc_id", "text")).collect()
    }
    stored = {
        r.doc_id: r
        for r in model_store.score_language(
            spark, docs.select("doc_id", "text"), store
        ).collect()
    }
    assert set(fresh) == set(stored)
    for did, fr in fresh.items():
        sr = stored[did]
        assert (fr.split, fr.heuristic_lang, fr.model_lang, fr.predicted_lang) == (
            sr.split, sr.heuristic_lang, sr.model_lang, sr.predicted_lang
        )
        assert abs(fr.model_prob - sr.model_prob) <= 1e-6


def test_language_degenerate_corpus_refused(spark, tmp_path):
    """< 2 confident classes: no model exists to persist — loud refusal
    naming the heuristic, never a store that silently scores
    differently than the caller believes."""
    one_lang = spark.createDataFrame(
        [(i, "the house and the water with the people from the world")
         for i in range(20)],
        "doc_id long, text string",
    )
    with pytest.raises(ValueError, match="heuristic"):
        model_store.save_language_model(one_lang, str(tmp_path / "lmodel"))


def test_kind_mismatch_refused(spark, tables, tmp_path):
    store = str(tmp_path / "qmodel")
    model_store.save_quality_model(_docs(tables), store)
    with pytest.raises(ValueError, match="quality"):
        model_store.score_language(spark, _docs(tables), store)
    with pytest.raises(FileNotFoundError, match="model store"):
        model_store.score_quality(spark, _docs(tables), str(tmp_path / "nope"))


def test_quality_sink_exactly_once(spark, tables, tmp_path):
    """foreachBatch score-on-arrival: batches commit as snapshot versions
    keyed by batch id; a RETRY of a batch no-ops; scores equal the
    direct store scoring of the same batch (no refit drift in the hot
    path — there is no fit in the hot path at all)."""
    from jobanalytics_bigdataproject_spark.sources import snapshots as sn

    docs = _docs(tables)
    store = str(tmp_path / "qmodel")
    out = str(tmp_path / "scored")
    model_store.save_quality_model(docs.filter(F.col("doc_id") % 2 == 0), store)
    sink = model_store.quality_score_sink(spark, store, out)

    b1 = docs.filter(F.col("doc_id") % 4 == 1)
    b2 = docs.filter(F.col("doc_id") % 4 == 3)
    sink(b1, 0)
    sink(b2, 1)
    live = sn.read_snapshot(spark, out)
    assert live.count() == b1.count() + b2.count()
    v = sn.current_version(spark, out)
    sink(b2, 1)  # Spark retries a failed micro-batch with the SAME id
    assert sn.current_version(spark, out) == v
    assert sn.read_snapshot(spark, out).count() == b1.count() + b2.count()

    direct = {r.doc_id: r.prob_good
              for r in model_store.score_quality(spark, b1, store).collect()}
    from_sink = {r.doc_id: r.prob_good
                 for r in live.join(b1.select("doc_id"), "doc_id").collect()}
    assert direct == from_sink


def test_language_sink_exactly_once(spark, tmp_path):
    from jobanalytics_bigdataproject_spark.sources import snapshots as sn

    docs = _corpus(spark).select("doc_id", "text")
    store = str(tmp_path / "lmodel")
    out = str(tmp_path / "scored")
    model_store.save_language_model(docs, store)
    sink = model_store.language_id_sink(spark, store, out)
    b1 = docs.filter(F.col("doc_id") < 50)
    sink(b1, 0)
    v = sn.current_version(spark, out)
    sink(b1, 0)
    assert sn.current_version(spark, out) == v
    assert sn.read_snapshot(spark, out).count() == b1.count()


def test_maintain_refreshes_stale_model(spark, tables, tmp_path):
    """The maintain() hook: a model older than model_max_age_s refits
    from its corpus with the STORED params; a fresh one is left alone.
    The refreshed store must still score (the sidecar + pipeline were
    atomically re-saved)."""
    from jobanalytics_bigdataproject_spark.sources import snapshots as sn
    from jobanalytics_bigdataproject_spark.sources.maintenance import maintain

    docs = _docs(tables)
    corpus_path = str(tmp_path / "corpus.parquet")
    docs.write.parquet(corpus_path)
    store = str(tmp_path / "qmodel")
    meta0 = model_store.save_quality_model(docs, store)

    # maintain needs a snapshot table to service; a tiny one will do
    tbl = str(tmp_path / "tbl")
    sn.write_snapshot(spark.createDataFrame([(1, "a")], "k int, v string"), tbl)

    res = maintain(
        spark, tbl,
        model_stores=[(store, corpus_path)], model_max_age_s=1e9,
    )
    assert res["model_refreshed"] == {store: False}  # fresh: left alone

    res = maintain(
        spark, tbl,
        model_stores=[(store, corpus_path)], model_max_age_s=0.0,
    )
    assert res["model_refreshed"] == {store: True}
    meta1 = model_store.read_meta(spark, store)
    assert meta1["fitted_utc"] > meta0["fitted_utc"]
    assert meta1["params"] == meta0["params"]  # refresh never moves the dials
    assert model_store.score_quality(spark, docs, store).count() == docs.count()


def test_model_detail_telemetry(spark, tables, tmp_path):
    store = str(tmp_path / "qmodel")
    model_store.save_quality_model(_docs(tables), store)
    d = model_store.model_detail(spark, store)
    assert d["kind"] == "quality"
    assert d["pipeline_bytes"] > 0
    assert d["age_s"] >= 0
    assert len(d["cuts"]) == 2
    assert d["params"]["n_features"] == 1 << 15


def test_supervised_language_store_scores_unlabeled_arrivals(spark, tmp_path):
    """label_col is a FIT-time concern: a store fit with label_col="lang"
    must score an arrival batch that carries only (doc_id, text) — the
    exact corpus the store exists to serve (review finding r10)."""
    docs = _corpus(spark)
    store = str(tmp_path / "lmodel")
    model_store.save_language_model(docs, store, label_col="lang")
    arrivals = docs.select("doc_id", "text").filter("doc_id < 40")
    out = model_store.score_language(spark, arrivals, store)
    rows = out.collect()
    assert len(rows) == 40
    assert all(r.predicted_lang is not None for r in rows)
    # and the sink path (the production consumer) works end-to-end
    from jobanalytics_bigdataproject_spark.sources import snapshots as sn

    out_tbl = str(tmp_path / "scored")
    model_store.language_id_sink(spark, store, out_tbl)(arrivals, 0)
    assert sn.read_snapshot(spark, out_tbl).count() == 40
