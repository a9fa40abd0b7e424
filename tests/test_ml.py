"""ML pipeline (SURVEY.md §5.2 item 4): fits at sf0.001, beats the mean
baseline on R², prediction count == test count, back-transform positive.
Seeds pinned to 42 like the reference; metric thresholds only — never
prediction hashes (SURVEY.md §7.4 item 4)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from jobanalytics_bigdataproject_spark.ml import pipeline as mlp


@pytest.fixture(scope="module")
def fitted(spark, tables):
    df = mlp.make_training_frame(tables["lineitem"], tables["part"])
    train, test = df.randomSplit([0.7, 0.3], mlp.SEED)
    feat = mlp.build_feature_pipeline().fit(train)
    train_f = feat.transform(train)
    test_f = feat.transform(test)
    models = mlp.train_regressors(
        train_f, lr_max_iter=20, rf_trees=10, rf_depth=5, gbt_max_iter=10
    )
    mean_label = train.agg(F.avg("label")).first()[0]
    return train, test, feat, models, test_f, mean_label


def test_models_beat_baseline(fitted):
    _, _, _, models, test_f, mean_label = fitted
    metrics = {
        r.model: r for r in mlp.evaluate_models(models, test_f, mean_label).collect()
    }
    assert set(metrics) == {"baseline_mean", "lr", "rf", "gbt"}
    assert abs(metrics["baseline_mean"].r2) < 0.05  # mean predictor ⇒ R²≈0
    for m in ("lr", "rf", "gbt"):
        assert metrics[m].r2 > metrics["baseline_mean"].r2
        assert metrics[m].rmse < metrics["baseline_mean"].rmse


def test_prediction_count_matches(fitted):
    _, test, _, models, test_f, _ = fitted
    preds = models["lr"].transform(test_f)
    assert preds.count() == test_f.count()


def test_feature_importances_topk(fitted):
    _, _, _, models, _, _ = fitted
    top = mlp.top_feature_importances(models["rf"], k=15)
    assert 0 < len(top) <= 15
    assert all(imp >= 0 for _, imp in top)
    assert top == sorted(top, key=lambda p: -p[1])


def test_back_transform_positive(fitted):
    _, _, _, models, test_f, _ = fitted
    out = mlp.back_transform(models["lr"].transform(test_f))
    assert out.filter(F.col("prediction_price") <= -1).count() == 0


def test_fpgrowth_itemsets_match_hand_enumeration(spark):
    from datetime import datetime

    from jobanalytics_bigdataproject_spark.ml.pipeline import frequent_event_itemsets

    # 4 users: baskets {a,b}, {a,b}, {a,c}, {b}
    rows = []
    eid = 0
    for uid, types in [(1, "ab"), (2, "ab"), (3, "ac"), (4, "b")]:
        for t in types:
            rows.append((uid, eid, datetime(2024, 1, 1), t))
            eid += 1
    ev = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp, event_type string")
    out = {tuple(r.itemset): (r.n_users_with_set, r.support_bp)
           for r in frequent_event_itemsets(ev, min_support=0.5).collect()}
    # support >= 0.5 of 4 users = >= 2 users
    assert out == {
        ("a",): (3, 7500),
        ("b",): (3, 7500),
        ("a", "b"): (2, 5000),
    }


def test_doc_quality_classifier_distills_heuristic(spark, tables):
    from pyspark.ml.evaluation import BinaryClassificationEvaluator

    from jobanalytics_bigdataproject_spark.ml.quality import doc_quality_classifier

    out = doc_quality_classifier(tables["documents"]).cache()
    try:
        n_docs = tables["documents"].count()
        assert out.count() == n_docs  # every doc scored, middle band included
        assert out.filter("prob_good < 0 OR prob_good > 1").count() == 0
        # the distilled model must rank HELD-OUT extreme-band docs almost
        # perfectly (it never trained on them)
        hold = out.filter("split = 'holdout' AND label IS NOT NULL")
        assert hold.count() > 10
        auc = BinaryClassificationEvaluator(
            rawPredictionCol="prob_good", labelCol="label"
        ).evaluate(hold)
        assert auc > 0.9
        # deterministic split membership: same doc, same split, every run
        again = doc_quality_classifier(tables["documents"])
        a = {r.doc_id: r.split for r in out.select("doc_id", "split").collect()}
        b = {r.doc_id: r.split for r in again.select("doc_id", "split").collect()}
        assert a == b
    finally:
        out.unpersist()


def test_als_affinity_ranks_observed_behavior_first(spark):
    from jobanalytics_bigdataproject_spark.ml.pipeline import als_event_affinity

    rows = [(1, "click")] * 50 + [(1, "view")] * 2 \
         + [(2, "purchase")] * 50 + [(2, "view")] * 2
    ev = spark.createDataFrame(rows, "user_id long, event_type string")
    out = als_event_affinity(ev).collect()
    top = {r.user_id: r.event_type for r in out if r.rank_n == 1}
    # each user's dominant observed behavior must rank first
    assert top == {1: "click", 2: "purchase"}
    # full top-3 per user, contiguous ranks
    by_user = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r.rank_n)
    assert all(sorted(v) == [1, 2, 3] for v in by_user.values())
    # never-exhibited behavior scores below exhibited ones for user 1
    u1 = {r.event_type: r.affinity_bp for r in out if r.user_id == 1}
    assert u1["purchase"] < u1["click"] and u1["purchase"] < u1["view"]


def test_lda_topics_structure_and_ranking(spark, tables):
    from jobanalytics_bigdataproject_spark.ml.quality import lda_topics

    out = lda_topics(tables["documents"], k=3, top_terms=5).collect()
    assert len(out) == 3 * 5  # one row per (topic, rank)
    by_topic = {}
    for r in out:
        by_topic.setdefault(r.topic, []).append(r)
    assert sorted(by_topic) == [0, 1, 2]
    for rows in by_topic.values():
        ranks = [r.rank for r in sorted(rows, key=lambda r: r.rank)]
        assert ranks == [0, 1, 2, 3, 4]  # contiguous ranks
        weights = [r.weight_micro for r in sorted(rows, key=lambda r: r.rank)]
        assert weights == sorted(weights, reverse=True)  # descending
        assert all(w > 0 for w in weights)
        assert all(isinstance(r.term, str) and r.term for r in rows)
    # seed-pinned: same call, same result (EM determinism given the seed)
    again = lda_topics(tables["documents"], k=3, top_terms=5).collect()
    assert [(r.topic, r.rank, r.term) for r in out] == [
        (r.topic, r.rank, r.term) for r in again
    ]
