"""[EXT] Model-based document quality filtering — the production second
stage of an LLM-data pipeline (the FineWeb-Edu / DCLM pattern): the cheap
per-row heuristic (`operators/text.quality_score`) labels the extremes of
the corpus, a text classifier distills those labels, and the MODEL's
probability then scores every document — including the ambiguous middle
band the heuristic can't rank, and (in production) future crawl batches
without re-deriving labels.

The reference has no classifier surface; this composes the engine's own
pieces: heuristic scorer → exact percentile cutoffs (one broadcast scalar
row) → deterministic md5 train/holdout split (same device as
`corpus.hash_split`, so membership is stable across runs/engines) →
HashingTF/IDF/LogisticRegression (MLlib distributed implementations).

Split into FIT and SCORE halves (VERDICT r9 #2): ``fit_quality_pipeline``
produces a native-serializable ``PipelineModel`` (HashingTF → IDFModel →
LogisticRegressionModel) plus the label cutoffs; ``score_quality_with``
is the stateless scoring pass that runs on any corpus — including future
arrival batches that never see a fit. ``ml/model_store.py`` persists the
pair beside the sketch/dedup stores and adds the score-on-arrival sink;
``doc_quality_classifier`` below stays as the fit-then-score COLD path
with its original signature and output.

Scale shape: bounded corpus passes, each one scan — the IDF
doc-frequency fit (a treeAggregate producing one 2^15 vector), the LR
fit (iterating ONLY over the labeled extreme bands, ~2/3 of rows,
materialized as cached feature vectors so the corpus is not re-scanned
per iteration), and one stateless scoring pass. HashingTF itself is a
per-row map into a fixed 2^15-dim sparse vector — no vocabulary state
at all, which is WHY it scales where a fitted CountVectorizer needs a
vocab broadcast. The exact global percentile cutoffs buffer the score column per
partition — at 100 TB swap in `approx_percentile` (the documented
sketch path, same as `operators/sampling.py`).
"""

from __future__ import annotations

from pyspark.ml import PipelineModel
from pyspark.ml.classification import LogisticRegression
from pyspark.ml.feature import IDF, HashingTF
from pyspark.ml.functions import vector_to_array
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jobanalytics_bigdataproject_spark.functions.textfns import tokenize
from jobanalytics_bigdataproject_spark.operators.text import quality_score


def _labeled_base(
    documents: DataFrame,
    lo: float,
    hi: float,
    train_bp: int,
    salt: str,
    scores: DataFrame | None = None,
) -> DataFrame:
    """doc_id + tokens + distillation label (1 = top band, 0 = bottom band,
    NULL = middle) + deterministic md5 train/holdout split. The cutoffs
    are FIT-TIME artifacts: at score time the stored (lo, hi) apply, so
    new arrivals are labeled by the trained operating point, not their
    own batch's percentiles. ``scores`` lets the fit path pass its cached
    (doc_id, quality_score) frame so the heavy per-row heuristic runs
    once, not once per consumer."""
    from jobanalytics_bigdataproject_spark.sources.readers import fan_out_scan

    # fan_out_scan (guide §2.5): the per-row heuristic scoring and the
    # tokenize both re-read every document; identity at real scale
    documents = fan_out_scan(documents)
    qs = (
        scores
        if scores is not None
        else quality_score(documents).select("doc_id", "quality_score")
    )
    bucket = F.substring(
        F.md5(F.concat_ws(":", F.col("doc_id").cast("string"), F.lit(salt))), 1, 4
    )
    t_train = f"{(train_bp * 65536) // 10000:04x}"
    return (
        documents.select("doc_id", tokenize("text", min_len=1).alias("toks"))
        .join(qs, "doc_id")
        .select(
            "doc_id",
            "toks",
            F.when(F.col("quality_score") >= F.lit(hi), F.lit(1.0))
            .when(F.col("quality_score") <= F.lit(lo), F.lit(0.0))
            .alias("label"),
            F.when(bucket < t_train, F.lit("train"))
            .otherwise(F.lit("holdout"))
            .alias("split"),
        )
    )


def fit_quality_pipeline(
    documents: DataFrame,
    n_features: int = 1 << 15,
    train_bp: int = 8000,
    salt: str = "split:v1",
) -> tuple[PipelineModel, tuple[float, float]]:
    """Fit the distilled quality classifier; returns the native-
    serializable ``PipelineModel`` (HashingTF → IDFModel → LRModel) and
    the heuristic-score percentile cutoffs ``(lo, hi)`` the labels used.

    Labels: top third of the heuristic score = 1, bottom third = 0,
    middle band = NULL (excluded from training — distillation only
    trusts the heuristic where it is confident). IDF is fit on the
    labeled train subset only (no leakage)."""
    from jobanalytics_bigdataproject_spark.sources.readers import (
        fan_out_scan,
        right_size_for_iterations,
    )

    documents = fan_out_scan(documents)  # see _labeled_base
    # The per-row heuristic is the most expensive map in this fit and was
    # recomputed by the cutoff aggregate AND the labeled base; score it
    # ONCE into a bounded (doc_id, score) cache shared by both (dropped
    # before returning, so repeated fits recompute from the input).
    scored = quality_score(documents).select("doc_id", "quality_score").cache()
    lo, hi = scored.agg(
        F.percentile("quality_score", F.lit([1.0 / 3, 2.0 / 3])).alias("c")
    ).first()["c"]
    base = _labeled_base(documents, lo, hi, train_bp, salt, scores=scored)
    # the tokenized/labeled base feeds the IDF fit, the train count and
    # the train cache below — one cache saves two tokenize+hash passes
    base = base.cache()

    tf = HashingTF(inputCol="toks", outputCol="tf", numFeatures=n_features)
    with_tf = tf.transform(base)
    train_labeled = with_tf.filter("split = 'train' AND label IS NOT NULL")
    idf_model = IDF(inputCol="tf", outputCol="features").fit(train_labeled)
    featurized = idf_model.transform(with_tf)

    train = featurized.filter("split = 'train' AND label IS NOT NULL").select(
        "features", "label"
    )
    # right-size for the 50-iteration LBFGS loop: one task per partition
    # per iteration, so the fanned-out featurize partitioning must not
    # leak into the cached training set (readers.right_size_for_iterations)
    train = right_size_for_iterations(train, train.count())
    train.cache().count()  # materialize before the iterative fit
    try:
        lr = LogisticRegression(
            maxIter=50, regParam=0.01, featuresCol="features", labelCol="label"
        )
        model = lr.fit(train)
    finally:
        train.unpersist()
        base.unpersist()
        scored.unpersist()

    # Drop the training summary before the model is used for scoring: the
    # fitted model's summary pins the SparkSession, and the scoring task
    # closure serializes the model — which explodes with
    # NotSerializableException(ObservationManager) once ANY Observation has
    # materialized the session's manager (order-dependent under a shared
    # session; reproduced via etl's observe mode). A write/load round-trip
    # is the supported way to shed the summary; the artifact is one 2^15
    # coefficient vector.
    import shutil
    import tempfile

    from pyspark.ml.classification import LogisticRegressionModel

    path = tempfile.mkdtemp(prefix="doc_quality_lr_")
    try:
        model.write().overwrite().save(path)
        model = LogisticRegressionModel.load(path)
    finally:
        shutil.rmtree(path, ignore_errors=True)

    return PipelineModel(stages=[tf, idf_model, model]), (float(lo), float(hi))


def score_quality_with(
    model: PipelineModel,
    cuts: tuple[float, float],
    documents: DataFrame,
    train_bp: int = 8000,
    salt: str = "split:v1",
) -> DataFrame:
    """The stateless scoring pass: label/split columns from the STORED
    cutoffs (so the output schema and label semantics match the fit-time
    corpus view), then one ``PipelineModel.transform``. Output columns:
    ``doc_id, split, label, prob_good, pred`` — identical to
    ``doc_quality_classifier``."""
    lo, hi = cuts
    base = _labeled_base(documents, lo, hi, train_bp, salt)
    return model.transform(base).select(
        "doc_id",
        "split",
        "label",
        F.round(vector_to_array("probability")[1], 6).alias("prob_good"),
        F.col("prediction").alias("pred"),
    )
    # no presentation sort: D-sized output; rows-only (float model scores)


def doc_quality_classifier(
    documents: DataFrame,
    n_features: int = 1 << 15,
    train_bp: int = 8000,
    salt: str = "split:v1",
) -> DataFrame:
    """Distill the heuristic quality score into a logistic-regression text
    classifier; return every document scored by the model — the COLD
    path (fit + score in one call). Steady-state serving persists the
    fit once via ``ml/model_store.py`` and scores arrivals against it.

    Output columns: ``doc_id, split, label, prob_good, pred``.
    """
    model, cuts = fit_quality_pipeline(documents, n_features, train_bp, salt)
    return score_quality_with(model, cuts, documents, train_bp, salt)


def lda_topics(
    documents: DataFrame,
    k: int = 5,
    vocab_size: int = 256,
    max_iter: int = 20,
    top_terms: int = 7,
    text_col: str = "text",
    seed: int = 42,
    em_partitions: int = 8,
) -> DataFrame:
    """[EXT] Corpus topic discovery via MLlib LDA (Blei et al. 2003; the
    distributed EM optimizer, Spark's graph-based implementation): what a
    training-data pipeline runs to AUDIT a corpus mix — "what is actually
    in this crawl?" — before choosing mixture weights. Completes the
    MLlib family next to the regressors, FPGrowth, ALS, and the
    KMeans-at-ingest quantizers.

    Pipeline: whitespace tokenize (the fixture is pre-normalized; real
    corpora reuse textfns' regex tokenizer) → CountVectorizer (bounded
    ``vocab_size``: the model is vocab × k, broadcast-sized by
    construction) → LDA(k, em, seed pinned). EM is deterministic given
    the seed, but term WEIGHTS are iterative floats — so this is
    rows-only evidence by design (SURVEY §5.3, like the other MLlib
    members); the test pins structure (k topics, ``top_terms`` ranked
    vocabulary members each, weights descending and positive).

    Output: one row per (topic, rank): topic id, rank, term string,
    weight in integer micro-units (deterministic presentation of the
    float posterior).

    Scale: LDA-EM shuffles the doc-term graph per iteration — inherent
    to the algorithm and linear in corpus tokens; the describeTopics
    result is k × top_terms rows (driver-tiny). The vocabulary array is
    broadcast via the CV model, never collected per-row.

    ``em_partitions`` (r11, VERDICT r10 #2): the VECTORIZED corpus is
    round-robin repartitioned to this FIXED constant before the EM fit,
    so every EM iteration runs ``em_partitions`` tasks instead of
    inheriting a single-row-group scan's one task — measured 2× on the
    whole query (ldafit 9.5 → 4.0-4.7 s at sf0.1). Determinism notes,
    learned the hard way (r10's attempt was rejected):
    - the repartition must come AFTER CountVectorizer.fit: CV breaks
      vocabulary ties in RDD.top's partition-merge order, so fanning the
      TOKEN frame reorders tied vocab entries run-to-run and the seeded
      topics diverge (reproduced in the r11 A/B: prep fanned →
      run0 != run1; corpus repartitioned → 10/10 bit-identical);
    - the count is a fixed CONSTANT, not data-sized: same constant ⇒
      same deterministic round-robin layout ⇒ same float-merge grouping
      every run. Changing the constant changes the seeded topics (the
      usual MLlib-EM float caveat, same class as the ALS block grid) —
      at cluster scale pass a cluster-sized constant and keep it.
    """
    from pyspark.ml.clustering import LDA
    from pyspark.ml.feature import CountVectorizer, Tokenizer

    spark = documents.sparkSession
    toks = Tokenizer(inputCol=text_col, outputCol="__tokens").transform(
        documents.select(text_col).na.drop()
    )
    cv = CountVectorizer(
        inputCol="__tokens", outputCol="features", vocabSize=vocab_size, minDF=2.0
    ).fit(toks)
    corpus = cv.transform(toks).select("features").repartition(int(em_partitions))
    lda = LDA(k=k, maxIter=max_iter, seed=seed, optimizer="em").fit(corpus)
    topics = lda.describeTopics(top_terms)
    vocab = spark.createDataFrame(
        list(enumerate(cv.vocabulary)), "term_idx int, term string"
    )
    exploded = topics.select(
        "topic",
        F.posexplode(F.arrays_zip("termIndices", "termWeights")).alias("rank", "tw"),
    ).select(
        "topic",
        F.col("rank").cast("int").alias("rank"),
        F.col("tw.termIndices").alias("term_idx"),
        F.floor(F.col("tw.termWeights") * 1_000_000).cast("long").alias("weight_micro"),
    )
    return (
        exploded.join(F.broadcast(vocab), "term_idx")
        .select("topic", "rank", "term", "weight_micro")
        .orderBy("topic", "rank")
    )
