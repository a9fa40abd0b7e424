"""[EXT] Model-based language identification — the fastText shape
(hashed character n-grams -> linear classifier), distilled exactly the
way ``ml/quality.py`` distills the quality heuristic (VERDICT r5 #6):
the cheap marker-lexicon heuristic (``operators/text.language_id``)
labels the documents it is CONFIDENT about, a multinomial logistic
regression over stateless hashed char-trigram features learns those
labels, and the model then scores every document — including ones whose
text contains none of the ~4 marker words per language, which the
heuristic must call ``und``.

Why this scales where a vocabulary model doesn't: HashingTF over char
n-grams is a PER-ROW map into a fixed-width sparse vector — no fitted
vocabulary, no broadcast, nothing grows with the corpus (the reason
fastText ships hashed n-gram buckets). The char n-grams themselves come
from JVM-side transformers (RegexTokenizer -> NGram), so the whole
featurize path is codegen/Arrow-free-of-Python. The LR fit iterates
over the confident-labeled subset only, cached as feature vectors.

Split into FIT and SCORE halves (VERDICT r9 #2): ``fit_language_pipeline``
produces a native-serializable ``PipelineModel`` (RegexTokenizer →
NGram → HashingTF → LRModel) plus the index→language mapping;
``score_language_with`` is the stateless scoring pass (heuristic
fallback included) that runs on any corpus, including arrival batches.
``ml/model_store.py`` persists the pair; ``doc_language_classifier``
stays as the fit-then-score COLD path with its original output.

The heuristic stays as the FALLBACK: rows where the model's top
probability is below ``min_prob`` keep the heuristic's answer (or
``und``), so a degenerate training corpus can never make the model
overrule signal it doesn't have. A corpus whose confident labels
collapse to <2 classes skips the fit entirely and returns the heuristic
(degenerate-by-construction corpora, e.g. single-language fixtures).

No counterpart in the reference (its 4 Scala phases have no text
classifier); composes this repo's own text + MLlib surfaces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jobanalytics_bigdataproject_spark.operators.text import LANG_MARKERS, language_id


def _language_base(
    documents: DataFrame,
    text_col: str,
    label_col: str | None,
    min_hits: int,
    train_bp: int,
    salt: str,
) -> DataFrame:
    """doc_id + lowercase text + heuristic answer + confident-band label
    index + deterministic md5 split — the shared front half of fit and
    score."""
    from jobanalytics_bigdataproject_spark.sources.readers import fan_out_scan

    # fan_out_scan (guide §2.5): the marker-lexicon heuristic and the
    # char-trigram featurize both re-read every document; identity at
    # real scale
    documents = fan_out_scan(documents)
    # language_id echoes the corpus' labeled `lang` column; tolerate
    # unlabeled corpora (the common production case)
    docs_for_heur = (
        documents
        if "lang" in documents.columns
        else documents.withColumn("lang", F.lit(None).cast("string"))
    )
    heur = language_id(docs_for_heur, text_col=text_col).select(
        "doc_id",
        F.col("predicted_lang").alias("heuristic_lang"),
        "best_score",
    )
    base = documents.select("doc_id", text_col).join(heur, "doc_id")
    if label_col is not None:
        base = base.join(
            documents.select("doc_id", F.col(label_col).alias("__label_lang")),
            "doc_id",
        )
        label_lang = F.col("__label_lang")
    else:
        label_lang = F.when(
            (F.col("heuristic_lang") != "und")
            & (F.col("best_score") >= min_hits),
            F.col("heuristic_lang"),
        )

    langs = sorted(LANG_MARKERS)
    idx = F.lit(None).cast("double")
    for i, lg in enumerate(langs):
        idx = F.when(label_lang == lg, F.lit(float(i))).otherwise(idx)
    bucket = F.substring(
        F.md5(F.concat_ws(":", F.col("doc_id").cast("string"), F.lit(salt))), 1, 4
    )
    t_train = f"{(train_bp * 65536) // 10000:04x}"
    return base.select(
        "doc_id",
        # NULL text must not reach RegexTokenizer (it throws); empty
        # string featurizes to an all-zero vector and the min_prob
        # fallback keeps the heuristic's answer for such rows
        F.coalesce(F.lower(F.col(text_col)), F.lit("")).alias("__txt"),
        "heuristic_lang",
        idx.alias("label"),
        F.when(bucket < t_train, F.lit("train"))
        .otherwise(F.lit("holdout"))
        .alias("split"),
    )


def _heuristic_only(base: DataFrame) -> DataFrame:
    return base.select(
        "doc_id",
        "split",
        "heuristic_lang",
        F.lit(None).cast("string").alias("model_lang"),
        F.lit(None).cast("double").alias("model_prob"),
        F.col("heuristic_lang").alias("predicted_lang"),
    )


def fit_language_pipeline(
    documents: DataFrame,
    text_col: str = "text",
    label_col: str | None = None,
    n_features: int = 1 << 12,
    ngram: int = 3,
    min_hits: int = 2,
    train_bp: int = 8000,
    salt: str = "langsplit:v1",
):
    """Fit the distilled language classifier; returns ``(PipelineModel,
    langs)`` where ``langs[i]`` decodes prediction index ``i`` — or
    ``None`` when the train split holds fewer than 2 confident classes
    (degenerate corpus: no decision boundary to learn; the heuristic IS
    the answer and there is no model worth persisting)."""
    from pyspark.ml import PipelineModel
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, NGram, RegexTokenizer

    base = _language_base(documents, text_col, label_col, min_hits, train_bp, salt)
    # degenerate corpus: fewer than 2 confident classes IN THE TRAIN
    # SPLIT — counting over the whole corpus would let a class whose
    # confident docs all hashed into the holdout band slip through,
    # fitting a one-class model that then overrules correct heuristic
    # answers, or crashing on an empty train set
    n_classes = (
        base.filter("split = 'train' AND label IS NOT NULL")
        .select("label").distinct().count()
    )
    if n_classes < 2:
        return None

    chars = RegexTokenizer(
        inputCol="__txt", outputCol="__chars", pattern=".", gaps=False,
        toLowercase=False, minTokenLength=1,
    )
    grams = NGram(n=ngram, inputCol="__chars", outputCol="__grams")
    tf = HashingTF(inputCol="__grams", outputCol="features", numFeatures=n_features)
    feat = tf.transform(grams.transform(chars.transform(base)))
    train = feat.filter("split = 'train' AND label IS NOT NULL").select(
        "features", "label"
    )
    # right-size for the 30-iteration LBFGS loop (see quality.py — one
    # task per partition per iteration)
    from jobanalytics_bigdataproject_spark.sources.readers import (
        right_size_for_iterations,
    )

    train = right_size_for_iterations(train, train.count())
    train.cache().count()  # materialize before the iterative fit
    try:
        model = LogisticRegression(
            maxIter=30, regParam=0.01, family="multinomial",
            featuresCol="features", labelCol="label",
        ).fit(train)
    finally:
        train.unpersist()

    # shed the training summary before scoring (same session-pinning
    # hazard quality.py documents): write/load round-trips a KB-scale
    # coefficient matrix
    import shutil
    import tempfile

    from pyspark.ml.classification import LogisticRegressionModel

    path = tempfile.mkdtemp(prefix="doc_lang_lr_")
    try:
        model.write().overwrite().save(path)
        model = LogisticRegressionModel.load(path)
    finally:
        # retrain-per-call sessions (bench runs this every round) must
        # not leak a driver-disk dir per invocation
        shutil.rmtree(path, ignore_errors=True)

    return PipelineModel(stages=[chars, grams, tf, model]), sorted(LANG_MARKERS)


def score_language_with(
    model,
    langs: list[str],
    documents: DataFrame,
    text_col: str = "text",
    label_col: str | None = None,
    min_hits: int = 2,
    min_prob: float = 0.5,
    train_bp: int = 8000,
    salt: str = "langsplit:v1",
) -> DataFrame:
    """The stateless scoring pass: heuristic front half (it is the
    fallback, so it runs at score time too), one ``PipelineModel.
    transform``, prediction decoded through the STORED ``langs`` mapping
    (the mapping travels with the model — a marker-table edit between
    fit and score must not silently re-wire classes). Output columns:
    ``doc_id, split, heuristic_lang, model_lang, model_prob,
    predicted_lang`` — identical to ``doc_language_classifier``."""
    from pyspark.ml.functions import vector_to_array

    base = _language_base(documents, text_col, label_col, min_hits, train_bp, salt)
    if model is None:
        return _heuristic_only(base)
    probs = vector_to_array("probability")
    model_lang = F.lit(None).cast("string")
    for i, lg in enumerate(langs):
        model_lang = F.when(
            F.col("prediction") == float(i), F.lit(lg)
        ).otherwise(model_lang)
    top_prob = F.round(F.array_max(probs), 6)
    return model.transform(base).select(
        "doc_id",
        "split",
        "heuristic_lang",
        model_lang.alias("model_lang"),
        top_prob.alias("model_prob"),
        F.when(top_prob >= min_prob, model_lang)
        .otherwise(F.col("heuristic_lang"))
        .alias("predicted_lang"),
    )
    # no presentation sort: D-sized output; rows-only (float model scores)


def doc_language_classifier(
    documents: DataFrame,
    text_col: str = "text",
    label_col: str | None = None,
    n_features: int = 1 << 12,
    ngram: int = 3,
    min_hits: int = 2,
    min_prob: float = 0.5,
    train_bp: int = 8000,
    salt: str = "langsplit:v1",
) -> DataFrame:
    """Distill language ID into a hashed char-n-gram classifier and score
    every document — the COLD path (fit + score in one call); steady-
    state serving persists the fit via ``ml/model_store.py`` and scores
    arrivals against it. Output: ``doc_id, split, heuristic_lang,
    model_lang, model_prob, predicted_lang``."""
    fitted = fit_language_pipeline(
        documents, text_col, label_col, n_features, ngram, min_hits, train_bp, salt
    )
    if fitted is None:
        return score_language_with(
            None, [], documents, text_col, label_col, min_hits, min_prob,
            train_bp, salt,
        )
    model, langs = fitted
    return score_language_with(
        model, langs, documents, text_col, label_col, min_hits, min_prob,
        train_bp, salt,
    )
