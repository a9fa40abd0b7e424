from jobanalytics_bigdataproject_spark.ml.pipeline import (
    build_feature_pipeline,
    evaluate_models,
    make_training_frame,
    train_regressors,
)

__all__ = [
    "build_feature_pipeline",
    "evaluate_models",
    "make_training_frame",
    "train_regressors",
]
