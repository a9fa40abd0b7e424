from jobanalytics_bigdataproject_spark.operators import (
    analytics,
    cleaning,
    dedup,
    etl,
    joins,
    multimodal,
    rollup_table,
    sampling,
    similarity,
    text,
)

__all__ = [
    "analytics",
    "cleaning",
    "dedup",
    "etl",
    "joins",
    "multimodal",
    "rollup_table",
    "sampling",
    "similarity",
    "text",
]
