from jobanalytics_bigdataproject_spark.plans.inspect import (
    codegen_spans,
    count_exchanges,
    formatted_plan,
    has_broadcast_hash_join,
    pushed_filters,
)

__all__ = [
    "codegen_spans",
    "count_exchanges",
    "formatted_plan",
    "has_broadcast_hash_join",
    "pushed_filters",
]
