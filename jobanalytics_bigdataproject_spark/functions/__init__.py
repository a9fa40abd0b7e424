from jobanalytics_bigdataproject_spark.functions.derive import (
    bucketize,
    decompose_timestamp,
    epoch_ms_to_ts,
    map_lookup,
    parse_key_token,
    std_lower,
    std_upper,
    with_log_features,
)
from jobanalytics_bigdataproject_spark.functions.textfns import (
    fingerprint,
    shingles,
    tokenize,
)

__all__ = [
    "bucketize",
    "decompose_timestamp",
    "epoch_ms_to_ts",
    "fingerprint",
    "map_lookup",
    "parse_key_token",
    "shingles",
    "std_lower",
    "std_upper",
    "tokenize",
    "with_log_features",
]
