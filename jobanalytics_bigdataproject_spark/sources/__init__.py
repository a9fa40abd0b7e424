from jobanalytics_bigdataproject_spark.sources.readers import (
    STAR_TABLES,
    load_star,
    read_csv,
    read_table,
    register_views,
)
from jobanalytics_bigdataproject_spark.sources.writers import write_parquet

__all__ = [
    "STAR_TABLES",
    "load_star",
    "read_csv",
    "read_table",
    "register_views",
    "write_parquet",
]
