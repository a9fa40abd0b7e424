from jobanalytics_bigdataproject_spark.sources.readers import (
    STAR_TABLES,
    load_star,
    read_csv,
    read_table,
    register_views,
)
from jobanalytics_bigdataproject_spark.sources.writers import write_parquet
from jobanalytics_bigdataproject_spark.sources.snapshots import (
    read_snapshot,
    rollback,
    vacuum,
    write_snapshot,
)

__all__ = [
    "STAR_TABLES",
    "load_star",
    "read_csv",
    "read_table",
    "register_views",
    "write_parquet",
    "read_snapshot",
    "rollback",
    "vacuum",
    "write_snapshot",
]
