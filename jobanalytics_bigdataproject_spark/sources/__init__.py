from jobanalytics_bigdataproject_spark.sources.readers import (
    STAR_TABLES,
    load_star,
    read_csv,
    read_table,
    register_views,
)
from jobanalytics_bigdataproject_spark.sources.writers import write_parquet
from jobanalytics_bigdataproject_spark.sources.snapshots import (
    delete_keys_mor,
    delete_range,
    delete_where,
    delete_where_mor,
    materialize_dvs,
    merge_into,
    read_snapshot,
    rollback,
    update_where,
    update_where_mor,
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
    "delete_where",
    "delete_range",
    "delete_where_mor",
    "delete_keys_mor",
    "update_where",
    "update_where_mor",
    "merge_into",
    "materialize_dvs",
]
