"""Writers: parquet sink (SURVEY.md §2.1 S3) + partitioned-write [EXT].

The reference materializes every pipeline stage with
``df.write.mode("overwrite").parquet(path)``
(reference code/01_DataPreprocessing.scala:68,205-208,249,307). We keep that
sink and add what a 100 TB deployment needs and the reference lacks:

- ``partition_by`` (e.g. date) so downstream reads get partition pruning;
- ``max_records_per_file`` to bound file sizes (small-file problem at scale
  is the writer's responsibility, AQE coalescing handles the shuffle side);
- optional ``bucket_by`` via ``saveAsTable`` for shuffle-free co-located
  joins on the bucketing key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Sequence[str] | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Parquet sink mirroring reference S3, plus scale knobs."""
    writer = df.write.mode(mode)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_sorted_parquet(
    df: DataFrame,
    path: str,
    sort_cols: Sequence[str],
    mode: str = "overwrite",
    partition_by: Sequence[str] | None = None,
    range_partition: bool = True,
    num_partitions: int | None = None,
) -> None:
    """[EXT] Range-clustered parquet sink: ``repartitionByRange`` on
    ``sort_cols`` (files cover disjoint value ranges) + ``sortWithinPartitions``
    (row groups inside each file stay narrow too). Result: parquet min/max
    footer statistics become selective, so later range/point filters on
    those columns skip whole files and row groups at scan time (verified
    from the footers in tests). Costs ONE range-exchange at write time —
    the standard clustering trade: pay once at ingest, every subsequent
    scan with a ``sort_cols`` predicate reads a fraction of the data.
    ``range_partition=False`` keeps the current partitioning (no shuffle)
    and only sorts within tasks — narrows row groups inside multi-group
    files but not across files."""
    if range_partition:
        df = (
            df.repartitionByRange(num_partitions, *sort_cols)
            if num_partitions
            else df.repartitionByRange(*sort_cols)
        )
    writer = df.sortWithinPartitions(*sort_cols).write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """[EXT] JSON-lines sink — interchange format for downstream tools that
    don't speak parquet; not a scale format (no column pruning), so keep it
    at pipeline edges."""
    df.write.mode(mode).json(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Sequence[str] | None = None,
) -> None:
    """[EXT] ORC sink with the same partitioning knob as the parquet one."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: repeated joins/aggs on ``bucket_cols`` become
    shuffle-free (both sides pre-hashed into the same bucket layout). This is
    the [EXT] scale path for fact-fact joins the reference never needed."""
    writer = df.write.mode(mode).format("parquet").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)
