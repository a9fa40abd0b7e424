"""[EXT] Table maintenance: small-file compaction and optimizer-statistics
collection — the janitorial half of running a 100 TB lake that the
reference (a one-shot script pipeline) never needed.

Small files are the classic death-by-metadata failure mode at scale
(every file costs a namenode entry, a footer read, a scheduler task);
streaming sinks and over-parallel writes produce them constantly.
``compact_parquet`` is the OPTIMIZE/rewriteDataFiles equivalent:
bin-pack existing files into ~target-sized outputs with a shuffle-free
``coalesce``.

``analyze_table`` feeds Catalyst's cost-based optimizer: with rowCount +
column NDV/min/max in the catalog, CBO can reorder multi-way joins and
pick broadcast sides from ESTIMATED post-filter sizes instead of raw
file sizes (plan-stat effect asserted in tests/test_maintenance.py).
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import SparkSession


def _dir_bytes(spark: SparkSession, path: str) -> int:
    """Recursive on-disk size via the Hadoop FileSystem API — works on any
    supported filesystem (local, HDFS, object stores), driver-side
    metadata only."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return int(fs.getContentSummary(hpath).getLength())


def compact_parquet(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_mb: int = 128,
) -> int:
    """Rewrite a parquet directory into ``ceil(total_bytes / target_mb)``
    files. ``coalesce`` (not ``repartition``) keeps the rewrite
    shuffle-free — tasks concatenate input splits; row order within files
    is preserved per split, so footer min/max stats stay about as tight
    as the source's. Returns the output file count. (In-place compaction
    is deliberately not offered: write-then-swap is the atomic pattern;
    a direct overwrite of ``src_path`` would read-and-clobber.)"""
    total = _dir_bytes(spark, src_path)
    n = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    spark.read.parquet(src_path).coalesce(n).write.mode("overwrite").parquet(dst_path)
    return n


def analyze_table(
    spark: SparkSession,
    table: str,
    columns: Sequence[str] | None = None,
) -> None:
    """ANALYZE TABLE: table-level rowCount/size stats, plus per-column
    NDV/min/max/null-count histograms-free stats when *columns* given.
    Pair with ``spark.sql.cbo.enabled=true`` for stats-driven join
    reordering."""
    base = f"ANALYZE TABLE {table} COMPUTE STATISTICS"
    spark.sql(base)
    if columns:
        spark.sql(base + " FOR COLUMNS " + ", ".join(columns))
