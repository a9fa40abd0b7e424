"""Driver-side JSON sidecar I/O through the Hadoop FileSystem API — the
shared helper under every store's ``_meta.json`` (bucketed dedup stores,
persisted model stores). One implementation of the py4j FileSystem
dance so the copies can't drift (they already had: one grew
``last_compaction_ts`` handling the other never saw).

Filesystem-agnostic by construction: the path's own FileSystem is
resolved from the Hadoop configuration, so sidecars live wherever the
cluster's warehouse does (local, HDFS, object stores). Metadata-scale
only — never route data through this.
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession


def fs_for(spark: SparkSession, path: str):
    """(FileSystem, Path, jvm) for *path* — the common py4j triple."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath, jvm


def write_json(spark: SparkSession, path: str, obj: dict) -> None:
    """Write *obj* as JSON at *path* (overwrite)."""
    fs, _, jvm = fs_for(spark, path)
    stream = fs.create(jvm.org.apache.hadoop.fs.Path(path), True)
    try:
        stream.write(bytearray(json.dumps(obj).encode("utf-8")))
    finally:
        stream.close()


def read_json(spark: SparkSession, path: str) -> dict:
    """Read a JSON sidecar; raises FileNotFoundError(path) when absent —
    callers translate into their own store-specific guidance."""
    fs, _, jvm = fs_for(spark, path)
    p = jvm.org.apache.hadoop.fs.Path(path)
    if not fs.exists(p):
        raise FileNotFoundError(path)
    stream = fs.open(p)
    try:
        text = jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()
    return json.loads(text)
