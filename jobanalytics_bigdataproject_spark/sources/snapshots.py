"""[EXT] Versioned parquet tables: a minimal Delta/Iceberg-style commit log
giving plain parquet directories ACID-ish snapshots, time travel, rollback,
and vacuum — the missing piece between this engine's lakehouse writers
(partitioned/bucketed/z-ordered parquet, compaction) and how production
tables actually evolve: concurrent appenders, bad-deploy rollbacks,
reproducible "train on the table AS OF version N" reads.

The reference (one-shot spark-shell scripts over a single CSV) has no
notion of table versions; this module is pure [EXT] scale surface.

Layout::

    table_dir/
      data/  v{N}-{i}-part-....parquet   immutable once committed
      _log/  v00000001.json …            one manifest per version

Each manifest holds the COMPLETE file list of its snapshot (Iceberg-style
full manifests, not Delta-style deltas): a reader resolves any version
from exactly one small JSON file — no log replay, no tombstone
reconciliation. The cost is O(files) bytes per commit; at the file counts
where that matters (millions), the list itself belongs in a parquet
manifest — same protocol, bigger page — documented, not implemented.

Commit protocol (optimistic concurrency, the Delta approach):

1. write the new data files under ``data/`` with version-unique names
   (a failed job leaves only unreferenced files — vacuum debris, never
   corruption, because nothing references a file until its manifest
   lands);
2. create ``_log/v{N}.json`` with create-if-absent. Two writers racing
   for version N: one wins, the loser re-reads the new head and retries
   on N+1 (its data files are already safely named uniquely).
   Create-if-absent is atomic on HDFS/local; on S3 you'd back this one
   operation with a conditional PUT or a DynamoDB-style lock — the
   standard object-store caveat, isolated to this single call.

All filesystem access goes through the Hadoop FileSystem API (driver-side
metadata ops only — file counts, renames, one small JSON per commit), so
the same code runs on local disk, HDFS, or object stores.
"""

from __future__ import annotations

import json
import uuid

from pyspark.sql import DataFrame, SparkSession

_LOG = "_log"
_DATA = "data"


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath, jvm


def _manifest_path(jvm, table_dir: str, version: int):
    return jvm.org.apache.hadoop.fs.Path(f"{table_dir}/{_LOG}/v{version:08d}.json")


def _read_manifest(fs, jvm, table_dir: str, version: int) -> dict:
    p = _manifest_path(jvm, table_dir, version)
    if not fs.exists(p):
        raise FileNotFoundError(
            f"no snapshot v{version} at {table_dir} (vacuumed or never written)"
        )
    stream = fs.open(p)
    try:
        # py4j passes byte[] buffers by copy, so a read(buf) loop can't see
        # Java-side mutations — drain the stream JVM-side instead
        text = jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
        return json.loads(text)
    finally:
        stream.close()


def current_version(spark: SparkSession, table_dir: str) -> int:
    """Highest committed version, or 0 if the table has no snapshots yet.
    One directory listing of ``_log/`` — O(versions) names, no file reads."""
    fs, _, jvm = _fs(spark, table_dir)
    log_path = jvm.org.apache.hadoop.fs.Path(f"{table_dir}/{_LOG}")
    if not fs.exists(log_path):
        return 0
    best = 0
    for st in fs.listStatus(log_path):
        name = st.getPath().getName()
        if name.startswith("v") and name.endswith(".json"):
            try:
                best = max(best, int(name[1:-5]))
            except ValueError:
                continue
    return best


def snapshot_info(spark: SparkSession, table_dir: str, version: int) -> dict:
    """The manifest of one version: action, parent, file list (relative)."""
    fs, _, jvm = _fs(spark, table_dir)
    return _read_manifest(fs, jvm, table_dir, version)


def write_snapshot(
    df: DataFrame, table_dir: str, mode: str = "append"
) -> int:
    """Commit ``df`` as a new table version; returns the version number.

    ``mode='append'`` adds the new files to the parent snapshot's set;
    ``mode='overwrite'`` makes them the whole snapshot. Either way the
    parent's files are untouched — old versions stay readable until
    ``vacuum``. The data files are written ONCE (staging + per-file
    rename, a metadata op); only the manifest create participates in the
    optimistic-retry loop, so a lost race costs one re-read of the head
    manifest, never a data rewrite.
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    spark = df.sparkSession
    fs, _, jvm = _fs(spark, table_dir)
    Path = jvm.org.apache.hadoop.fs.Path

    # 1. write data files to a staging dir, then move under data/ with
    #    commit-unique names (uuid, not version: a racing writer may end
    #    up committing these files at a later version than it aimed for)
    tag = uuid.uuid4().hex[:12]
    staging = f"{table_dir}/.staging-{tag}"
    df.write.parquet(staging)
    data_dir = Path(f"{table_dir}/{_DATA}")
    fs.mkdirs(data_dir)
    new_files: list[str] = []
    for i, st in enumerate(sorted(fs.listStatus(Path(staging)), key=lambda s: s.getPath().getName())):
        name = st.getPath().getName()
        if not name.endswith(".parquet"):
            continue
        rel = f"{_DATA}/c{tag}-{i}-{name}"
        if not fs.rename(st.getPath(), Path(f"{table_dir}/{rel}")):
            raise IOError(f"rename failed for {name} -> {rel}")
        new_files.append(rel)
    fs.delete(Path(staging), True)

    # 2. optimistic manifest commit
    while True:
        head = current_version(spark, table_dir)
        if mode == "append" and head > 0:
            parent_files = _read_manifest(fs, jvm, table_dir, head)["files"]
        else:
            parent_files = []
        version = head + 1
        manifest = {
            "version": version,
            "parent": head,
            "action": mode,
            "files": parent_files + new_files if mode == "append" else new_files,
            "added": new_files,
        }
        mp = _manifest_path(jvm, table_dir, version)
        fs.mkdirs(mp.getParent())
        try:
            # create(path, overwrite=False): atomic create-if-absent —
            # the single linearization point of the commit protocol
            stream = fs.create(mp, False)
        except Exception:
            continue  # lost the race: re-read head, retry at head+1
        try:
            stream.write(bytearray(json.dumps(manifest).encode("utf-8")))
        finally:
            stream.close()
        return version


def read_snapshot(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """The table AS OF ``version`` (default: latest). Resolves one
    manifest, then hands Spark the explicit file list — normal parquet
    scan from there (column pruning / filter pushdown all intact)."""
    fs, _, jvm = _fs(spark, table_dir)
    if version is None:
        version = current_version(spark, table_dir)
    if version == 0:
        raise FileNotFoundError(f"{table_dir} has no committed snapshots")
    manifest = _read_manifest(fs, jvm, table_dir, version)
    files = [f"{table_dir}/{rel}" for rel in manifest["files"]]
    if not files:
        return spark.read.parquet(f"{table_dir}/{_DATA}").limit(0)
    return spark.read.parquet(*files)


def rollback(spark: SparkSession, table_dir: str, to_version: int) -> int:
    """Commit a NEW version whose file set is ``to_version``'s — history
    moves forward only (the bad versions stay inspectable until vacuum),
    exactly Delta's RESTORE semantics. Returns the new version."""
    fs, _, jvm = _fs(spark, table_dir)
    target = _read_manifest(fs, jvm, table_dir, to_version)
    while True:
        head = current_version(spark, table_dir)
        version = head + 1
        manifest = {
            "version": version,
            "parent": head,
            "action": "rollback",
            "restored": to_version,
            "files": target["files"],
            "added": [],
        }
        mp = _manifest_path(jvm, table_dir, version)
        try:
            stream = fs.create(mp, False)
        except Exception:
            continue
        try:
            stream.write(bytearray(json.dumps(manifest).encode("utf-8")))
        finally:
            stream.close()
        return version


def vacuum(spark: SparkSession, table_dir: str, keep_last: int = 2) -> int:
    """Delete data files referenced ONLY by versions older than the last
    ``keep_last`` — those versions stop being time-travelable (their
    manifests are removed too, so a stale read fails loudly instead of
    listing missing files). Returns the number of data files deleted.

    Driver-side metadata work is O(retained manifests + data files) name
    operations; at object-store scale you'd batch the deletes, but the
    set arithmetic is the same.
    """
    fs, _, jvm = _fs(spark, table_dir)
    Path = jvm.org.apache.hadoop.fs.Path
    head = current_version(spark, table_dir)
    if head == 0:
        return 0
    keep_from = max(1, head - keep_last + 1)
    referenced: set[str] = set()
    for v in range(keep_from, head + 1):
        try:
            referenced.update(_read_manifest(fs, jvm, table_dir, v)["files"])
        except FileNotFoundError:
            continue
    deleted = 0
    data_path = Path(f"{table_dir}/{_DATA}")
    if fs.exists(data_path):
        for st in fs.listStatus(data_path):
            rel = f"{_DATA}/{st.getPath().getName()}"
            if rel not in referenced:
                fs.delete(st.getPath(), False)
                deleted += 1
    for v in range(1, keep_from):
        mp = _manifest_path(jvm, table_dir, v)
        if fs.exists(mp):
            fs.delete(mp, False)
    return deleted
