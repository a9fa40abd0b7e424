"""[EXT] Spark 4 Python DataSource exposing the snapshot commit log
(`sources/snapshots.py`) as a STREAMING source — the consumer half of
`snapshot_sink`: one pipeline commits micro-batches as table versions,
another tails the log and sees each new version as a micro-batch, rows
tagged `_commit_version`. Together they make the versioned table a
durable, replayable queue with exactly-once ends (idempotent producer
commits + Spark's checkpointed offsets on the consumer), the Delta
streaming-source/sink pattern rebuilt on plain parquet.

Built on the `pyspark.sql.datasource` API (Spark 4's Python data source
extension point):

- offsets are simply ``{"version": N}`` — the commit log IS an offset
  log, so `latestOffset` is one directory listing and restart-from-
  checkpoint needs no extra bookkeeping;
- `partitions(start, end)` maps each data file ADDED in versions
  ``(start, end]`` to one `InputPartition` — reads scale with executors,
  never through the driver (this is `DataSourceStreamReader`, not the
  driver-side `SimpleDataSourceStreamReader`);
- `read(partition)` yields Arrow RecordBatches via pyarrow — the
  sanctioned batch-columnar path, no per-row Python.

Filesystem note: the data source runs in plain Python workers (no JVM
access), so it uses direct file I/O — local/NFS paths here; swap the
`open`/`os.listdir` calls for `pyarrow.fs.FileSystem.from_uri` handles to
target S3/HDFS, the protocol is unchanged. The JVM-side module
(`snapshots.py`) keeps using the Hadoop FileSystem API.

Register + use::

    spark.dataSource.register(SnapshotDataSource)
    stream = spark.readStream.format("snapshotlog") \\
        .option("path", table_dir).load()

Deliberately NOT offered: a maxVersionsPerBatch admission throttle.
The Python DataSourceStreamReader API gives `latestOffset()` no view of
the restored start offset and no state guarantee across calls (verified
empirically: initialOffset and latestOffset can run on different
instances), so any stateful cap risks planting the batch end BEHIND a
restart's checkpointed offset and wedging the stream; Scala's
SupportsAdmissionControl (latestOffset(start, limit)) is the API this
needs. Backfill boundedness comes from the commit granularity instead —
each micro-batch of the producer is one version.

`.option("startingVersion", N)` skips history ≤ N (default 0 = replay
everything still retained; vacuumed versions raise rather than silently
skip, matching `read_changes`).

Exactly-once holds over APPEND commits only. A rewrite commit (COW
delete/update/merge, OPTIMIZE, materialize_dvs, rollback) adds files whose
rows are mostly survivors already delivered from earlier versions, so
emitting them would duplicate — the source therefore FAILS on such commits
by default, exactly like the Delta streaming source. Options, mirroring
Delta's: `.option("skipChangeCommits", "true")` silently skips rewrite
commits' files (deletes/updates are NOT propagated downstream);
`.option("ignoreChanges", "true")` emits them anyway (downstream must
tolerate re-delivered rows). Metadata-only commits (constraints, MOR
deletes that add no files) pass through harmlessly in every mode.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import LongType, StructField, StructType

_LOG = "_log"


def _manifest_file(table_dir: str, version: int) -> str:
    return os.path.join(table_dir, _LOG, f"v{version:08d}.json")


def _read_manifest_local(table_dir: str, version: int) -> dict:
    path = _manifest_file(table_dir, version)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"no snapshot v{version} at {table_dir} (vacuumed or never written)"
        )
    # a live producer creates the manifest then writes it (two steps):
    # a consumer whose offset listing caught the gap retries briefly —
    # same contract as snapshots._read_manifest
    err: Exception | None = None
    for _attempt in range(50):
        try:
            with open(path) as f:
                text = f.read()
            if text.strip():
                return json.loads(text)
            err = IOError("empty manifest")
        except FileNotFoundError:
            raise
        except Exception as e:  # noqa: BLE001 — partial write in flight
            err = e
        time.sleep(0.02)
    raise IOError(
        f"manifest v{version} at {table_dir} unreadable after retries "
        f"(a producer died mid-commit?): {err}"
    )


def _current_version_local(table_dir: str) -> int:
    log_dir = os.path.join(table_dir, _LOG)
    if not os.path.isdir(log_dir):
        return 0
    best = 0
    for name in os.listdir(log_dir):
        if name.startswith("v") and name.endswith(".json"):
            try:
                best = max(best, int(name[1:-5]))
            except ValueError:
                continue
    return best


@dataclass
class _FilePartition(InputPartition):
    path: str
    version: int


class SnapshotStreamReader(DataSourceStreamReader):
    def __init__(
        self,
        table_dir: str,
        starting_version: int,
        on_change: str = "error",
    ):
        self._table_dir = table_dir
        self._starting = starting_version
        self._on_change = on_change

    def initialOffset(self) -> dict:
        return {"version": self._starting}

    def latestOffset(self) -> dict:
        return {"version": _current_version_local(self._table_dir)}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        out: list[InputPartition] = []
        for v in range(start["version"] + 1, end["version"] + 1):
            man = _read_manifest_local(self._table_dir, v)
            added = man.get("added", [])
            # Exactly-once holds only for APPEND commits: a rewrite commit
            # (COW delete/update/merge, OPTIMIZE, materialize_dvs, rollback)
            # adds files whose rows are mostly SURVIVORS already delivered
            # from earlier versions — emitting them re-delivers. Delta's
            # streaming-source contract, mirrored: fail loudly by default;
            # skipChangeCommits drops them; ignoreChanges emits anyway
            # (caller owns downstream dedup). An overwrite with no parent
            # is the initial load — nothing was ever delivered before it.
            if man.get("column_mapping") is not None:
                raise ValueError(
                    f"snapshotlog: {self._table_dir} has renamed/dropped "
                    "columns (column mapping) — the stream reads raw files "
                    "whose physical names would not match the logical "
                    "schema; materialize the mapping first"
                )
            action = man.get("action", "append")
            is_append = action == "append" or (
                action == "overwrite" and man.get("parent", 0) == 0
            )
            if added and not is_append:
                if self._on_change == "skip":
                    continue
                if self._on_change != "ignore":
                    raise ValueError(
                        f"snapshotlog: version {v} of {self._table_dir} is a "
                        f"{action!r} commit — its added files contain rewritten "
                        "rows already delivered from earlier versions, so "
                        "streaming them would duplicate. Pass "
                        ".option('skipChangeCommits','true') to skip such "
                        "commits or .option('ignoreChanges','true') to emit "
                        "them anyway (downstream must tolerate duplicates)."
                    )
            for rel in added:
                out.append(
                    _FilePartition(os.path.join(self._table_dir, rel), v)
                )
        return out

    def read(self, partition: _FilePartition) -> Iterator["RecordBatch"]:  # noqa: F821
        import pyarrow as pa
        import pyarrow.parquet as pq

        table = pq.read_table(partition.path)
        table = table.append_column(
            "_commit_version",
            pa.array([partition.version] * len(table), pa.int64()),
        )
        yield from table.to_batches()

    def commit(self, end: dict) -> None:
        pass  # offsets live in Spark's checkpoint; the log needs no ack


class SnapshotDataSource(DataSource):
    """``format("snapshotlog")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "snapshotlog"

    def _table_dir(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("snapshotlog requires .option('path', table_dir)")
        return path

    def schema(self) -> StructType:
        from pyspark.sql.pandas.types import from_arrow_schema

        table_dir = self._table_dir()
        head = _current_version_local(table_dir)
        if head == 0:
            raise FileNotFoundError(f"{table_dir} has no committed snapshots")
        manifest = _read_manifest_local(table_dir, head)
        candidates = manifest["files"] or manifest["added"]
        if not candidates:
            raise FileNotFoundError(
                f"{table_dir} v{head} has no data files to infer a schema from"
            )
        probe = candidates[0]

        import pyarrow.parquet as pq

        base = from_arrow_schema(pq.read_schema(os.path.join(table_dir, probe)))
        return StructType(
            list(base.fields) + [StructField("_commit_version", LongType(), False)]
        )

    def streamReader(self, schema: StructType) -> SnapshotStreamReader:
        def _flag(name: str) -> bool:
            return str(self.options.get(name, "false")).lower() == "true"

        if _flag("skipChangeCommits") and _flag("ignoreChanges"):
            raise ValueError(
                "snapshotlog: skipChangeCommits and ignoreChanges are "
                "mutually exclusive"
            )
        on_change = (
            "skip"
            if _flag("skipChangeCommits")
            else "ignore"
            if _flag("ignoreChanges")
            else "error"
        )
        return SnapshotStreamReader(
            self._table_dir(),
            int(self.options.get("startingVersion", 0)),
            on_change,
        )
