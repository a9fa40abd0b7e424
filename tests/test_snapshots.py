"""Versioned parquet tables (sources/snapshots.py): append/overwrite
commits, time travel, rollback-as-new-version, vacuum retention, and the
optimistic-commit retry when a competing manifest lands first."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jobanalytics_bigdataproject_spark.sources import snapshots as sn


def _ids(df):
    return sorted(r.i for r in df.collect())


@pytest.fixture()
def tdir(tmp_path):
    return str(tmp_path / "tbl")


def _batch(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id").alias("i"))


def test_append_versions_and_time_travel(spark, tdir):
    assert sn.current_version(spark, tdir) == 0
    v1 = sn.write_snapshot(_batch(spark, 0, 5), tdir)
    v2 = sn.write_snapshot(_batch(spark, 5, 8), tdir)
    assert (v1, v2) == (1, 2)
    assert _ids(sn.read_snapshot(spark, tdir)) == list(range(8))
    assert _ids(sn.read_snapshot(spark, tdir, version=1)) == list(range(5))
    info = sn.snapshot_info(spark, tdir, 2)
    assert info["action"] == "append" and info["parent"] == 1
    # appended version references the parent's files plus its own
    assert set(sn.snapshot_info(spark, tdir, 1)["files"]) <= set(info["files"])


def test_overwrite_replaces_but_history_remains(spark, tdir):
    sn.write_snapshot(_batch(spark, 0, 5), tdir)
    v2 = sn.write_snapshot(_batch(spark, 100, 103), tdir, mode="overwrite")
    assert v2 == 2
    assert _ids(sn.read_snapshot(spark, tdir)) == [100, 101, 102]
    # time travel still sees the pre-overwrite table
    assert _ids(sn.read_snapshot(spark, tdir, version=1)) == list(range(5))


def test_rollback_is_a_new_version(spark, tdir):
    sn.write_snapshot(_batch(spark, 0, 5), tdir)
    sn.write_snapshot(_batch(spark, 100, 103), tdir, mode="overwrite")
    v3 = sn.rollback(spark, tdir, to_version=1)
    assert v3 == 3
    assert _ids(sn.read_snapshot(spark, tdir)) == list(range(5))
    # the rolled-back-over version is still inspectable (forward-only history)
    assert _ids(sn.read_snapshot(spark, tdir, version=2)) == [100, 101, 102]
    assert sn.snapshot_info(spark, tdir, 3)["restored"] == 1


def test_vacuum_drops_old_versions_keeps_recent(spark, tdir):
    sn.write_snapshot(_batch(spark, 0, 5), tdir)
    sn.write_snapshot(_batch(spark, 100, 103), tdir, mode="overwrite")
    sn.write_snapshot(_batch(spark, 200, 202), tdir)  # append onto v2
    deleted = sn.vacuum(spark, tdir, keep_last=2)
    # v1's files are referenced by no retained version -> physically gone
    assert deleted > 0
    assert _ids(sn.read_snapshot(spark, tdir)) == [100, 101, 102, 200, 201]
    assert _ids(sn.read_snapshot(spark, tdir, version=2)) == [100, 101, 102]
    with pytest.raises(FileNotFoundError):
        sn.read_snapshot(spark, tdir, version=1)


def test_vacuum_noop_when_all_referenced(spark, tdir):
    sn.write_snapshot(_batch(spark, 0, 5), tdir)
    sn.write_snapshot(_batch(spark, 5, 8), tdir)  # append: v2 references v1's files
    assert sn.vacuum(spark, tdir, keep_last=1) == 0
    assert _ids(sn.read_snapshot(spark, tdir)) == list(range(8))


def test_optimistic_commit_skips_taken_version(spark, tdir):
    import json
    import os

    sn.write_snapshot(_batch(spark, 0, 5), tdir)
    # a competing writer lands v2 between our head read and manifest create:
    # simulate by pre-creating a valid v2 manifest that duplicates v1
    v1 = sn.snapshot_info(spark, tdir, 1)
    fake = dict(v1, version=2, parent=1, action="append", added=[])
    with open(os.path.join(tdir, "_log", "v00000002.json"), "x") as f:
        json.dump(fake, f)
    v = sn.write_snapshot(_batch(spark, 5, 8), tdir)
    assert v == 3  # retried past the conflicting version
    # and the committed snapshot chains off the interloper's file set
    assert _ids(sn.read_snapshot(spark, tdir)) == list(range(8))


def test_empty_table_read_raises(spark, tdir):
    with pytest.raises(FileNotFoundError):
        sn.read_snapshot(spark, tdir)
