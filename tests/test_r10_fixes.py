"""Regression tests for the round-9 ADVICE items (landed round 10).

- bucket_store.compact in a session that never registered the table
  (the nightly maintain()-only service scenario) must not raise.
- bucket_store.compact must not lose files a concurrent append landed
  between the snapshot listing and the stage-out rename.
- bucket_store.store_detail telemetry (VERDICT r9 #7).
- pinned_group guard keys are canonical: alternate spellings of a
  member path cannot bypass the refusal.
- vamana pin cache: an append evicts ALL stale entries for the path
  (not just the re-queried probe set), and a cache hit still refreshes
  the scan-plan introspection hook.
- substring_dedup_incremental(check_id_reuse=True) catches doc-id reuse
  while letting exact replays through.
"""
from __future__ import annotations

import pytest

from jobanalytics_bigdataproject_spark.operators import substring
from jobanalytics_bigdataproject_spark.sources import bucket_store

SPAN = "the quick brown fox jumps over the lazy dog tonight"


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_compact_without_catalog_registration(spark, tmp_path):
    """ADVICE r9 (medium): a fresh session that only runs maintenance
    never registered the table; compact() used to die in refreshTable
    AFTER the successful swap."""
    path = str(tmp_path / "store")
    substring.shingle_store_write(
        _df(spark, [(1, "alpha beta " + SPAN)]), path, k=4, num_buckets=4
    )
    substring.substring_store_learn(
        spark, _df(spark, [(2, "wholly novel words here indeed")]), path, k=4
    )
    before = sorted(map(tuple, bucket_store.open(spark, path).collect()))
    # simulate the fresh session: the catalog forgot the table
    spark.sql(f"DROP TABLE {bucket_store._table_name(path)}")
    n = bucket_store.compact(spark, path)  # must not raise
    assert 0 < n <= 4
    assert sorted(map(tuple, bucket_store.open(spark, path).collect())) == before


def test_compact_adopts_concurrent_append(spark, tmp_path, monkeypatch):
    """ADVICE r9 (medium): files an append lands between compact's
    snapshot listing and the stage-out rename must survive — they are
    adopted into the new live set, not deleted with data__old."""
    path = str(tmp_path / "store")
    df0 = spark.createDataFrame([(1, 10, 0), (2, 20, 0)], "shingle long, doc_id long, pos int")
    bucket_store.create(spark, df0, path, ["shingle"], num_buckets=4)
    late = spark.createDataFrame([(99, 99, 9)], "shingle long, doc_id long, pos int")
    orig = bucket_store._bucketed_write
    fired = []

    def hooked(df, name, data_path, meta, mode):
        orig(df, name, data_path, meta, mode)
        if name.endswith("_staging") and not fired:
            fired.append(True)
            # the "concurrent" writer: commits AFTER compact listed its
            # snapshot, BEFORE the swap
            bucket_store.append(spark, late, path)

    monkeypatch.setattr(bucket_store, "_bucketed_write", hooked)
    bucket_store.compact(spark, path)
    monkeypatch.setattr(bucket_store, "_bucketed_write", orig)
    rows = {tuple(r) for r in bucket_store.open(spark, path).collect()}
    assert (99, 99, 9) in rows  # the late batch survived
    assert {(1, 10, 0), (2, 20, 0)} <= rows
    # and the adopted file still probes through the bucketed scan
    probe = spark.createDataFrame([(99,)], "shingle long")
    got = bucket_store.open(spark, path).join(probe, "shingle", "left_semi")
    assert got.count() == 1


def test_store_detail_telemetry(spark, tmp_path):
    """VERDICT r9 #7: DESCRIBE DETAIL-style store debt signal."""
    path = str(tmp_path / "store")
    substring.shingle_store_write(
        _df(spark, [(1, "alpha beta " + SPAN)]), path, k=4, num_buckets=4
    )
    d = bucket_store.store_detail(spark, path)
    assert d["num_buckets"] == 4 and d["bucket_cols"] == ["shingle"]
    assert d["num_rows"] == bucket_store.open(spark, path).count() > 0
    assert d["num_files"] == bucket_store.file_count(spark, path)
    assert d["size_bytes"] > 0
    assert d["last_compaction_ts"] is None  # never compacted
    substring.substring_store_learn(
        spark, _df(spark, [(2, "wholly novel words here indeed")]), path, k=4
    )
    assert bucket_store.store_detail(spark, path)["num_files"] > d["num_files"]
    bucket_store.compact(spark, path)
    d2 = bucket_store.store_detail(spark, path)
    assert d2["last_compaction_ts"] is not None
    assert d2["num_files"] <= 4 and d2["files_per_bucket"] <= 1.0


def test_pinned_group_guard_is_spelling_proof(spark, tmp_path):
    """ADVICE r9 (low): an equivalent spelling of a member path
    (file:// scheme, doubled separators, trailing slash) must hit the
    same guard entry."""
    from jobanalytics_bigdataproject_spark.sources import snapshots as sn
    from jobanalytics_bigdataproject_spark.sources import transactions as tx

    fact = str(tmp_path / "fact")
    txn_dir = str(tmp_path / "txn")
    sn.write_snapshot(spark.createDataFrame([(1, "a")], "k int, v string"), fact)
    with tx.pinned_group(spark, [fact], txn_dir) as g:
        g[fact].count()
        for spelling in (
            fact,
            fact + "/",
            "file://" + fact,
            fact.replace("/fact", "//fact"),
        ):
            with pytest.raises(ValueError, match="pinned_group"):
                sn.read_snapshot(spark, spelling)
    # guard restored: all spellings readable again
    assert sn.read_snapshot(spark, "file://" + fact).count() == 1


def test_vamana_append_evicts_all_stale_pins_for_path(spark, tables, tmp_path):
    """ADVICE r9 (low): entries for probe sets never re-queried must be
    unpersisted when the path's signature changes; a cache hit must
    still refresh _LAST_GRAPH_SCAN_PLAN."""
    import numpy as np
    from pyspark.sql import functions as F

    from jobanalytics_bigdataproject_spark.operators import vamana

    path = str(tmp_path / "vamana")
    emb = tables["embeddings"]
    vamana.vamana_build_index(emb, path, n_shards=4, r=8, beam=16)
    q = emb.filter(F.col("vec_id") < 2)
    # two distinct probe sets pin two entries
    vamana.vamana_query(spark, path, q, k=3, n_probe=1, beam=16).count()
    vamana.vamana_query(spark, path, q, k=3, n_probe=4, beam=16).count()
    keys0 = [k for k in vamana._GRAPH_PIN_CACHE if k[0] == path]
    assert len(keys0) == 2
    # cache hit refreshes the introspection hook
    vamana._LAST_GRAPH_SCAN_PLAN = ""
    vamana.vamana_query(spark, path, q, k=3, n_probe=1, beam=16).count()
    assert vamana._LAST_GRAPH_SCAN_PLAN != ""
    # an append changes the signature; re-serving ONE probe set must
    # evict the OTHER stale entry too
    dim = len(emb.select("embedding").first()[0])
    rng = np.random.default_rng(7)
    new = spark.createDataFrame(
        [(10_000 + i, [float(x) for x in rng.normal(size=dim)]) for i in range(4)],
        "vec_id long, embedding array<float>",
    )
    vamana.vamana_append(new, path)
    vamana.vamana_query(spark, path, q, k=3, n_probe=1, beam=16).count()
    keys1 = [k for k in vamana._GRAPH_PIN_CACHE if k[0] == path]
    assert len(keys1) == 1  # only the re-served probe set remains


def test_check_id_reuse_catches_reuse_allows_replay(spark, tmp_path):
    """ADVICE r9 (low): a reused doc id with different content raises;
    an exact replay of a learned batch (the sink retry path) passes."""
    path = str(tmp_path / "store")
    substring.shingle_store_write(
        _df(spark, [(0, "seed corpus words only here today")]), path, k=4
    )
    batch = _df(spark, [(7, "genuinely fresh tokens appear in this document")])
    out = substring.substring_dedup_incremental(
        spark, batch, path, k=4, update_store=True, check_id_reuse=True
    )
    assert out.first().n_tokens_after == out.first().n_tokens  # nothing cut
    # exact replay: same id, same text → allowed (idempotent retry)
    replay = substring.substring_dedup_incremental(
        spark, batch, path, k=4, check_id_reuse=True
    )
    assert replay.first().text_clean == batch.first().text
    # reuse: same id, different text → refused with a naming error
    reused = _df(spark, [(7, "completely different words live under the old id")])
    with pytest.raises(ValueError, match="REUSED"):
        substring.substring_dedup_incremental(
            spark, reused, path, k=4, check_id_reuse=True
        ).count()
    # default (check off) keeps the documented hard-requirement contract:
    # no error, caller owns uniqueness
    substring.substring_dedup_incremental(spark, reused, path, k=4).count()


def test_compact_crash_during_adoption_recovers_on_retry(spark, tmp_path, monkeypatch):
    """Review finding r10: if compact crashes AFTER the swap but BEFORE
    adopting a concurrent append's files, the retired dir still holds
    the only copy of that batch. A retry used to delete data__old
    blindly (silent loss + silent under-dedup forever); now the
    snapshot-name sidecar carried into the live set lets the retry
    finish the adoption."""
    path = str(tmp_path / "store")
    df0 = spark.createDataFrame([(1, 10, 0), (2, 20, 0)], "shingle long, doc_id long, pos int")
    bucket_store.create(spark, df0, path, ["shingle"], num_buckets=4)
    late = spark.createDataFrame([(99, 99, 9)], "shingle long, doc_id long, pos int")

    orig_write = bucket_store._bucketed_write

    def write_hook(df, name, data_path, meta, mode):
        orig_write(df, name, data_path, meta, mode)
        if name.endswith("_staging"):
            bucket_store.append(spark, late, path)  # concurrent writer

    def crash(*a, **k):
        raise IOError("simulated crash before adoption")

    monkeypatch.setattr(bucket_store, "_bucketed_write", write_hook)
    monkeypatch.setattr(bucket_store, "_adopt_late", crash)
    with pytest.raises(IOError, match="simulated crash"):
        bucket_store.compact(spark, path)
    monkeypatch.undo()

    # the crashed state: live = compacted set + sidecar, old dir retired
    # with the late batch unadopted. The retry must rescue it.
    n = bucket_store.compact(spark, path)
    assert 0 < n <= 4
    rows = sorted(map(tuple, bucket_store.open(spark, path).collect()))
    assert rows == [(1, 10, 0), (2, 20, 0), (99, 99, 9)]  # once each
    # and the store still probes through the bucketed scan
    probe = spark.createDataFrame([(99,)], "shingle long")
    assert bucket_store.open(spark, path).join(probe, "shingle", "left_semi").count() == 1


def test_compact_refuses_orphan_retired_dir_without_sidecar(spark, tmp_path):
    """A data__old left by something OTHER than a post-r10 compact (no
    sidecar to classify its files) must refuse loudly, not delete it."""
    path = str(tmp_path / "store")
    df0 = spark.createDataFrame([(1, 10, 0)], "shingle long, doc_id long, pos int")
    bucket_store.create(spark, df0, path, ["shingle"], num_buckets=2)
    fs, _, jvm = bucket_store._fs(spark, path)
    Path = jvm.org.apache.hadoop.fs.Path
    fs.mkdirs(Path(f"{path}/data__old"))
    with pytest.raises(IOError, match="sidecar"):
        bucket_store.compact(spark, path)
