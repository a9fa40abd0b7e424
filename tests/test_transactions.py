"""Cross-table atomic publish (sources/transactions.py).

The VERDICT r6 #3 done-bar: a two-table commit with crash injection
proving atomicity — crash before the record leaves NEITHER table
changed; crash after the record but mid-publish is rolled forward by
the consistent reader so observers see BOTH; a post-record concurrent
commit triggers compensating rollbacks leaving no partial state.
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jobanalytics_bigdataproject_spark.sources import branches as br
from jobanalytics_bigdataproject_spark.sources import snapshots as snap
from jobanalytics_bigdataproject_spark.sources import transactions as tx


@pytest.fixture()
def two_tables(spark, tmp_path):
    fact = str(tmp_path / "fact")
    dim = str(tmp_path / "dim")
    snap.write_snapshot(
        spark.createDataFrame(
            [(1, 10, 100), (2, 20, 200)], "k int, d int, amt long"
        ).repartition(1),
        fact,
        mode="overwrite",
    )
    snap.write_snapshot(
        spark.createDataFrame([(10, "a"), (20, "b")], "d int, name string")
        .repartition(1),
        dim,
        mode="overwrite",
    )
    return fact, dim, str(tmp_path / "txns")


def _append(spark, handle, df):
    snap.write_snapshot(df.repartition(1), handle)


def test_commit_publishes_both(spark, two_tables):
    fact, dim, txn_dir = two_tables
    t = tx.begin_transaction(spark, [fact, dim], txn_dir)
    _append(spark, t["branches"][fact],
            spark.createDataFrame([(3, 30, 300)], "k int, d int, amt long"))
    _append(spark, t["branches"][dim],
            spark.createDataFrame([(30, "c")], "d int, name string"))
    # isolation: mains unchanged until commit
    assert snap.read_snapshot(spark, fact).count() == 2
    assert snap.read_snapshot(spark, dim).count() == 2
    res = tx.commit_transaction(spark, t)
    assert res["status"] == "committed" and set(res["published"]) == {fact, dim}
    dfs = tx.read_consistent(spark, [fact, dim], txn_dir)
    joined = dfs[fact].join(dfs[dim], "d")
    assert joined.count() == 3  # every fact row has its dim — consistent
    # record is terminal; branches retired
    assert tx.recover_transactions(spark, txn_dir) == []
    assert br.list_branches(spark, fact) == [] and br.list_branches(spark, dim) == []


def test_crash_before_record_changes_neither(spark, two_tables, monkeypatch):
    fact, dim, txn_dir = two_tables
    t = tx.begin_transaction(spark, [fact, dim], txn_dir)
    _append(spark, t["branches"][fact],
            spark.createDataFrame([(3, 30, 300)], "k int, d int, amt long"))
    _append(spark, t["branches"][dim],
            spark.createDataFrame([(30, "c")], "d int, name string"))

    def boom(fs, mp, manifest):  # dies creating the record
        raise OSError("simulated crash before the transaction record")

    monkeypatch.setattr(tx, "_create_manifest", boom)
    with pytest.raises(OSError):
        tx.commit_transaction(spark, t)
    monkeypatch.undo()
    # NEITHER table changed; no record; recovery finds nothing to do
    assert tx.recover_transactions(spark, txn_dir) == []
    assert snap.read_snapshot(spark, fact).count() == 2
    assert snap.read_snapshot(spark, dim).count() == 2
    tx.abort_transaction(spark, t)  # orphan branches swept
    assert br.list_branches(spark, fact) == [] and br.list_branches(spark, dim) == []


def test_crash_mid_publish_rolled_forward(spark, two_tables, monkeypatch):
    fact, dim, txn_dir = two_tables
    t = tx.begin_transaction(spark, [fact, dim], txn_dir)
    _append(spark, t["branches"][fact],
            spark.createDataFrame([(3, 30, 300)], "k int, d int, amt long"))
    _append(spark, t["branches"][dim],
            spark.createDataFrame([(30, "c")], "d int, name string"))

    real_ff = tx.br.fast_forward
    calls = {"n": 0}

    def crash_on_second(spark_, table_dir, name, **kw):
        calls["n"] += 1
        if calls["n"] == 2:
            raise KeyboardInterrupt("simulated process death mid-publish")
        return real_ff(spark_, table_dir, name, **kw)

    monkeypatch.setattr(tx.br, "fast_forward", crash_on_second)
    with pytest.raises((KeyboardInterrupt, RuntimeError)):
        # KeyboardInterrupt models a hard crash: commit's compensation
        # also catches BaseException, so simulate the crash by making
        # the compensation path itself unreachable — patch rollback too
        monkeypatch.setattr(tx.sn, "rollback", lambda *a, **k: (_ for _ in ()).throw(KeyboardInterrupt()))
        tx.commit_transaction(spark, t)
    monkeypatch.undo()
    # the crash window: fact published, dim not — a raw reader COULD see
    # partial state here; the consistent reader must not
    assert snap.read_snapshot(spark, fact).count() == 3
    assert snap.read_snapshot(spark, dim).count() == 2
    dfs = tx.read_consistent(spark, [fact, dim], txn_dir)
    assert dfs[fact].count() == 3 and dfs[dim].count() == 3  # rolled forward
    assert dfs[fact].join(dfs[dim], "d").count() == 3
    # terminal: nothing left to recover, branches gone
    assert tx.recover_transactions(spark, txn_dir) == []


def test_post_record_race_compensates(spark, two_tables, monkeypatch):
    fact, dim, txn_dir = two_tables
    t = tx.begin_transaction(spark, [fact, dim], txn_dir)
    _append(spark, t["branches"][fact],
            spark.createDataFrame([(3, 30, 300)], "k int, d int, amt long"))
    _append(spark, t["branches"][dim],
            spark.createDataFrame([(30, "c")], "d int, name string"))

    real_ff = tx.br.fast_forward
    calls = {"n": 0}

    def race_on_second(spark_, table_dir, name, **kw):
        calls["n"] += 1
        if calls["n"] == 2:
            # a foreign writer lands on dim between record and publish
            snap.write_snapshot(
                spark.createDataFrame([(99, "z")], "d int, name string")
                .repartition(1),
                dim,
            )
        return real_ff(spark_, table_dir, name, **kw)

    monkeypatch.setattr(tx.br, "fast_forward", race_on_second)
    with pytest.raises(RuntimeError, match="compensating rollbacks"):
        tx.commit_transaction(spark, t)
    monkeypatch.undo()
    # fact's publish was compensated back to base; dim kept ONLY the
    # foreign row; the txn's changes exist nowhere
    fact_rows = snap.read_snapshot(spark, fact).count()
    dim_rows = {r.d for r in snap.read_snapshot(spark, dim).collect()}
    assert fact_rows == 2
    assert dim_rows == {10, 20, 99}
    assert tx.recover_transactions(spark, txn_dir) == []  # .aborted is terminal


def test_commit_refused_when_main_moves_before_record(spark, two_tables):
    fact, dim, txn_dir = two_tables
    t = tx.begin_transaction(spark, [fact, dim], txn_dir)
    _append(spark, t["branches"][fact],
            spark.createDataFrame([(3, 30, 300)], "k int, d int, amt long"))
    # a non-transactional writer advances fact before commit is called
    snap.write_snapshot(
        spark.createDataFrame([(7, 70, 700)], "k int, d int, amt long")
        .repartition(1),
        fact,
    )
    with pytest.raises(ValueError, match="commit refused"):
        tx.commit_transaction(spark, t)
    # plain refusal: no record, nothing published, branches intact
    assert tx.recover_transactions(spark, txn_dir) == []
    assert snap.read_snapshot(spark, dim).count() == 2
    tx.abort_transaction(spark, t)


# ----------------------------------------------- round 8 (VERDICT r7 #4/#8)


def _commit_pair(spark, fact, dim, txn_dir, k, d, name):
    t = tx.begin_transaction(spark, [fact, dim], txn_dir)
    _append(spark, t["branches"][fact],
            spark.createDataFrame([(k, d, k * 100)], "k int, d int, amt long"))
    _append(spark, t["branches"][dim],
            spark.createDataFrame([(d, name)], "d int, name string"))
    return tx.commit_transaction(spark, t)


def test_as_of_txn_group_read_spans_two_transactions(spark, two_tables):
    """Time-travel group read: resolving both tables AS OF transaction T
    returns each at the version T's record pinned, however far the heads
    moved since — the 'both, as of T' contract for historical audits."""
    fact, dim, txn_dir = two_tables
    r1 = _commit_pair(spark, fact, dim, txn_dir, 3, 30, "c")
    r2 = _commit_pair(spark, fact, dim, txn_dir, 4, 40, "e")
    # heads moved past txn1; an independent append moves fact further
    snap.write_snapshot(
        spark.createDataFrame([(9, 90, 900)], "k int, d int, amt long"), fact
    )

    at1 = tx.read_consistent(spark, [fact, dim], txn_dir, as_of_txn=r1["id"])
    assert sorted(r.k for r in at1[fact].collect()) == [1, 2, 3]
    assert sorted(r.d for r in at1[dim].collect()) == [10, 20, 30]
    # both-or-neither AS OF T: every fact row has its dim at the SAME txn
    assert at1[fact].join(at1[dim], "d").count() == 3

    at2 = tx.read_consistent(spark, [fact, dim], txn_dir, as_of_txn=r2["id"])
    assert sorted(r.k for r in at2[fact].collect()) == [1, 2, 3, 4]
    assert sorted(r.d for r in at2[dim].collect()) == [10, 20, 30, 40]
    # head read still sees everything, including the non-txn append
    head = tx.read_consistent(spark, [fact, dim], txn_dir)
    assert sorted(r.k for r in head[fact].collect()) == [1, 2, 3, 4, 9]


def test_as_of_txn_refusal_matrix(spark, two_tables, tmp_path):
    fact, dim, txn_dir = two_tables
    r1 = _commit_pair(spark, fact, dim, txn_dir, 3, 30, "c")
    other = str(tmp_path / "other")
    snap.write_snapshot(spark.createDataFrame([(1,)], "x int"), other, mode="overwrite")
    with pytest.raises(FileNotFoundError, match="no record"):
        tx.read_consistent(spark, [fact], txn_dir, as_of_txn="deadbeef")
    with pytest.raises(ValueError, match="not a participant"):
        tx.read_consistent(spark, [other], txn_dir, as_of_txn=r1["id"])


def test_expire_transactions_sweeps_terminal_records_only(spark, two_tables):
    """Terminal .done/.aborted records past the horizon are swept;
    recovery afterwards has nothing to do and both tables stay correct —
    proof the expired records were never needed (VERDICT r7 #4)."""
    import time

    fact, dim, txn_dir = two_tables
    _commit_pair(spark, fact, dim, txn_dir, 3, 30, "c")
    # an open (bare .json) record must survive any horizon: fabricate one
    t2 = tx.begin_transaction(spark, [fact, dim], txn_dir)
    _append(spark, t2["branches"][fact],
            spark.createDataFrame([(5, 50, 500)], "k int, d int, amt long"))
    _append(spark, t2["branches"][dim],
            spark.createDataFrame([(50, "z")], "d int, name string"))
    real_ff = br.fast_forward
    calls = {"n": 0}

    def crash_after_first(sp, table_dir, name, **kw):
        if calls["n"] == 1:
            raise RuntimeError("crash mid-publish")
        calls["n"] += 1
        return real_ff(sp, table_dir, name, **kw)

    import jobanalytics_bigdataproject_spark.sources.transactions as txmod
    orig = txmod.br.fast_forward
    txmod.br.fast_forward = crash_after_first
    try:
        with pytest.raises(RuntimeError):
            tx.commit_transaction(spark, t2)
    finally:
        txmod.br.fast_forward = orig
    # horizon in the future: every TERMINAL record is past it
    swept = tx.expire_transactions(spark, txn_dir, time.time() + 60)
    assert len(swept["done"]) == 1
    # the crashed txn's record was renamed .aborted?  No — commit_transaction
    # compensates on exceptions DURING publish, which renames to .aborted;
    # that aborted record is also terminal and sweepable
    assert len(swept["aborted"]) == 1
    # recovery after expiry: nothing to do, tables consistent
    assert tx.recover_transactions(spark, txn_dir) == []
    dfs = tx.read_consistent(spark, [fact, dim], txn_dir)
    assert dfs[fact].join(dfs[dim], "d").count() == 3  # txn1 applied, txn2 rolled back


def test_maintain_wires_txn_expiry(spark, two_tables):
    import time

    from jobanalytics_bigdataproject_spark.sources.maintenance import maintain

    fact, dim, txn_dir = two_tables
    _commit_pair(spark, fact, dim, txn_dir, 3, 30, "c")
    rep = maintain(spark, fact, expire_older_than=time.time() + 60, txn_dir=txn_dir)
    assert rep["expired_txn_records"] == 1


def test_commit_with_rebase_survives_concurrent_append(spark, two_tables):
    """rebase=True: a concurrent append on a participant between begin and
    commit no longer kills the transaction — the branch replays onto the
    new head and the publish proceeds; the concurrent rows survive."""
    fact, dim, txn_dir = two_tables
    t = tx.begin_transaction(spark, [fact, dim], txn_dir)
    _append(spark, t["branches"][fact],
            spark.createDataFrame([(3, 30, 300)], "k int, d int, amt long"))
    _append(spark, t["branches"][dim],
            spark.createDataFrame([(30, "c")], "d int, name string"))
    # concurrent writer advances fact's main
    _append(spark, fact,
            spark.createDataFrame([(7, 10, 700)], "k int, d int, amt long"))
    with pytest.raises(ValueError, match="advanced"):
        tx.commit_transaction(spark, t)  # plain commit still refuses
    res = tx.commit_transaction(spark, t, rebase=True)
    assert res["status"] == "committed"
    dfs = tx.read_consistent(spark, [fact, dim], txn_dir)
    assert sorted(r.k for r in dfs[fact].collect()) == [1, 2, 3, 7]
    assert sorted(r.d for r in dfs[dim].collect()) == [10, 20, 30]


def test_commit_with_rebase_refuses_true_conflict(spark, two_tables):
    """rebase=True still refuses when the concurrent write CONFLICTS with
    the transaction's own DML (same base file rewritten by both) —
    nothing published, nothing mutated."""
    fact, dim, txn_dir = two_tables
    t = tx.begin_transaction(spark, [fact, dim], txn_dir)
    snap.delete_where(spark, t["branches"][fact], "k = 1")  # COW rewrite
    snap.delete_where(spark, fact, "k = 2")  # main rewrites the SAME file
    with pytest.raises(ValueError, match="modified by BOTH"):
        tx.commit_transaction(spark, t, rebase=True)
    # nothing published on either table
    assert sorted(r.k for r in snap.read_snapshot(spark, fact).collect()) == [1]
    assert snap.read_snapshot(spark, dim).count() == 2


def test_pinned_group_refuses_raw_head_read_inside(spark, two_tables, tmp_path):
    """VERDICT r8 #9: inside ``with pinned_group(...)`` a raw HEAD
    read_snapshot of a member table is refused (the mixed-version
    foot-gun); explicit version pins and non-member tables stay open,
    and the guard is fully restored on exit — including exceptional."""
    fact, dim, txn_dir = two_tables
    t = tx.begin_transaction(spark, [fact, dim], txn_dir)
    _append(spark, t["branches"][fact],
            spark.createDataFrame([(3, 30, 300)], "k int, d int, amt long"))
    _append(spark, t["branches"][dim],
            spark.createDataFrame([(30, "c")], "d int, name string"))
    txn1 = tx.commit_transaction(spark, t)["id"]
    # head later moves past the transaction
    _append(spark, fact, spark.createDataFrame([(4, 10, 400)], "k int, d int, amt long"))
    other = str(tmp_path / "other_tbl")
    snap.write_snapshot(spark.createDataFrame([(1,)], "x int"), other)

    with tx.pinned_group(spark, [fact, dim], txn_dir, as_of_txn=txn1) as g:
        assert g[fact].count() == 3  # pinned at T1, excludes the later append
        assert g[fact].join(g[dim], "d").count() == 3
        with pytest.raises(ValueError, match="pinned_group"):
            snap.read_snapshot(spark, fact)  # raw head read — refused
        with pytest.raises(ValueError, match="pinned_group"):
            snap.read_snapshot(spark, dim + "/")  # normalization holds
        # deliberate escape hatches stay open
        v = snap.current_version(spark, fact)
        assert snap.read_snapshot(spark, fact, version=v).count() == 4
        assert snap.read_snapshot(spark, other).count() == 1  # non-member
        # overlapping pin refused
        with pytest.raises(ValueError, match="already pinned"):
            with tx.pinned_group(spark, [fact], txn_dir, as_of_txn=txn1):
                pass
    # context closed: raw reads work again
    assert snap.read_snapshot(spark, fact).count() == 4

    # guard restored even when the body raises
    with pytest.raises(RuntimeError, match="boom"):
        with tx.pinned_group(spark, [fact, dim], txn_dir, as_of_txn=txn1):
            raise RuntimeError("boom")
    assert snap.read_snapshot(spark, dim).count() == 3
