"""[EXT] Cross-table atomic publish for the versioned-parquet layer
(VERDICT r6 #3): group several tables' changes so they become visible
together — fact+dim, documents+embeddings — with ONE file creation as
the commit point.

Builds directly on branches (sources/branches.py): a transaction is a
set of per-table staging branches plus a single transaction RECORD
whose atomic create-if-absent (the same primitive every snapshot commit
rests on) is the all-or-nothing boundary:

    txn = begin_transaction(spark, [fact_dir, dim_dir], txn_dir)
    write_snapshot(new_facts, txn["branches"][fact_dir])   # any DML
    write_snapshot(new_dims,  txn["branches"][dim_dir])
    commit_transaction(spark, txn)                          # atomic
    tables = read_consistent(spark, [fact_dir, dim_dir], txn_dir)

Protocol (two-phase, record = decision):

1. ``begin`` forks a ``txn-<id>`` branch per table (zero-copy).
2. The caller runs arbitrary DML against the branch handles — full
   isolation, main readers see nothing.
3. ``commit`` prechecks every table is still fast-forwardable, then
   creates ``txn_dir/txn-<id>.json`` with O_EXCL — the transaction is
   COMMITTED the instant this file exists, and not before — then
   publishes each branch via ``fast_forward`` and renames the record to
   ``.done``.

Crash/failure semantics (tested with injection in
tests/test_transactions.py):

- crash BEFORE the record exists → nothing published; the branches are
  orphans; ``abort_transaction`` (or recovery's orphan sweep) drops
  them. Readers never saw anything. ("neither")
- crash AFTER the record exists but before all fast-forwards → raw
  per-table reads can transiently see a PARTIAL publish (this module
  has no global catalog to gate per-table head resolution — the same
  window a multi-table Iceberg commit has without a REST catalog
  transaction). ``read_consistent`` closes it: it first rolls every
  committed-but-unfinished record forward (``recover_transactions``),
  so readers that come through it observe both tables or neither.
  ("eventually both", with the consistent reader as the contract)
- a CONCURRENT commit lands on a participant between the record create
  and its fast-forward (cross-process race; same-machine writers are
  already serialized by the claim protocol during each fast-forward) →
  that publish is no longer a fast-forward; ``commit`` COMPENSATES:
  every already-published participant is rolled back to its base
  version (``snapshots.rollback`` — a new commit restoring base state,
  history intact) and the record is renamed to ``.aborted``. The
  transaction reports failure and no table retains its changes.

The record lives in a caller-chosen ``txn_dir`` (typically the
warehouse root) so every participant's readers resolve the SAME record
set; participants are identified by absolute table paths.
"""

from __future__ import annotations

import json
import uuid

from pyspark.sql import SparkSession

from jobanalytics_bigdataproject_spark.sources import branches as br
from jobanalytics_bigdataproject_spark.sources import snapshots as sn
from jobanalytics_bigdataproject_spark.sources.snapshots import (
    _create_manifest,
    _fs,
    _read_manifest,
    current_version,
)


def _record_path(jvm, txn_dir: str, txn_id: str, suffix: str = "json"):
    return jvm.org.apache.hadoop.fs.Path(f"{txn_dir}/txn-{txn_id}.{suffix}")


def _read_record(fs, jvm, path) -> dict:
    stream = fs.open(path)
    try:
        text = jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()
    return json.loads(text)


def begin_transaction(
    spark: SparkSession,
    tables: list[str],
    txn_dir: str,
    txn_id: str | None = None,
) -> dict:
    """Open a transaction over ``tables`` (absolute paths, each an
    existing snapshot table). Returns the handle::

        {"id", "txn_dir", "tables": [...],
         "branches": {table_dir: branch_handle}}

    Run any snapshots.* DML against the branch handles, then
    ``commit_transaction``. Branches are named ``txn-<id>`` so recovery
    can associate them with their record."""
    if len(set(tables)) != len(tables) or not tables:
        raise ValueError("tables must be a non-empty list of distinct paths")
    txn_id = txn_id or uuid.uuid4().hex[:16]
    handles = {}
    made = []
    try:
        for t in tables:
            handles[t] = br.create_branch(spark, t, f"txn-{txn_id}")
            made.append(t)
    except BaseException:
        for t in made:  # leave nothing half-opened
            br.drop_branch(spark, t, f"txn-{txn_id}")
        raise
    return {
        "id": txn_id,
        "txn_dir": txn_dir,
        "tables": list(tables),
        "branches": handles,
    }


def abort_transaction(spark: SparkSession, txn: dict) -> None:
    """Drop the transaction's branches. Safe at any point before the
    record exists; afterwards use recovery (the decision is committed)."""
    for t in txn["tables"]:
        br.drop_branch(spark, t, f"txn-{txn['id']}")


def _applied_version(spark, fs, jvm, table_dir: str, txn_id: str, base: int) -> int | None:
    """Main version that published this txn's branch, or None. Scans the
    (few) versions above ``base`` for the fast_forward lineage record."""
    head = current_version(spark, table_dir)
    for v in range(base + 1, head + 1):
        try:
            m = _read_manifest(fs, jvm, table_dir, v)
        except FileNotFoundError:
            continue
        src = m.get("source") or {}
        if m.get("action") == "fast_forward" and src.get("branch") == f"txn-{txn_id}":
            return v
    return None


def commit_transaction(spark: SparkSession, txn: dict, rebase: bool = False) -> dict:
    """Atomically publish every participant's branch. Returns
    ``{"id", "status": "committed", "published": {table: version}}``.

    Raises (and leaves all tables at their pre-transaction state) if any
    participant stopped being fast-forwardable — before the record this
    is a plain refusal; after the record it triggers compensating
    rollbacks of already-published participants and an ``.aborted``
    record.

    ``rebase=True`` (round 8): a participant whose main advanced past
    the transaction base is REBASED first (``branches.rebase_branch`` —
    file-level replay, refusing on true conflicts), so a transaction
    only fails against CONFLICTING concurrent writes, not against any
    concurrent write — optimistic-concurrency semantics at the
    transaction level. A table that advances again between the rebase
    and its fast-forward still triggers the normal post-record
    compensation path; nothing is guessed."""
    txn_id, txn_dir = txn["id"], txn["txn_dir"]
    fs, _, jvm = _fs(spark, txn_dir)
    participants = []
    for t in txn["tables"]:
        bdir = txn["branches"][t]
        bhead = current_version(spark, bdir)
        if bhead == 0:
            raise FileNotFoundError(f"txn branch missing for {t}")
        bfs, _, bjvm = _fs(spark, bdir)
        base = br._branch_base(bfs, bjvm, bdir)
        main_head = current_version(spark, t)
        if main_head != base:
            if not rebase:
                raise ValueError(
                    f"{t} advanced to v{main_head} past the transaction base "
                    f"v{base} — commit refused; abort and re-run the "
                    "transaction (or commit with rebase=True)"
                )
            # replay the branch onto the new head; TRUE conflicts still
            # refuse (inside rebase_branch), leaving everything intact
            bhead = br.rebase_branch(spark, t, f"txn-{txn_id}")
            base = main_head
        participants.append({"table_dir": t, "base": base, "branch_head": bhead})

    # THE commit point: one atomic create. Everything before this line
    # leaves no trace on any main log; everything after is roll-forward.
    fs.mkdirs(jvm.org.apache.hadoop.fs.Path(txn_dir))
    record = {"id": txn_id, "participants": participants, "status": "committed"}
    rp = _record_path(jvm, txn_dir, txn_id)
    if not _create_manifest(fs, rp, record):
        raise FileExistsError(f"transaction record txn-{txn_id} already exists")

    published: dict[str, int] = {}
    try:
        for p in participants:
            published[p["table_dir"]] = br.fast_forward(
                spark, p["table_dir"], f"txn-{txn_id}"
            )
    except BaseException as e:
        # a participant raced us post-record: compensate — roll every
        # already-published table back to its base and abort the record
        for p in participants:
            v = published.get(p["table_dir"])
            if v is not None:
                sn.rollback(spark, p["table_dir"], p["base"])
            br.drop_branch(spark, p["table_dir"], f"txn-{txn_id}")
        fs.rename(rp, _record_path(jvm, txn_dir, txn_id, "aborted.json"))
        raise RuntimeError(
            f"transaction txn-{txn_id} aborted with compensating rollbacks: {e}"
        ) from e
    fs.rename(rp, _record_path(jvm, txn_dir, txn_id, "done.json"))
    return {"id": txn_id, "status": "committed", "published": published}


def recover_transactions(spark: SparkSession, txn_dir: str) -> list[dict]:
    """Roll every committed-but-unfinished transaction forward (publish
    the participants whose fast-forward never ran, e.g. after a crash),
    then mark it ``.done``. Returns one status dict per record acted on.

    A record is actionable when it still has the bare ``.json`` name;
    ``.done`` / ``.aborted`` records are terminal. An unapplied
    participant whose branch vanished (or stopped being
    fast-forwardable because the table advanced independently) makes
    the record ``.stuck`` — surfaced, never guessed at."""
    fs, _, jvm = _fs(spark, txn_dir)
    root = jvm.org.apache.hadoop.fs.Path(txn_dir)
    out: list[dict] = []
    if not fs.exists(root):
        return out
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if not (name.startswith("txn-") and name.endswith(".json")):
            continue
        if name.endswith((".done.json", ".aborted.json", ".stuck.json")):
            continue
        rec = _read_record(fs, jvm, st.getPath())
        txn_id = rec["id"]
        status = {"id": txn_id, "completed": [], "already_applied": [], "stuck": []}
        for p in rec["participants"]:
            t, base = p["table_dir"], int(p["base"])
            if _applied_version(spark, fs, jvm, t, txn_id, base) is not None:
                status["already_applied"].append(t)
                br.drop_branch(spark, t, f"txn-{txn_id}")  # publish retired
                continue
            try:
                br.fast_forward(spark, t, f"txn-{txn_id}")
                status["completed"].append(t)
            except (FileNotFoundError, ValueError) as e:
                status["stuck"].append({"table_dir": t, "reason": str(e)})
        suffix = "stuck.json" if status["stuck"] else "done.json"
        fs.rename(st.getPath(), _record_path(jvm, txn_dir, txn_id, suffix))
        out.append(status)
    return out


def read_consistent(
    spark: SparkSession,
    tables: list[str],
    txn_dir: str,
    as_of_txn: str | None = None,
) -> dict[str, "object"]:
    """Transactionally-consistent reader: completes any unfinished
    committed transaction first (``recover_transactions``), then returns
    ``{table_dir: DataFrame}`` at each table's head — so a transaction
    is observed either fully or not at all, never partially.

    ``as_of_txn`` (VERDICT r7 #8) turns the head read into a GROUP
    TIME-TRAVEL read: every requested table is resolved at exactly the
    version that published the named transaction's branch on it — "both
    tables, as of transaction T", however far each table's head has
    since advanced. Requested tables that were not participants of T
    are refused (there is no version the record pins for them), as are
    aborted/stuck transactions; a pinned version already vacuumed away
    fails loudly at manifest resolution, same as any time-travel read."""
    recover_transactions(spark, txn_dir)
    if as_of_txn is None:
        return {t: sn.read_snapshot(spark, t) for t in tables}
    fs, _, jvm = _fs(spark, txn_dir)
    rec = None
    for suffix in ("done.json", "json", "stuck.json", "aborted.json"):
        p = _record_path(jvm, txn_dir, as_of_txn, suffix)
        if fs.exists(p):
            rec, state = _read_record(fs, jvm, p), suffix
            break
    if rec is None:
        raise FileNotFoundError(f"no record for txn-{as_of_txn} in {txn_dir}")
    if state != "done.json":
        raise ValueError(
            f"txn-{as_of_txn} is not fully published (record state "
            f"{state.removesuffix('.json')!r}) — no consistent version set exists"
        )
    by_table = {p["table_dir"]: p for p in rec["participants"]}
    out = {}
    for t in tables:
        part = by_table.get(t)
        if part is None:
            raise ValueError(
                f"{t} was not a participant of txn-{as_of_txn} — "
                "its record pins no version for this table"
            )
        tfs, _, tjvm = _fs(spark, t)
        v = _applied_version(spark, tfs, tjvm, t, rec["id"], int(part["base"]))
        if v is None:
            raise ValueError(
                f"published version of txn-{as_of_txn} not found on {t} "
                "(history expired past the publish?)"
            )
        out[t] = sn.read_snapshot(spark, t, version=v)
    return out


def expire_transactions(
    spark: SparkSession, txn_dir: str, older_than: float
) -> dict[str, list[str]]:
    """Retention sweep for the transaction record dir (VERDICT r7 #4 —
    without it ``recover_transactions`` scans an ever-growing listing):
    delete TERMINAL records (``.done`` / ``.aborted``) whose modification
    time is before ``older_than`` (epoch seconds), mirroring
    ``expire_snapshots``' time-horizon semantics.

    Terminal records are never needed by recovery — ``.done`` means
    every participant's fast-forward completed (the record only flips to
    that name after the last publish), ``.aborted`` means every
    compensating rollback ran — so expiry can never strand a table.
    What expiry DOES retire is ``read_consistent(as_of_txn=...)`` for
    that transaction (the pin is gone), exactly as ``expire_snapshots``
    retires old time-travel reads. Live (bare ``.json``) and ``.stuck``
    records are never touched: those are recovery's work queue."""
    fs, _, jvm = _fs(spark, txn_dir)
    root = jvm.org.apache.hadoop.fs.Path(txn_dir)
    removed: dict[str, list[str]] = {"done": [], "aborted": []}
    if not fs.exists(root):
        return removed
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if not name.startswith("txn-"):
            continue
        for kind in ("done", "aborted"):
            if name.endswith(f".{kind}.json"):
                if st.getModificationTime() / 1000.0 < older_than:
                    txn_id = name[len("txn-"):-len(f".{kind}.json")]
                    if fs.delete(st.getPath(), False):
                        removed[kind].append(txn_id)
    return removed


from contextlib import contextmanager


@contextmanager
def pinned_group(
    spark: SparkSession,
    tables: list[str],
    txn_dir: str,
    as_of_txn: str | None = None,
):
    """Consistency CONTEXT over ``read_consistent`` (VERDICT r8 #9): the
    ambient-catalog polish on the group read. ::

        with pinned_group(spark, [fact, dim], txn_dir, as_of_txn=t1) as g:
            g[fact].join(g[dim], ...)          # both pinned at T1
            sn.read_snapshot(spark, fact)      # REFUSED — foot-gun

    ``read_consistent`` returns a consistent frame set, but nothing
    stopped a caller from ALSO doing a raw head read of a member table
    in the same report — silently mixing the pinned versions with the
    live head, the exact torn read the group exists to prevent. Inside
    the context every member table is registered in the snapshot
    layer's pin guard: a raw HEAD ``read_snapshot`` of a member raises,
    naming the open group. Deliberate escape hatches stay open —
    explicit ``version=`` / ``as_of_ts=`` reads (time travel is always
    an intentional act) and every non-member table.

    Driver-side only (a dict mutation); no Spark state, so nesting
    non-overlapping groups is fine, while overlapping pins are refused
    (two contexts pinning one table at different versions has no sane
    winner). The guard is restored on ANY exit, including exceptions.
    """
    frames = read_consistent(spark, tables, txn_dir, as_of_txn=as_of_txn)
    # canonical keys: equivalent path spellings (file:// scheme, doubled
    # separators, relative) must hit the same guard entry (ADVICE r9);
    # the lock closes the check-then-set race between driver threads
    keys = [sn._pin_key(spark, t) for t in tables]
    label = f"txn-{as_of_txn}" if as_of_txn else "head-consistent group"
    with sn._PINNED_GROUP_LOCK:
        already = [t for t, k in zip(tables, keys) if k in sn._PINNED_GROUP_GUARD]
        if already:
            raise ValueError(
                f"table(s) {already} are already pinned by an open "
                "pinned_group — overlapping pins have no consistent winner; "
                "close the outer context first"
            )
        for k in keys:
            sn._PINNED_GROUP_GUARD[k] = label
    try:
        yield frames
    finally:
        with sn._PINNED_GROUP_LOCK:
            for k in keys:
                sn._PINNED_GROUP_GUARD.pop(k, None)
