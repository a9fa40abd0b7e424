"""Data profiling (operators/profile.py) and SCD2 dimension building /
incremental merge (operators/scd.py)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from jobanalytics_bigdataproject_spark.operators import profile, scd


# ---------------------------------------------------------------------------
# profile_table
# ---------------------------------------------------------------------------


def test_profile_counts_nulls_distinct_bounds(spark):
    df = spark.createDataFrame(
        [(1, None, "a"), (2, 5.0, "b"), (3, 5.0, None), (4, -2.5, "a")],
        ["k", "v", "s"],
    )
    out = {r.column_name: r for r in profile.profile_table(df, ("k", "v", "s")).collect()}
    assert out["k"].n_rows == 4 and out["k"].n_nulls == 0 and out["k"].n_distinct == 4
    assert out["k"].min_value == "1.00" and out["k"].max_value == "4.00"
    assert out["v"].n_nulls == 1 and out["v"].null_bp == 2500
    assert out["v"].n_distinct == 2                       # nulls excluded
    assert out["v"].min_value == "-2.50" and out["v"].max_value == "5.00"
    assert out["s"].n_nulls == 1 and out["s"].n_distinct == 2
    assert out["s"].min_value == "a" and out["s"].max_value == "b"


def test_profile_approx_mode_same_shape(spark, tables):
    exact = profile.profile_table(tables["customer"], ("c_custkey", "c_mktsegment"))
    approx = profile.profile_table(
        tables["customer"], ("c_custkey", "c_mktsegment"), approx=True
    )
    assert exact.columns == approx.columns
    e = {r.column_name: r for r in exact.collect()}
    a = {r.column_name: r for r in approx.collect()}
    for c in ("c_custkey", "c_mktsegment"):
        assert a[c].n_rows == e[c].n_rows and a[c].n_nulls == e[c].n_nulls
        # HLL++ default rsd 5%
        assert abs(a[c].n_distinct - e[c].n_distinct) <= max(3, 0.15 * e[c].n_distinct)


# ---------------------------------------------------------------------------
# SCD2
# ---------------------------------------------------------------------------


def _log(spark, rows):
    return spark.createDataFrame(rows, ["user_id", "event_type", "ts", "event_id"])


def _ts(s):
    return datetime.fromisoformat(s)


def test_scd2_collapses_and_closes_intervals(spark):
    log = _log(
        spark,
        [
            (1, "trial", _ts("2024-01-01 00:00:00"), 1),
            (1, "trial", _ts("2024-01-02 00:00:00"), 2),   # no-op change → collapsed
            (1, "paid", _ts("2024-01-05 00:00:00"), 3),
            (2, "trial", _ts("2024-01-03 00:00:00"), 4),
        ],
    )
    out = scd.scd2_dim(log).orderBy("user_id", "valid_from").collect()
    assert [(r.user_id, r.state, r.valid_from, r.valid_to, r.is_current) for r in out] == [
        (1, "trial", "2024-01-01 00:00:00", "2024-01-05 00:00:00", False),
        (1, "paid", "2024-01-05 00:00:00", None, True),
        (2, "trial", "2024-01-03 00:00:00", None, True),
    ]


def _canon(df):
    return sorted(
        (r.user_id, r.state, r.valid_from, r.valid_to, r.is_current)
        for r in df.select("user_id", "state", "valid_from", "valid_to", "is_current").collect()
    )


def test_scd2_incremental_apply_equals_full_rebuild(spark):
    full = [
        (1, "trial", _ts("2024-01-01 00:00:00"), 1),
        (1, "paid", _ts("2024-01-05 00:00:00"), 2),
        (1, "churned", _ts("2024-02-01 00:00:00"), 5),
        (2, "trial", _ts("2024-01-03 00:00:00"), 3),
        (3, "paid", _ts("2024-01-04 00:00:00"), 4),
    ]
    first, second = full[:2] + full[3:4], full[2:3] + full[4:]
    current = scd.scd2_from_log(_log(spark, first), collapse=False)
    merged = scd.scd2_present(scd.scd2_apply(current, _log(spark, second)))
    rebuilt = scd.scd2_from_log(_log(spark, full))
    assert _canon(merged) == _canon(rebuilt)
    # untouched key 2 present exactly once, key 1 rewritten with 3 intervals
    by_user = {}
    for r in _canon(merged):
        by_user.setdefault(r[0], []).append(r)
    assert len(by_user[1]) == 3 and len(by_user[2]) == 1 and len(by_user[3]) == 1


def test_scd2_streaming_sink_incremental_merge(spark, tables, tmp_path):
    """File-source stream processed one file per trigger → two scd2_apply
    merges; the final dimension must equal the one-shot batch build."""
    import glob
    import shutil

    events = tables["events"]
    watch = tmp_path / "changes"
    watch.mkdir()
    for i, half in enumerate(
        (events.filter("event_id % 2 = 0"), events.filter("event_id % 2 = 1"))
    ):
        staged = str(tmp_path / f"stage{i}")
        half.coalesce(1).write.mode("overwrite").parquet(staged)
        shutil.copy(glob.glob(f"{staged}/part-*.parquet")[0], watch / f"batch{i}.parquet")

    dim_path = str(tmp_path / "dim")
    src = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(watch))
    )
    q = scd.scd2_streaming_sink(src, dim_path).trigger(availableNow=True).start()
    try:
        q.awaitTermination(180)
    finally:
        q.stop()
    assert q.lastProgress is not None

    streamed = _canon(scd.scd2_present(spark.read.parquet(dim_path)))
    batch = _canon(scd.scd2_from_log(events))
    assert streamed == batch
    # a collapsed-at-storage merge would have lost split same-state runs;
    # prove the failure mode is real data, not hypothetical
    assert spark.read.parquet(dim_path).count() >= len(batch)


def test_scd2_apply_handles_late_out_of_order_update(spark):
    base = [
        (1, "trial", _ts("2024-01-01 00:00:00"), 1),
        (1, "paid", _ts("2024-02-01 00:00:00"), 2),
    ]
    late = [(1, "suspended", _ts("2024-01-15 00:00:00"), 3)]  # lands mid-history
    current = scd.scd2_from_log(_log(spark, base), collapse=False)
    merged = scd.scd2_present(scd.scd2_apply(current, _log(spark, late)))
    rebuilt = scd.scd2_from_log(_log(spark, base + late))
    assert _canon(merged) == _canon(rebuilt)
    states = [r[1] for r in sorted(_canon(merged), key=lambda r: (r[0], r[2]))]
    assert states == ["trial", "suspended", "paid"]

# ---------------------------------------------------------------------------
# SCD2 horizon compaction
# ---------------------------------------------------------------------------


def test_scd2_compact_present_equivalence(spark, tables):
    """Collapsing runs older than any horizon must not change the
    presentation view (the horizon only bounds storage, never semantics)."""
    dim = scd.scd2_from_log(tables["events"], collapse=False)
    full = _canon(scd.scd2_present(dim))
    for hz in ("2024-01-01", "2024-01-16", "2024-02-15"):
        assert _canon(scd.scd2_present(scd.scd2_compact(dim, hz))) == full


def test_scd2_compact_bounds_rows(spark):
    """1 key, 100 same-state events then one change, all pre-horizon →
    compacted internal form is 2 rows (one per run), not 101."""
    rows = [(1, "active", _ts(f"2024-01-01 00:{m:02d}:00"), m) for m in range(50)]
    rows += [(1, "active", _ts(f"2024-01-01 01:{m:02d}:00"), 100 + m) for m in range(50)]
    rows += [(1, "churned", _ts("2024-01-02 00:00:00"), 999)]
    dim = scd.scd2_from_log(_log(spark, rows), collapse=False)
    assert dim.count() == 101
    compacted = scd.scd2_compact(dim, "2024-02-01")
    assert compacted.count() == 2
    assert _canon(scd.scd2_present(compacted)) == _canon(scd.scd2_present(dim))


def test_scd2_compact_keeps_event_form_inside_horizon(spark):
    """Events at/after the horizon stay row-per-event so a late arrival can
    still splice between them; merge-after-compact == full rebuild."""
    base = [
        (1, "trial", _ts("2024-01-01 00:00:00"), 1),
        (1, "trial", _ts("2024-01-02 00:00:00"), 2),   # pre-horizon no-op: drops
        (1, "paid", _ts("2024-01-20 00:00:00"), 3),
        (1, "paid", _ts("2024-01-21 00:00:00"), 4),    # post-horizon no-op: kept
    ]
    dim = scd.scd2_from_log(_log(spark, base), collapse=False)
    compacted = scd.scd2_compact(dim, "2024-01-10")
    assert compacted.count() == 3  # trial leader + both paid events
    late = [(1, "suspended", _ts("2024-01-20 12:00:00"), 5)]  # between kept events
    merged = scd.scd2_present(scd.scd2_apply(compacted, _log(spark, late)))
    rebuilt = scd.scd2_from_log(_log(spark, base + late))
    assert _canon(merged) == _canon(rebuilt)
    states = [r[1] for r in sorted(_canon(merged), key=lambda r: (r[0], r[2]))]
    assert states == ["trial", "paid", "suspended", "paid"]


def test_scd2_streaming_sink_compacts_storage(spark, tables, tmp_path):
    """With compact_lag_days, the stored dimension is smaller than the
    event-level form but presents identically."""
    import glob
    import shutil

    events = tables["events"]
    watch = tmp_path / "changes"
    watch.mkdir()
    staged = str(tmp_path / "stage")
    events.coalesce(1).write.mode("overwrite").parquet(staged)
    shutil.copy(glob.glob(f"{staged}/part-*.parquet")[0], watch / "batch0.parquet")

    dim_path = str(tmp_path / "dim")
    src = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(watch))
    )
    q = (
        scd.scd2_streaming_sink(src, dim_path, compact_lag_days=5.0)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(180)
    finally:
        q.stop()

    stored = spark.read.parquet(dim_path)
    assert _canon(scd.scd2_present(stored)) == _canon(scd.scd2_from_log(events))
    # events span ~30 days; a 5-day horizon must have collapsed most no-op runs
    assert stored.count() < events.count()


def test_scd2_change_feed_classifies_all_types(spark):
    old = spark.createDataFrame(
        [(1, "trial"), (2, "paid"), (3, "churned")], ["user_id", "state"]
    )
    new = spark.createDataFrame(
        [(1, "paid"), (2, "paid"), (4, "trial")], ["user_id", "state"]
    )
    out = {r.user_id: r for r in scd.scd2_change_feed(old, new).collect()}
    assert out[1].change == "UPDATE" and out[1].old_state == "trial" and out[1].new_state == "paid"
    assert out[3].change == "DELETE" and out[3].new_state is None
    assert out[4].change == "INSERT" and out[4].old_state is None
    assert 2 not in out  # unchanged keys drop out of the feed


def test_scd2_change_feed_against_snapshots(spark, tables):
    """On the fixture: diff of mid-month vs full current states — every
    UPDATE row's states must match the true last-event states."""
    from pyspark.sql import functions as F

    events = tables["events"]
    old = scd.scd2_dim(
        events.filter(F.col("ts") < F.lit("2024-01-16").cast("timestamp"))
    ).filter("is_current")
    new = scd.scd2_dim(events).filter("is_current")
    feed = scd.scd2_change_feed(old, new).collect()
    assert len(feed) > 0
    assert all(r.change in ("INSERT", "UPDATE") for r in feed)  # new ⊇ old users
    o = {r.user_id: r.state for r in old.collect()}
    n = {r.user_id: r.state for r in new.collect()}
    for r in feed:
        if r.change == "UPDATE":
            assert o[r.user_id] == r.old_state != r.new_state == n[r.user_id]
        else:
            assert r.user_id not in o and r.new_state == n[r.user_id]


def test_apply_change_feed_round_trip_both_directions(spark, tables):
    """The CDC law: applying the old→new feed to old reproduces new.
    The reverse direction (new→old) exercises the DELETE arm — the
    fixture's old snapshot is a strict subset of users, so forward feeds
    have no DELETEs but reverse feeds do."""
    from pyspark.sql import functions as F

    events = tables["events"]
    old = scd.scd2_dim(
        events.filter(F.col("ts") < F.lit("2024-01-16").cast("timestamp"))
    ).filter("is_current")
    new = scd.scd2_dim(events).filter("is_current")

    def as_set(df):
        return {(r.user_id, r.state) for r in df.select("user_id", "state").collect()}

    fwd = scd.apply_change_feed(old, scd.scd2_change_feed(old, new))
    assert as_set(fwd) == as_set(new)
    # DELETE arm: at sf0.001 every user appears before mid-month, so diff
    # toward a user-subset snapshot to force deletions
    subset = new.filter(F.col("user_id") % 5 != 0)
    rev_feed = scd.scd2_change_feed(new, subset)
    assert rev_feed.filter("change = 'DELETE'").count() > 0
    rev = scd.apply_change_feed(new, rev_feed)
    assert as_set(rev) == as_set(subset)


def test_merge_upsert_semantics(spark):
    from jobanalytics_bigdataproject_spark.operators.scd import merge_upsert

    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, name string, v double",
    )
    source = spark.createDataFrame(
        [(2, "B", None), (4, "d", 40.0)],  # update (with NULL winning) + insert
        "k long, name string, v double",
    )
    got = {r.k: (r.name, r.v) for r in merge_upsert(target, source, ("k",)).collect()}
    assert got == {
        1: ("a", 10.0),   # untouched
        2: ("B", None),   # matched: EVERY source column wins, NULL included
        3: ("c", 30.0),   # untouched
        4: ("d", 40.0),   # inserted
    }


def test_merge_upsert_rejects_schema_drift(spark):
    import pytest as _pytest

    from jobanalytics_bigdataproject_spark.operators.scd import merge_upsert

    t = spark.createDataFrame([(1, "a")], "k long, name string")
    s = spark.createDataFrame([(1,)], "k long")
    with _pytest.raises(ValueError, match="identical schemas"):
        merge_upsert(t, s, ("k",))


def test_drift_report_detects_shift_and_zero_fills(spark):
    base = spark.createDataFrame([(float(v),) for v in [5, 15, 15, 25, 35]], "v double")
    cur = spark.createDataFrame([(float(v),) for v in [5, 35, 35, 35]], "v double")
    rep = profile.drift_report(base, cur, "v", lo=0.0, hi=40.0, n_buckets=4)
    rows = {r["bucket"]: r for r in rep.collect()}
    assert sorted(rows) == [0, 1, 2, 3]  # empty buckets are emitted
    assert rows[1]["base_n"] == 2 and rows[1]["cur_n"] == 0
    # shares are truncating integer bp of each side's own total
    assert rows[0]["base_share_bp"] == 2000  # 1/5
    assert rows[0]["cur_share_bp"] == 2500   # 1/4
    assert rows[3]["delta_bp"] == 7500 - 2000
    # identical frames -> all deltas zero
    same = profile.drift_report(base, base, "v", lo=0.0, hi=40.0, n_buckets=4)
    assert all(r["delta_bp"] == 0 for r in same.collect())


def test_drift_report_clamps_outliers_and_buckets_nulls(spark):
    base = spark.createDataFrame([(v,) for v in [-5.0, 100.0, None]], "v double")
    cur = spark.createDataFrame([(v,) for v in [1.0]], "v double")
    rep = profile.drift_report(base, cur, "v", lo=0.0, hi=10.0, n_buckets=2)
    rows = {r["bucket"]: r for r in rep.collect()}
    assert rows[0]["base_n"] == 1 and rows[1]["base_n"] == 1  # clamped ends
    assert rows[-1]["base_n"] == 1 and rows[-1]["cur_n"] == 0  # NULL bucket kept
