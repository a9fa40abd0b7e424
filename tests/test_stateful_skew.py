"""Stateful streaming (applyInPandasWithState across micro-batches) and
skew-mitigation helpers (salted agg/join == unsalted results)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from jobanalytics_bigdataproject_spark.operators import skew
from jobanalytics_bigdataproject_spark.streaming import windows as stream
from jobanalytics_bigdataproject_spark.streaming.stateful import running_user_totals

SF_DIR = "/root/testdata/sf0.001"


def test_stateful_running_totals_across_batches(spark, tables, tmp_path):
    # stage events as TWO files → maxFilesPerTrigger=1 forces two
    # micro-batches, so per-user state must survive a batch boundary
    src = str(tmp_path / "ev2")
    tables["events"].repartition(2).write.parquet(src)
    streamed = stream.read_events_stream(spark, src, max_files_per_trigger=1)
    q = (
        running_user_totals(streamed)
        .writeStream.format("memory")
        .queryName("user_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    assert q.lastProgress is None or True  # query completed
    # final running total per user == plain batch aggregation
    final = {
        r.user_id: (r.event_count_total, r.value_total)
        for r in spark.sql(
            """SELECT user_id, MAX(event_count_total) AS event_count_total,
                      MAX(value_total) AS value_total
               FROM user_totals GROUP BY user_id"""
        ).collect()
    }
    batch = {
        r.user_id: (r.n, round(r.cents / 100.0, 2))
        for r in tables["events"]
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
        )
        .collect()
    }
    assert final == batch
    # at least one user must have been emitted in both batches (state reuse)
    n_emits = spark.sql("SELECT COUNT(*) c FROM user_totals").first().c
    assert n_emits > len(batch)


def test_stateful_totals_batch_boundary_invariant():
    # Same rows, different micro-batch slicings → identical running totals.
    # Values like 0.155 are chosen so a batch-level float-sum-then-round
    # would drift across slicings; per-row rounding must not.
    import pandas as pd

    from jobanalytics_bigdataproject_spark.streaming import stateful

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    values = [0.155, 0.245, 0.335, 0.125, 0.015, 0.995, 1.005, 2.675]

    def run(slicings):
        state = FakeState()
        for lo, hi in slicings:
            pdf = pd.DataFrame({"value": values[lo:hi]})
            list(stateful._update_user_totals((7,), [pdf], state))
        return state.get

    one_batch = run([(0, len(values))])
    per_row = run([(i, i + 1) for i in range(len(values))])
    uneven = run([(0, 3), (3, 4), (4, len(values))])
    assert one_batch == per_row == uneven
    assert one_batch[0] == len(values)


def test_salted_count_sum_equals_plain(tables):
    plain = {
        r.c_mktsegment: (r["count"], round(r.s, 2))
        for r in tables["customer"]
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("count"), F.sum("c_acctbal").alias("s"))
        .collect()
    }
    salted = {
        r.c_mktsegment: (r["count"], round(r.sum_c_acctbal, 2))
        for r in skew.salted_count_sum(
            tables["customer"], ["c_mktsegment"], ["c_acctbal"], ["c_custkey"]
        ).collect()
    }
    assert salted == plain


def test_salted_join_equals_plain(tables):
    plain = (
        tables["customer"]
        .join(tables["nation"], F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "n_name")
    )
    salted = skew.salted_join(
        tables["customer"],
        tables["nation"],
        "c_nationkey",
        "n_nationkey",
        salt_cols=["c_custkey"],
        salt_n=8,
    ).select("c_custkey", "n_name")
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salt_is_deterministic(tables):
    a = skew.salted_count_sum(
        tables["orders"], ["o_orderstatus"], ["o_totalprice"], ["o_orderkey"]
    ).collect()
    b = skew.salted_count_sum(
        tables["orders"], ["o_orderstatus"], ["o_totalprice"], ["o_orderkey"]
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
