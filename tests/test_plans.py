"""Physical-plan assertions (SURVEY.md §4): these encode the 100 TB
posture — pushdown reaching the scan, pruned ReadSchema, broadcast for
dimension joins, bounded shuffle counts — so perf regressions fail tests,
not just benchmarks."""

from __future__ import annotations

from pyspark.sql import functions as F

from jobanalytics_bigdataproject_spark.operators import analytics
from jobanalytics_bigdataproject_spark.plans import inspect


def test_t1_filter_pushed_to_scan(tables):
    df = analytics.t1_filter_lines(tables["lineitem"])
    pushed = " ".join(inspect.pushed_filters(df))
    assert "l_extendedprice" in pushed  # IsNotNull pushed to parquet


def test_t1_reads_only_needed_columns(tables):
    df = analytics.t1_filter_lines(tables["lineitem"])
    cols = inspect.read_schema_columns(df)
    assert cols and set(cols) <= {
        "l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus", "l_extendedprice",
    }


def test_q2_broadcasts_nation(tables):
    df = analytics.q2_top_nations(tables["orders"], tables["customer"], tables["nation"])
    assert inspect.has_broadcast_hash_join(df)


def test_q1_single_shuffle_agg(tables):
    df = analytics.q1_pricing_summary(tables["lineitem"])
    # one hash-agg shuffle + one ordering exchange, no more
    assert 1 <= inspect.count_exchanges(df) <= 2


def test_q1_partial_aggregation(tables):
    df = analytics.q1_pricing_summary(tables["lineitem"])
    # map-side combine before the shuffle (partial_count/partial_sum)
    assert "partial_count" in inspect.formatted_plan(df)


def test_q4_window_group_limit(tables):
    df = analytics.q4_brand_rank(tables["lineitem"], tables["part"])
    # Spark 3.5+ prunes rank<=k before the full window sort
    assert "WindowGroupLimit" in inspect.formatted_plan(df)


def test_q1_is_codegen(tables):
    df = analytics.q1_pricing_summary(tables["lineitem"])
    assert inspect.codegen_spans(df) >= 1


def test_wordcount_plan_has_no_python_udf(tables):
    df = analytics.t3_word_count(tables["documents"])
    plan = inspect.formatted_plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_projection_prunes_documents_scan(tables):
    df = analytics.t3_word_count(tables["documents"])
    cols = inspect.read_schema_columns(df)
    assert cols == ["text"]  # only the text column is read


def test_training_corpus_single_exchange(tables):
    from jobanalytics_bigdataproject_spark.operators import text as X

    df = X.prepare_training_corpus(tables["documents"])
    # one scan + quality/language filters + fingerprint-window dedup must
    # cost exactly ONE shuffle (the window's hash exchange on the
    # fingerprint); a presentation sort would add a range exchange
    assert inspect.count_exchanges(df) == 1


def test_declared_ann_flagship_prunes_partitions(spark):
    """The DECLARED ANN entry (ann_cosine_ivf_indexed) must read the
    persisted cluster-at-ingest layout with static cell pruning — the scan
    carries a cell IN partition-filter, so only probed cell directories are
    touched. Drives the __spark_entry__ surface, not the raw operator, so a
    wrapper regression (e.g. silently falling back to the brute scan) fails
    here."""
    import __spark_entry__ as mod

    res = mod.queries()["ann_cosine_ivf_indexed"](spark, "/root/testdata/sf0.001")
    plan = res._jdf.queryExecution().executedPlan().toString()
    scan_lines = [l for l in plan.splitlines() if "PartitionFilters: [" in l]
    assert any(
        "cell#" in l and ("IN" in l.upper() or "INSET" in l.upper())
        for l in scan_lines
    ), scan_lines


def test_curriculum_shards_exchange_budget(tables):
    from jobanalytics_bigdataproject_spark.operators import corpus

    df = corpus.curriculum_shards(tables["documents"])
    # one global percentile agg + one shard agg + the presentation sort;
    # the cutoff row rides a broadcast, never a shuffle. r10: +2 round-robin
    # fan-out exchanges (one per scan subtree) when the input scan is
    # under-parallel — identity at real scale, see readers.fan_out_scan
    assert inspect.count_exchanges(df) <= 5
    # the budget's intent: no HASH shuffle beyond the two aggregations
    plan = inspect.formatted_plan(df)
    import re

    assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 2


def test_yoy_growth_exchange_budget(tables):
    df = analytics.yoy_revenue_growth(tables["lineitem"])
    # yearly agg exchange + the single-partition lag window over the
    # post-agg |years| rows (metadata scale by design)
    assert inspect.count_exchanges(df) <= 2


def test_declared_ivfpq_prunes_partitions(spark):
    """The composed IVF×PQ serving path (VERDICT r3 #5) must restrict its
    ADC scan to probed cells at the SOURCE: the codes scan carries a static
    cell IN partition-filter, so unprobed cell directories are never read."""
    import __spark_entry__ as mod

    res = mod.queries()["ann_cosine_ivfpq"](spark, "/root/testdata/sf0.001")
    plan = res._jdf.queryExecution().executedPlan().toString()
    scan_lines = [l for l in plan.splitlines() if "PartitionFilters: [" in l]
    assert any(
        "cell#" in l and ("IN" in l.upper() or "INSET" in l.upper())
        for l in scan_lines
    ), scan_lines


def test_semantic_dedup_anti_join_not_broadcast(spark):
    """VERDICT r3 #4: at a high duplicate rate the dropped-id side of
    semantic_dedup's final anti-join is corpus-scale, so a broadcast HINT
    there OOMs the driver at 100 TB.  Assert the static physical plan keeps
    the anti-join as a shuffle join (AQE may still downgrade it to a
    broadcast at runtime when the dropped side measures small — that
    size-gated conversion is exactly the behavior we want)."""
    import numpy as np

    from jobanalytics_bigdataproject_spark.operators import similarity

    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(40, 64))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = similarity.semantic_dedup(emb, threshold=0.95, bits=4, n_tables=2)
    # sparkPlan() is the pre-AQE static plan: the planner must not have been
    # FORCED into a broadcast on the dropped side by a hint
    plan = out._jdf.queryExecution().sparkPlan().toString()
    offending = [
        l
        for l in plan.splitlines()
        if "BroadcastHashJoin" in l and "LeftAnti" in l
    ]
    assert not offending, offending


def test_contingency_audit_exchange_budget(tables):
    from jobanalytics_bigdataproject_spark.operators import behavior

    df = behavior.contingency_audit(tables["events"])
    # one (type, dow) cell-count exchange over the event log; every later
    # exchange (the three total windows + presentation sort) moves the
    # |types|x7 cell frame only — cap the total so a corpus-sized window
    # can never sneak in
    assert inspect.count_exchanges(df) <= 5
    plan = inspect.formatted_plan(df)
    assert "BatchEvalPython" not in plan  # stays JVM-side


def test_drift_report_single_agg_per_side(tables):
    from jobanalytics_bigdataproject_spark.operators import profile

    o = tables["orders"]
    cur = o.filter(F.col("o_custkey") % 7 != 0)
    df = profile.drift_report(o, cur, "o_totalprice", lo=0.0, hi=500000.0)
    plan = inspect.formatted_plan(df)
    # the two corpus-side aggs are partial (map-side combine) before their
    # single exchange each; everything downstream is <=11 rows
    assert plan.count("HashAggregate") >= 4  # partial+final per side
    assert "BatchEvalPython" not in plan
