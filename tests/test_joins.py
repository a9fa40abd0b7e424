"""As-of and range joins (operators/joins.py): semantics on hand-built
frames where the expected matches are known exactly."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from jobanalytics_bigdataproject_spark.operators import joins


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_join_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-10T00:00:00"), "e1"),
         (1, _ts("2024-01-20T00:00:00"), "e2"),
         (2, _ts("2024-01-05T00:00:00"), "e3")],
        ["uid", "ts", "name"],
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T00:00:00"), 100.0),
         (1, _ts("2024-01-15T00:00:00"), 200.0),
         (1, _ts("2024-02-01T00:00:00"), 300.0),
         (2, _ts("2024-01-06T00:00:00"), 999.0)],
        ["uid", "rts", "val"],
    )
    out = {
        r.name: r.asof_val
        for r in joins.asof_join(
            left, right, "uid", "uid", "ts", "rts", ["val"]
        ).collect()
    }
    assert out["e1"] == 100.0       # only 01-01 is at-or-before 01-10
    assert out["e2"] == 200.0       # 01-15 beats 01-01; 02-01 is future
    assert out["e3"] is None        # 2's only order is after the event


def test_asof_join_inclusive_boundary(spark):
    left = spark.createDataFrame([(1, _ts("2024-01-15T00:00:00"), "e")], ["uid", "ts", "name"])
    right = spark.createDataFrame([(1, _ts("2024-01-15T00:00:00"), 7.0)], ["uid", "rts", "val"])
    out = joins.asof_join(left, right, "uid", "uid", "ts", "rts", ["val"]).first()
    assert out.asof_val == 7.0      # right_time == left_time matches (<=)


def test_range_join_bands_assignment(spark):
    df = spark.createDataFrame([(0.0,), (49.9,), (50.0,), (120.0,)], ["v"])
    bands = [("LOW", 0, 50), ("MID", 50, 100), ("HIGH", 100, 200)]
    out = sorted(
        (r.v, r.band) for r in joins.range_join_bands(df, "v", bands).collect()
    )
    assert out == [(0.0, "LOW"), (49.9, "LOW"), (50.0, "MID"), (120.0, "HIGH")]


def test_range_join_broadcasts_bands(spark, tables):
    from jobanalytics_bigdataproject_spark.plans import inspect

    bands = [("P0", 0, 50), ("P1", 50, 10_000)]
    df = joins.range_join_bands(tables["events"], "value", bands)
    plan = inspect.formatted_plan(df)
    assert "BroadcastNestedLoopJoin" in plan  # fact side streams, bands broadcast


def test_asof_single_shuffle(tables):
    from jobanalytics_bigdataproject_spark.plans import inspect

    out = joins.asof_join(
        tables["events"], tables["orders"],
        "user_id", "o_custkey", "ts", "o_orderdate", ["o_orderdate"],
    )
    # one hashpartitioning exchange on the union (key) — the merge shape
    assert inspect.count_exchanges(out) <= 1


def test_fuzzy_match_blocking_is_lossless_for_distance_band(spark):
    from jobanalytics_bigdataproject_spark.operators.joins import fuzzy_match_pairs

    df = spark.createDataFrame(
        [
            (1, "kitten", 0), (2, "sitten", 0), (3, "kitten!", 0),
            (4, "kitten", 1),          # same name, other block -> excluded
            (5, "completely", 0),
        ],
        "id long, name string, blk long",
    )
    rows = {(r.id_a, r.id_b): r.distance
            for r in fuzzy_match_pairs(df, "id", "name", "blk", max_distance=1).collect()}
    assert rows == {(1, 2): 1, (1, 3): 1}  # substitution and insertion; 2-3 is distance 2


def test_deterministic_sampler_is_stable_and_exact_k(spark, tables):
    from jobanalytics_bigdataproject_spark.operators.sampling import deterministic_k_per_group
    from jobanalytics_bigdataproject_spark.plans.inspect import formatted_plan

    docs = tables["documents"]
    s1 = deterministic_k_per_group(docs, "source", "doc_id", 5).select("doc_id").collect()
    s2 = deterministic_k_per_group(docs, "source", "doc_id", 5).select("doc_id").collect()
    assert sorted(r.doc_id for r in s1) == sorted(r.doc_id for r in s2)
    counts = (
        deterministic_k_per_group(docs, "source", "doc_id", 5)
        .groupBy("source").count().collect()
    )
    assert all(r["count"] <= 5 for r in counts)
    # rank filter must push into WindowGroupLimit (per-group k-row heap)
    plan = formatted_plan(deterministic_k_per_group(docs, "source", "doc_id", 5))
    assert "WindowGroupLimit" in plan


def test_fuzzy_fast_equals_brute_block_join(spark, tables):
    from jobanalytics_bigdataproject_spark.operators.joins import (
        fuzzy_match_pairs,
        fuzzy_match_pairs_fast,
    )

    cust = tables["customer"]
    brute = {
        (r.id_a, r.id_b, r.distance)
        for r in fuzzy_match_pairs(cust, "c_custkey", "c_name", "c_nationkey", 1).collect()
    }
    fast = {
        (r.id_a, r.id_b, r.distance)
        for r in fuzzy_match_pairs_fast(cust, "c_custkey", "c_name", "c_nationkey").collect()
    }
    assert fast == brute and brute


def test_fuzzy_fast_handles_indels_via_cross_length_leg(spark):
    from jobanalytics_bigdataproject_spark.operators.joins import fuzzy_match_pairs_fast

    df = spark.createDataFrame(
        [(1, "kitten", 0), (2, "kittens", 0), (3, "itten", 0), (4, "xyzzy", 0)],
        "id long, name string, blk long",
    )
    rows = {(r.id_a, r.id_b): r.distance
            for r in fuzzy_match_pairs_fast(df, "id", "name", "blk").collect()}
    assert rows == {(1, 2): 1, (1, 3): 1}


def test_triangle_count_on_known_graph(spark):
    from jobanalytics_bigdataproject_spark.operators.joins import triangle_count

    # K4 on {1,2,3,4} (4 triangles, 6 edges) + pendant edge (4,5)
    edges = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)] + [(4, 5)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    r = triangle_count(df).first()
    assert (r.edges, r.triangles) == (7, 4)


def test_pagerank_micro_matches_python_mirror(spark):
    from jobanalytics_bigdataproject_spark.operators.joins import pagerank_micro

    edges = [(1, 2), (2, 3), (3, 1), (3, 4)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")

    # pure-python mirror of the integer recurrence
    sym = set()
    for a, b in edges:
        sym.add((a, b)); sym.add((b, a))
    nodes = {n for e in sym for n in e}
    deg = {n: sum(1 for u, _ in sym if u == n) for n in nodes}
    r = {n: 1_000_000 for n in nodes}
    for _ in range(10):
        inc = {n: 0 for n in nodes}
        for u, v in sym:
            inc[v] += r[u] // deg[u]
        r = {n: 150_000 + (85 * inc[n]) // 100 for n in nodes}

    got = {row.node: row.rank_micro for row in pagerank_micro(df).collect()}
    assert got == r
    # hub node 3 (degree 3) must outrank the leaf (node 4)
    assert got[3] > got[4]


def test_pagerank_micro_partitioning_independent(spark):
    from jobanalytics_bigdataproject_spark.operators.joins import pagerank_micro

    import random
    random.seed(3)
    edges = list({tuple(sorted(random.sample(range(60), 2))) for _ in range(120)})
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    a = [tuple(x) for x in pagerank_micro(df, n_iter=4).collect()]
    b = [tuple(x) for x in pagerank_micro(df.repartition(7), n_iter=4).collect()]
    assert a == b  # integer arithmetic: bit-identical under any partitioning


def test_pagerank_micro_durable_checkpoint(spark, tmp_path):
    from jobanalytics_bigdataproject_spark.operators.joins import pagerank_micro

    df = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    ck = str(tmp_path / "pr_ckpt")
    a = [tuple(x) for x in pagerank_micro(df, n_iter=3).collect()]
    b = [tuple(x) for x in pagerank_micro(df, n_iter=3, checkpoint_dir=ck).collect()]
    assert a == b
