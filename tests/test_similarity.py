"""Similarity search: cosine math, top-k shape, LSH candidate ⊆ brute-force
relationship, near-dup blocking."""

from __future__ import annotations

from pyspark.sql import functions as F

from jobanalytics_bigdataproject_spark.operators import similarity


def test_cosine_self_similarity(spark):
    df = spark.createDataFrame([(1, [1.0, 2.0, 3.0])], ["vec_id", "embedding"])
    out = df.select(
        similarity.cosine(F.col("embedding"), F.col("embedding")).alias("s")
    ).first()
    assert abs(out.s - 1.0) < 1e-12


def test_cosine_orthogonal(spark):
    df = spark.createDataFrame([(1,)], ["x"])
    a = F.array(F.lit(1.0), F.lit(0.0))
    b = F.array(F.lit(0.0), F.lit(1.0))
    assert df.select(similarity.cosine(a, b).alias("s")).first().s == 0.0


def test_topk_shape_and_order(tables):
    q = tables["embeddings"].filter(F.col("vec_id") < 3)
    out = similarity.cosine_topk_bruteforce(tables["embeddings"], q, k=4).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rows in by_q.items():
        assert len(rows) == 4
        sims = [r.sim for r in sorted(rows, key=lambda r: r.rank)]
        assert sims == sorted(sims, reverse=True)
        assert all(r.neighbor_id != qid for r in rows)


def test_lsh_results_subset_of_bucket(tables):
    q = tables["embeddings"].filter(F.col("vec_id") < 3)
    brute = similarity.cosine_topk_bruteforce(tables["embeddings"], q, k=1000)
    lsh = similarity.cosine_topk_lsh(tables["embeddings"], q, k=1000, bits=2)
    brute_pairs = {(r.query_id, r.neighbor_id) for r in brute.collect()}
    lsh_pairs = {(r.query_id, r.neighbor_id) for r in lsh.collect()}
    assert lsh_pairs <= brute_pairs
    assert lsh_pairs  # buckets are non-trivial


def test_near_dups_symmetric_blocked(tables):
    out = similarity.embedding_near_dups(tables["embeddings"], threshold=0.2)
    rows = out.collect()
    assert all(r.id_a < r.id_b for r in rows)
    assert all(r.sim >= 0.2 for r in rows)


def test_ivf_results_subset_of_bruteforce(tables):
    from pyspark.sql import functions as F

    q = tables["embeddings"].filter(F.col("vec_id") < 3)
    brute = similarity.cosine_topk_bruteforce(tables["embeddings"], q, k=1000)
    ivf = similarity.cosine_topk_ivf(tables["embeddings"], q, k=1000, n_clusters=4)
    brute_pairs = {(r.query_id, r.neighbor_id) for r in brute.collect()}
    ivf_pairs = {(r.query_id, r.neighbor_id) for r in ivf.collect()}
    assert ivf_pairs and ivf_pairs <= brute_pairs
