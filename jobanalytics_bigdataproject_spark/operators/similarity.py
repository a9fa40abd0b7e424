"""[EXT] Similarity search over the ``embeddings`` table (north-star
LLM-pipeline surface; no analog in the reference).

Two paths:
- brute-force cosine top-k: exact baseline. Query set ⋈ corpus via a
  *broadcast* of the (small) query side — corpus never shuffles; per-pair
  cosine is a codegen'd array expression (zip_with + aggregate), JVM-side.
- LSH-bucketed (sign-random-projection) top-k: the scale path. Each vector
  gets a b-bit hypercube code from fixed pseudo-random hyperplanes
  (deterministic, derived from xxhash64 of coordinates index — no stored
  model); candidates = same bucket, then exact cosine re-rank inside
  buckets. Turns O(N·Q) into O(N·Q/2^b) at a recall cost.

At 100 TB the corpus side stays partitioned; only query vectors (or the
hyperplane matrix) broadcast. Zero Python UDFs — all array built-ins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double (accumulate left-to-right: deterministic and
    identical to the oracle's sequential list_dot_product)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / F.nullif(_norm(a) * _norm(b), F.lit(0.0))


def cosine_topk_bruteforce(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: for each query vector, the k nearest corpus
    vectors (excluding itself). The query side is broadcast — the corpus
    is scanned once, partition-local; ranking is a per-query-group window
    (partitioned by query id, never global)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    sim = F.round(cosine(F.col("q_vec"), F.col("c_vec")), 4)
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), "neighbor_id")
    return (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def srp_bucket(vec: Column, bits: int = 8, dim: int = 64) -> Column:
    """Sign-random-projection LSH bucket id (0..2^bits-1). Hyperplane h_b's
    coordinate j is a deterministic pseudo-random ±1 derived from
    xxhash64(b*dim+j) — fixed across runs and nodes without shipping a
    model. Bucket bit b = sign(Σ_j h_bj · vec_j)."""
    out = F.lit(0).cast("long")
    for b in range(bits):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(b * dim), F.lit(b * dim + dim - 1)),
                lambda x, j: x.cast("double")
                * F.when(F.xxhash64(j).bitwiseAND(F.lit(1)) == 1, 1.0).otherwise(-1.0),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        out = out.bitwiseOR(
            F.when(proj > 0, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(F.lit(0).cast("long"))
        )
    return out


def cosine_topk_lsh(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    bits: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF/LSH-style ANN: restrict the exact re-rank to corpus vectors in the
    query's SRP bucket. Recall < 1 by construction (rows-only check); at
    scale the bucket column is computed once at ingest and the corpus is
    partitioned/bucketed by it, so a query touches 1/2^bits of the data."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        srp_bucket(F.col(vec_col), bits, dim).alias("bucket"),
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        srp_bucket(F.col(vec_col), bits, dim).alias("bucket"),
    )
    sim = F.round(cosine(F.col("q_vec"), F.col("c_vec")), 4)
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), "neighbor_id")
    return (
        c.join(F.broadcast(q), on="bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def embedding_near_dups(
    embeddings: DataFrame,
    threshold: float = 0.95,
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs above ``threshold``, blocked by
    ``block_col`` to bound the pair expansion (at scale the block is an LSH
    bucket — see srp_bucket; here the fixture's label column doubles as the
    block). Self-join shuffles both sides on the block key once."""
    a = embeddings.select(
        F.col(block_col).alias("block"),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("vec_a"),
    )
    b = embeddings.select(
        F.col(block_col).alias("block"),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vec_b"),
    )
    sim = F.round(cosine(F.col("vec_a"), F.col("vec_b")), 4)
    return (
        a.join(b, on="block")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("block", "id_a", "id_b", sim.alias("sim"))
        .filter(F.col("sim") >= threshold)
        .orderBy("block", "id_a", "id_b")
    )
