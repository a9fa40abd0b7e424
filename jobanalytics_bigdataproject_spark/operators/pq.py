"""[EXT] Product-quantization ANN: compressed codes + asymmetric distance.

The missing piece between the exact scan (``similarity.cosine_topk_bruteforce``)
and the pruned scan (``similarity.ivf_query``) for a 100 TB embedding store
is *compression*: at 64-dim float64 a trillion vectors is ~0.5 PB, but PQ
codes at m=8 subspaces × 1 byte are 8 bytes/vector — RAM-resident per
executor.  This module implements the classic PQ pipeline (Jégou et al.,
"Product Quantization for Nearest Neighbor Search", TPAMI 2011 — public
literature):

1. ``pq_train``    — per-subspace k-means codebooks on a bounded,
                     deterministic sample (driver numpy; the codebook is
                     m·k·(dim/m) floats — kilobytes).
2. ``pq_build_index`` — encode the corpus (Arrow-batched mapInPandas,
                     argmin over k codes per subspace) and persist codes +
                     codebooks as parquet.
3. ``pq_query``    — ADC scan: per query build the m×k lookup table of
                     subspace dot products ONCE, score every code row with
                     m table lookups (numpy fancy-indexing, no per-vector
                     float math), emit per-batch top-k, global top-k via
                     window.  Optional exact re-rank of the top
                     ``refine`` candidates against the uncompressed
                     vectors.

Determinism: sample = first ``sample_n`` ids (orderBy id), k-means init =
evenly-spaced sample points, fixed iteration count — no RNG anywhere, so
the index is byte-identical across builds/cluster sizes.  Like every ANN
path, recall < 1 by construction → rows-only check + measured recall in
tests (and ``similarity.recall_vs_exact`` composes with it).

Scale notes: training collects sample_n·dim doubles (bounded,
metadata-scale, like ivf_query's probed-cell collect); encoding and the
ADC scan are single-pass mapInPandas with only broadcast state; the only
shuffle is the final per-query top-k aggregation over ≤ batches·k
candidate rows per query, not corpus rows.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 (type hints in pandas iterators)
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jobanalytics_bigdataproject_spark.operators.similarity import cosine_expr


def _normalize_rows(mat):
    import numpy as np

    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def _bounded_query_matrix(queries: DataFrame, id_col: str, vec_col: str, max_queries: int):
    """Collect the query vectors to the driver with a HARD bound.

    The ADC serving shape closes a Q×m×k LUT over the corpus scan, which is
    only sane for a bounded query batch; without a guard a corpus-sized
    ``queries`` frame silently OOMs the driver (VERDICT r3 #5).  The check
    costs one ``limit(max+1)`` scan — no full count of an unbounded frame."""
    import numpy as np

    rows = queries.select(id_col, vec_col).limit(max_queries + 1).collect()
    if len(rows) > max_queries:
        raise ValueError(
            f"pq/ivfpq query batch exceeds max_queries={max_queries}: the ADC "
            f"LUT is built per query on the driver, so this path is for bounded "
            f"serving batches. For corpus-scale query sets, chunk the queries "
            f"(several bounded calls) or use the join-based exact paths "
            f"(similarity.cosine_topk_bruteforce / ivf_query)."
        )
    q_ids = np.asarray([r[0] for r in rows])
    q_mat = _normalize_rows(np.asarray([r[1] for r in rows], dtype=np.float64))
    return q_ids, q_mat


def _exact_refine(
    topn: DataFrame,
    queries: DataFrame,
    embeddings: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Stage-2 exact re-rank shared by ``pq_query`` and ``ivfpq_query``:
    candidate (query_id, neighbor_id) pairs are refine·|queries| rows —
    broadcast them onto the corpus scan, never the other way around."""
    q = queries.select(F.col(id_col).alias("__qid"), F.col(vec_col).alias("q_vec"))
    corpus = embeddings.select(
        F.col(id_col).alias("__nid"), F.col(vec_col).alias("c_vec")
    )
    sim = F.round(cosine_expr("q_vec", "c_vec"), 4)
    w2 = Window.partitionBy("query_id").orderBy(F.desc("sim"), "neighbor_id")
    pairs = topn.select("query_id", "neighbor_id")
    return (
        corpus.join(F.broadcast(pairs), corpus["__nid"] == pairs["neighbor_id"])
        .join(F.broadcast(q), pairs["query_id"] == q["__qid"])
        .select("query_id", "neighbor_id", sim.alias("sim"))
        .withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def pq_train(
    embeddings: DataFrame,
    m: int = 8,
    k: int = 16,
    sample_n: int = 4096,
    n_iter: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Train per-subspace codebooks: deterministic Lloyd's on the first
    ``sample_n`` vectors (L2-normalized — the query metric is cosine, same
    spherical rationale as ``ivf_build_index``).  Returns a numpy array of
    shape (m, k, dim/m)."""
    import numpy as np

    sample = (
        embeddings.select(id_col, vec_col).orderBy(id_col).limit(sample_n).collect()
    )
    mat = _normalize_rows(np.asarray([r[1] for r in sample], dtype=np.float64))
    dim = mat.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    books = np.empty((m, k, dsub))
    for s in range(m):
        x = mat[:, s * dsub : (s + 1) * dsub]
        # deterministic init: evenly spaced sample points (sample is id-sorted)
        centers = x[np.linspace(0, len(x) - 1, k).astype(int)].copy()
        for _ in range(n_iter):
            d2 = ((x[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(k):
                mask = assign == c
                if mask.any():
                    centers[c] = x[mask].mean(axis=0)
        books[s] = centers
    return books


def pq_build_index(
    embeddings: DataFrame,
    path: str,
    m: int = 8,
    k: int = 16,
    sample_n: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Encode the corpus and persist ``{path}/codes`` (id + m uint8-range
    codes) and ``{path}/codebooks`` (m·k centers).  Encoding is one
    mapInPandas pass with the kilobyte codebook in the closure — no
    shuffle, no fit at query time (cluster-at-ingest, like
    ``ivf_build_index``)."""
    import numpy as np

    books = pq_train(embeddings, m=m, k=k, sample_n=sample_n, id_col=id_col, vec_col=vec_col)
    mm, kk, dsub = books.shape
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("codes", T.ArrayType(T.IntegerType())),
        ]
    )

    def encode(batches):
        for pdf in batches:
            mat = _normalize_rows(
                np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            )
            codes = np.empty((len(pdf), mm), dtype=np.int32)
            for s in range(mm):
                x = mat[:, s * dsub : (s + 1) * dsub]
                d2 = ((x[:, None, :] - books[s][None, :, :]) ** 2).sum(axis=2)
                codes[:, s] = d2.argmin(axis=1)
            yield pd.DataFrame({"vec_id": pdf[id_col].to_numpy(), "codes": list(codes)})

    embeddings.select(id_col, vec_col).mapInPandas(encode, schema).write.mode(
        "overwrite"
    ).parquet(f"{path}/codes")

    spark = embeddings.sparkSession
    rows = [
        (s, c, [float(x) for x in books[s, c]])
        for s in range(mm)
        for c in range(kk)
    ]
    spark.createDataFrame(
        rows, "sub INT, code INT, center ARRAY<DOUBLE>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/codebooks")


def pq_query(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 5,
    refine: int = 0,
    embeddings: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_queries: int = 4096,
) -> DataFrame:
    """ADC scan of a persisted PQ index.

    Per query the m×k lookup table (subspace dot products against every
    code center) is built once; scoring a code row is then m integer
    lookups + adds — numpy fancy-indexing over the whole Arrow batch at
    once.  Each batch emits only its local top-k per query; the global
    top-k is a window over ≤ batches·k rows per query.

    ``refine > 0``: re-rank the top ``refine`` ADC candidates with exact
    cosine against ``embeddings`` (the uncompressed store) — the standard
    two-stage PQ serving shape; candidates join by id, so the exact pass
    touches refine·|queries| vectors, not the corpus.

    ``max_queries`` bounds the driver-side query collect (the LUT closure
    is per-query state); an over-limit batch raises instead of OOMing."""
    import numpy as np

    books_rows = spark.read.parquet(f"{path}/codebooks").collect()
    mm = 1 + max(r.sub for r in books_rows)
    kk = 1 + max(r.code for r in books_rows)
    dsub = len(books_rows[0].center)
    books = np.empty((mm, kk, dsub))
    for r in books_rows:
        books[r.sub, r.code] = r.center

    q_ids, q_mat = _bounded_query_matrix(queries, id_col, vec_col, max_queries)
    # LUT[q, s, c] = <q_sub, center_sc>; ADC score = Σ_s LUT[q, s, codes[s]]
    lut = np.einsum("qsd,scd->qsc", q_mat.reshape(len(q_ids), mm, dsub), books)

    n_cand = max(k, refine)
    schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("score", T.DoubleType()),
        ]
    )

    def scan(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["vec_id"].to_numpy()
            codes = np.asarray(list(pdf["codes"]), dtype=np.int64)  # (n, m)
            # scores (Q, n): sum over subspaces of LUT gathers
            scores = np.zeros((len(q_ids), len(ids)))
            for s in range(mm):
                scores += lut[:, s, codes[:, s]]
            # +1 so dropping a self-match below cannot shrink a batch's
            # candidate set under n_cand
            top = min(n_cand + 1, len(ids))
            idx = np.argpartition(-scores, top - 1, axis=1)[:, :top]
            out_q = np.repeat(q_ids, top)
            out_n = ids[idx].ravel()
            out_s = np.take_along_axis(scores, idx, axis=1).ravel()
            keep = out_q != out_n
            yield pd.DataFrame(
                {"query_id": out_q[keep], "neighbor_id": out_n[keep],
                 "score": np.round(out_s[keep], 6)}
            )

    cand = spark.read.parquet(f"{path}/codes").mapInPandas(scan, schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), "neighbor_id")
    topn = (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n_cand)
    )
    if not refine:
        return topn.filter(F.col("rank") <= k).orderBy("query_id", "rank")

    if embeddings is None:
        raise ValueError("refine > 0 requires the uncompressed embeddings frame")
    return _exact_refine(topn, queries, embeddings, k, id_col, vec_col)


def ivfpq_build_index(
    embeddings: DataFrame,
    path: str,
    n_clusters: int = 8,
    m: int = 8,
    k: int = 16,
    sample_n: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> None:
    """[EXT] Composed IVF×PQ index — the trillion-vector serving shape
    (VERDICT r3 next-round #5): a spherical-KMeans coarse quantizer
    partitions the corpus into cells (IVF half, same rationale as
    ``similarity.ivf_build_index``), and each vector is stored as m
    uint8-range PQ codes (compression half).  Persists:

      - ``{path}/centroids``  — n_clusters coarse centers (metadata scale);
      - ``{path}/codebooks``  — m·k PQ centers (kilobytes);
      - ``{path}/codes``      — (vec_id, codes) parquet physically
        partitioned by ``cell``, so a query's ADC scan prunes unprobed
        cell directories at the SOURCE (PartitionFilters, plan-gated).

    Codes quantize the L2-normalized vector directly (not the classical
    residual vs the coarse centroid — Jégou et al. 2011 §IV): one shared
    codebook keeps encode/ADC identical to the flat PQ path and the exact
    ``refine`` stage absorbs the small recall difference; measured recall
    lives in ``ann_recall_report`` like every other dial here.

    Scale: KMeans fit is MLlib-distributed; encoding is one mapInPandas
    pass with the kilobyte codebook in the closure; the only shuffle is
    the partitioned write."""
    import numpy as np

    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    from jobanalytics_bigdataproject_spark.operators.similarity import _norm

    books = pq_train(
        embeddings, m=m, k=k, sample_n=sample_n, id_col=id_col, vec_col=vec_col
    )
    mm, kk, dsub = books.shape

    unit = F.transform(
        F.col(vec_col), lambda x: x.cast("double") / F.nullif(_norm(F.col(vec_col)), F.lit(0.0))
    )
    feat = embeddings.select(
        F.col(id_col), F.col(vec_col), array_to_vector(unit).alias("__features")
    )
    model = KMeans(k=n_clusters, seed=seed, featuresCol="__features").fit(feat)
    assigned = model.transform(feat).select(
        id_col, vec_col, F.col("prediction").alias("cell")
    )

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("codes", T.ArrayType(T.IntegerType())),
            T.StructField("cell", T.IntegerType()),
        ]
    )

    def encode(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = _normalize_rows(
                np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            )
            codes = np.empty((len(pdf), mm), dtype=np.int32)
            for s in range(mm):
                x = mat[:, s * dsub : (s + 1) * dsub]
                d2 = ((x[:, None, :] - books[s][None, :, :]) ** 2).sum(axis=2)
                codes[:, s] = d2.argmin(axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col].to_numpy(),
                    "codes": list(codes),
                    "cell": pdf["cell"].to_numpy(),
                }
            )

    assigned.mapInPandas(encode, schema).write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(f"{path}/codes")

    spark = embeddings.sparkSession
    spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cell INT, centroid ARRAY<DOUBLE>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
    spark.createDataFrame(
        [
            (s, c, [float(x) for x in books[s, c]])
            for s in range(mm)
            for c in range(kk)
        ],
        "sub INT, code INT, center ARRAY<DOUBLE>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/codebooks")


def ivfpq_append(
    spark,
    new_vectors: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Incremental ingest into a persisted IVF×PQ index: assign each new
    vector to its nearest existing coarse centroid (the quantizer's own
    assignment metric, matching ``ivfpq_query``'s probe ranking), encode with the STORED codebooks,
    and append to the cell-partitioned codes layout.  No re-fit, history
    untouched — the same operational shape as ``similarity.ivf_append``
    and the MinHash signature store.  Centroid/codebook drift is the
    operator's accepted debt; ``ann_recall_report`` is the watchdog that
    says when to rebuild offline."""
    import numpy as np

    books_rows = spark.read.parquet(f"{path}/codebooks").collect()
    mm = 1 + max(r.sub for r in books_rows)
    dsub = len(books_rows[0].center)
    books = np.empty((mm, 1 + max(r.code for r in books_rows), dsub))
    for r in books_rows:
        books[r.sub, r.code] = r.center
    cent_rows = spark.read.parquet(f"{path}/centroids").collect()
    cents = np.empty((1 + max(r.cell for r in cent_rows), mm * dsub))
    for r in cent_rows:
        cents[r.cell] = r.centroid
    # assignment-metric scoring (r10, propagated from the ivf_query fix):
    # the coarse quantizer assigned by Euclidean distance of the unit
    # vector, i.e. argmax m·c − |c|²/2 — cosine on normalized centroids
    # orders cells differently whenever centroid norms differ, and an
    # appended vector must land where a rebuild would put it
    cents_half_sq = 0.5 * (cents * cents).sum(axis=1)

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("codes", T.ArrayType(T.IntegerType())),
            T.StructField("cell", T.IntegerType()),
        ]
    )

    def encode(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = _normalize_rows(
                np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            )
            cell = np.argmax(mat @ cents.T - cents_half_sq, axis=1).astype(np.int32)
            codes = np.empty((len(pdf), mm), dtype=np.int32)
            for s in range(mm):
                x = mat[:, s * dsub : (s + 1) * dsub]
                d2 = ((x[:, None, :] - books[s][None, :, :]) ** 2).sum(axis=2)
                codes[:, s] = d2.argmin(axis=1)
            yield pd.DataFrame(
                {"vec_id": pdf[id_col].to_numpy(), "codes": list(codes), "cell": cell}
            )

    new_vectors.select(id_col, vec_col).mapInPandas(encode, schema).write.mode(
        "append"
    ).partitionBy("cell").parquet(f"{path}/codes")


def ivfpq_query(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 2,
    refine: int = 0,
    embeddings: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_queries: int = 4096,
) -> DataFrame:
    """ADC scan restricted to each query's probed IVF cells, then optional
    exact refine — the production ANN serving shape composed from
    ``ivf_query``'s static partition pruning and ``pq_query``'s LUT scan
    (VERDICT r3 next-round #5).

    Per query: rank coarse centroids by cosine on the driver (centroids
    are metadata scale), probe the top ``n_probe`` cells.  The union of
    probed cells becomes a static IN filter on the PARTITION column of the
    codes scan — only probed cell directories are read (PartitionFilters,
    same reliable-pruning rationale as ``ivf_query``).  Inside the scan a
    (Q × n_clusters) probe mask zeroes out scores for cells a given query
    did not probe, so per-query semantics match classical IVFADC even
    though one pass serves the whole query batch.

    Scale: corpus side touches ~n_probe/n_clusters of the code rows and
    never shuffles (per-batch top-k, then a window over ≤ batches·k rows
    per query); queries/codebooks/mask are broadcast closure state,
    bounded by ``max_queries``."""
    import numpy as np

    books_rows = spark.read.parquet(f"{path}/codebooks").collect()
    mm = 1 + max(r.sub for r in books_rows)
    kk = 1 + max(r.code for r in books_rows)
    dsub = len(books_rows[0].center)
    books = np.empty((mm, kk, dsub))
    for r in books_rows:
        books[r.sub, r.code] = r.center

    cent_rows = spark.read.parquet(f"{path}/centroids").collect()
    n_cells = 1 + max(r.cell for r in cent_rows)
    cents = np.empty((n_cells, mm * dsub))
    for r in cent_rows:
        cents[r.cell] = r.centroid

    q_ids, q_mat = _bounded_query_matrix(queries, id_col, vec_col, max_queries)
    # coarse ranking by the ASSIGNMENT metric (argmax q̂·c − |c|²/2 —
    # the r10 ivf_query fix propagated: cosine-to-centroid diverges from
    # the quantizer's ordering when centroid norms differ), ties broken
    # by cell id (argsort is stable over -score then cell order)
    cell_scores = q_mat @ cents.T - 0.5 * (cents * cents).sum(axis=1)
    probe_idx = np.argsort(-cell_scores, axis=1, kind="stable")[:, :n_probe]
    probe_mask = np.zeros((len(q_ids), n_cells), dtype=bool)
    np.put_along_axis(probe_mask, probe_idx, True, axis=1)
    cells = sorted({int(c) for c in probe_idx.ravel()})

    lut = np.einsum("qsd,scd->qsc", q_mat.reshape(len(q_ids), mm, dsub), books)
    n_cand = max(k, refine)
    schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("score", T.DoubleType()),
        ]
    )

    def scan(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["vec_id"].to_numpy()
            codes = np.asarray(list(pdf["codes"]), dtype=np.int64)  # (n, m)
            row_cells = pdf["cell"].to_numpy(dtype=np.int64)
            scores = np.zeros((len(q_ids), len(ids)))
            for s in range(mm):
                scores += lut[:, s, codes[:, s]]
            # per-query cell restriction: a row only scores for queries
            # that probed its cell
            scores = np.where(probe_mask[:, row_cells], scores, -np.inf)
            top = min(n_cand + 1, len(ids))
            idx = np.argpartition(-scores, top - 1, axis=1)[:, :top]
            out_q = np.repeat(q_ids, top)
            out_n = ids[idx].ravel()
            out_s = np.take_along_axis(scores, idx, axis=1).ravel()
            keep = (out_q != out_n) & np.isfinite(out_s)
            yield pd.DataFrame(
                {"query_id": out_q[keep], "neighbor_id": out_n[keep],
                 "score": np.round(out_s[keep], 6)}
            )

    cand = (
        spark.read.parquet(f"{path}/codes")
        # static IN filter on the partition column -> PartitionFilters
        # prune unprobed cell directories at the source (plan-gated)
        .filter(F.col("cell").isin(cells))
        .mapInPandas(scan, schema)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), "neighbor_id")
    topn = (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n_cand)
    )
    if not refine:
        return topn.filter(F.col("rank") <= k).orderBy("query_id", "rank")
    if embeddings is None:
        raise ValueError("refine > 0 requires the uncompressed embeddings frame")
    return _exact_refine(topn, queries, embeddings, k, id_col, vec_col)


def sq_error_report(embeddings: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """[EXT] Int8 scalar quantization (the OTHER compression point next to
    PQ: 64 B/vector instead of 8 B, near-lossless) with a per-vector
    measured-error report — cosine(x, x̂) and max elementwise |x−x̂| after
    an encode→decode round trip through 255 per-dimension levels.

    Fully oracle-checkable, unlike the ANN paths: per-dimension min/max
    are order-independent, the affine round trip is per-row IEEE
    arithmetic in identical (list) order on both engines, and outputs are
    rounded at the established 4dp sim precision.

    Scale: the min/max pass is posexplode → map-side-combined per-dim agg
    (|dims| rows broadcast back); the round trip is one codegen'd
    projection.  Encoded form = transform(...round(...)) cast to tinyint —
    the report keeps it fused since storage is not the point here."""
    ex = embeddings.select(F.posexplode(vec_col).alias("dim", "x"))
    mm = ex.groupBy("dim").agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    params = mm.agg(
        F.expr("transform(array_sort(collect_list(struct(dim, lo))), s -> s.lo)").alias("lo"),
        F.expr("transform(array_sort(collect_list(struct(dim, hi))), s -> s.hi)").alias("hi"),
    )
    rhat = F.expr(
        f"transform(arrays_zip({vec_col}, lo, hi), s -> "
        f"s.lo + (round(254.0*(s.{vec_col} - s.lo)/nullif(s.hi - s.lo, 0.0D))/254.0)"
        f"*(s.hi - s.lo))"
    )
    sim = cosine_expr(vec_col, "rhat")
    max_err = F.expr(
        f"array_max(transform(arrays_zip({vec_col}, rhat), s -> abs(s.{vec_col} - s.rhat)))"
    )
    return (
        embeddings.crossJoin(F.broadcast(params))
        .withColumn("rhat", rhat)
        .select(
            F.col(id_col),
            F.round(sim, 4).alias("sim"),
            F.round(max_err, 4).alias("max_abs_err"),
        )
        .orderBy(id_col)
    )
