"""[EXT] Join operators Spark lacks as primitives, expressed as scalable
compositions (north-star "custom operators" surface; the reference's only
join is J1 — SURVEY.md §2.3):

- **as-of join**: for each left row, the most recent right row with
  ``right_time <= left_time`` per key. Implemented with the canonical
  distributed merge: tag both sides, union, and take ``last(payload,
  ignorenulls)`` over a (key, time)-ordered running window. ONE shuffle on
  the key, sorted within partitions — no per-row lookups, no broadcast of
  the big side; this is how as-of scales to 100 TB (both sides
  co-partitioned by key).
- **range join (band join)**: value-in-interval join against a small bands
  dimension via broadcast nested-loop — the bands side is tiny by
  construction, so the fact side streams through untouched.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    payload_cols: Sequence[str],
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join (inclusive: right_time <= left_time).

    Tie semantics: among right rows sharing the latest time, the one
    sorting last by payload values wins (deterministic given ordered
    payloads). Right rows sort *before* left rows at equal time, giving
    the inclusive <= bound."""
    l2 = (
        left.withColumn("__k", F.col(left_key))
        .withColumn("__t", F.col(left_time))
        .withColumn("__tag", F.lit(1))
    )
    r2 = right.select(
        F.col(right_key).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__tag"),
        *[F.col(p).alias(f"__p_{p}") for p in payload_cols],
    )
    u = l2.unionByName(r2, allowMissingColumns=True)
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__tag", *[f"__p_{p}" for p in payload_cols])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.select(
        "*",
        *[
            F.last(f"__p_{p}", ignorenulls=True).over(w).alias(f"{prefix}{p}")
            for p in payload_cols
        ],
    )
    return filled.filter(F.col("__tag") == 1).select(
        *left.columns, *[f"{prefix}{p}" for p in payload_cols]
    )


def range_join_bands(
    df: DataFrame,
    value_col: str,
    bands: Sequence[tuple[str, float, float]],
    how: str = "inner",
) -> DataFrame:
    """Band join: rows matched to (label, lo, hi) intervals with
    ``lo <= value < hi``. The bands dimension is broadcast (tiny), so the
    non-equi predicate runs as a broadcast nested-loop with the fact side
    streaming — the only sane physical plan for interval joins at scale
    short of bucketizing."""
    spark = df.sparkSession
    bands_df = spark.createDataFrame(
        [(label, float(lo), float(hi)) for label, lo, hi in bands],
        ["band", "band_lo", "band_hi"],
    )
    v = F.col(value_col)
    return df.join(
        F.broadcast(bands_df),
        (v >= F.col("band_lo")) & (v < F.col("band_hi")),
        how,
    )


def fuzzy_match_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_col: str,
    max_distance: int = 1,
) -> DataFrame:
    """[EXT] Entity-resolution candidate pairs: names within Levenshtein
    ``max_distance``, blocked by ``block_col`` + name length band (edit
    distance d implies length difference ≤ d, so banding by length loses
    nothing — a free exact-blocking rule).

    Scale: the self-join shuffles on (block, length band) instead of
    exploding all-pairs; levenshtein is a JVM built-in evaluated only
    inside blocks. O(Σ block²) comparisons — block on the lowest-
    cardinality key that keeps blocks bounded, exactly like the LSH
    buckets in the dedup tier."""
    a = df.select(
        F.col(id_col).alias("id_a"),
        F.col(name_col).alias("name_a"),
        F.col(block_col).alias("blk"),
        F.length(name_col).alias("len_a"),
    )
    b = df.select(
        F.col(id_col).alias("id_b"),
        F.col(name_col).alias("name_b"),
        F.col(block_col).alias("blk"),
        F.length(name_col).alias("len_b"),
    )
    return (
        a.join(b, "blk")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("len_a") - F.col("len_b")) <= max_distance)
        )
        .withColumn("distance", F.levenshtein("name_a", "name_b"))
        .filter(F.col("distance") <= max_distance)
        .select("id_a", "id_b", F.col("blk").alias(block_col), "distance")
    )


def fuzzy_match_pairs_fast(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_col: str,
) -> DataFrame:
    """[EXT] Exact distance-1 fuzzy pairs WITHOUT the O(block^2) scan --
    the declared scale path for ``fuzzy_match_pairs`` at max_distance=1.

    Pigeonhole, leave-one-out form: a single substitution touches exactly
    one of n fixed length-fraction pieces, so two equal-length strings at
    distance 1 agree EXACTLY on n-1 of their n pieces.  Each name emits n
    bucket keys (drop piece i, concatenate the rest tagged with i and the
    length); a distance-1 pair must share >=1 key.  Unlike the
    naive halves split (which collapses when the data shares a common
    prefix -- e.g. every key sharing "Customer#" lands in ONE bucket and
    the self-join degenerates to the full block product, measured 14 s at
    sf0.1), every leave-one-out key contains (n-1)/n of the string
    including its distinguishing tail, so buckets stay near-singleton on
    real id-like data (measured: 14 s brute -> 8.4 s quarters -> 5.0 s
    eighths at sf0.1).  Cross-length pairs (one indel) break fixed splits and go
    through a (block, len+-1) EQUI join -- empty when lengths are
    uniform.  The union of the legs is provably every distance<=1 pair;
    each candidate is levenshtein-verified, so no false positives
    (equivalence-tested against the brute block join, and the DuckDB
    oracle IS the brute form)."""
    L = F.length(name_col)
    # fan_out_scan (guide §2.5): the 8 leave-one-out substring keys are
    # built per row in BOTH self-join legs — an under-parallel input scan
    # serializes that map work twice; identity at real scale
    from jobanalytics_bigdataproject_spark.sources.readers import fan_out_scan

    base = fan_out_scan(df).select(
        F.col(id_col).alias("id"),
        F.col(name_col).alias("name"),
        F.col(block_col).alias("blk"),
        L.alias("len"),
    )
    # n_pieces fixed length-fractions; a substitution touches exactly one
    # piece, so a distance-1 pair shares n_pieces-1 of them. More pieces =
    # finer leave-one-out keys = smaller buckets: with 4 pieces on id-like
    # names the drop-tail key still shared all the leading digits and kept
    # ~hundreds-row buckets (measured 8.4 s at sf0.1); 8 pieces leave only
    # ~2 chars out per key, collapsing buckets to near-singletons.
    n_pieces = 8
    bounds = (
        ["0"]
        + [f"cast(ceil({i} * len / {n_pieces}.0) as int)" for i in range(1, n_pieces)]
        + ["len"]
    )
    pieces = [
        f"substring(name, {bounds[i]} + 1, {bounds[i + 1]} - ({bounds[i]}))"
        for i in range(n_pieces)
    ]
    loo_keys = [
        "concat_ws('\\u0001', '" + str(i) + "', cast(len as string), "
        + ", ".join(p for j, p in enumerate(pieces) if j != i)
        + ")"
        for i in range(n_pieces)
    ]
    keyed = base.select(
        "id", "name", "blk", "len",
        F.explode(F.expr("array(" + ", ".join(loo_keys) + ")")).alias("bucket"),
    )
    a = keyed.select(
        F.col("id").alias("id_a"), F.col("name").alias("name_a"), "blk", "bucket"
    )
    b = keyed.select(
        F.col("id").alias("id_b"), F.col("name").alias("name_b"), "blk", "bucket"
    )
    same_len = (
        a.join(b, ["blk", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "blk", "name_a", "name_b")
        .distinct()  # a pair can collide on several leave-one-out keys
    )
    # cross-length leg: |len - len'| == 1 as an EQUI key (blk, len+1 = len'),
    # never a residual filter over the full block product -- with uniform
    # name lengths this leg is empty and costs one empty hash probe
    a2 = base.select(
        F.col("id").alias("id_a"), F.col("name").alias("name_a"),
        "blk", F.col("len").alias("len_a"),
        (F.col("len") + 1).alias("len_plus"),
    )
    b2 = base.select(
        F.col("id").alias("id_b"), F.col("name").alias("name_b"),
        F.col("blk").alias("blk_b"), F.col("len").alias("len_b"),
    )
    leg1 = a2.join(
        b2, (F.col("blk") == F.col("blk_b")) & (F.col("len_plus") == F.col("len_b"))
    )
    leg2 = a2.join(
        b2, (F.col("blk") == F.col("blk_b")) & (F.col("len_a") == F.col("len_b") + 1)
    )
    cross_len = (
        leg1.unionByName(leg2)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "blk", "name_a", "name_b")
    )
    return (
        same_len.unionByName(cross_len)
        .withColumn("distance", F.levenshtein("name_a", "name_b"))
        .filter(F.col("distance") <= 1)
        .select("id_a", "id_b", F.col("blk").alias(block_col), "distance")
    )


def triangle_count(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """[EXT] Distributed triangle counting over an undirected edge list
    (edges oriented a<b as the fuzzy/near-dup pair ops emit them):
    join edges (a,b)+(b,c) to wedges, close each wedge against (a,c).
    Returns one row: edges, wedges, triangles.

    Scale: the canonical two-join formulation; both joins shuffle on a
    vertex key, and orienting edges low->high means every triangle is
    counted exactly once (a<b<c) with no post-dedup. Skewed hub vertices
    make wedge counts quadratic in hub degree — the standard mitigation
    (split hubs / approximate with degree threshold) applies upstream by
    capping block sizes in the pair generators."""
    e = pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b")).distinct()
    e2 = e.select(F.col("a").alias("b2"), F.col("b").alias("c"))
    wedges = e.join(e2, F.col("b") == F.col("b2")).select("a", "b", "c")
    e3 = e.select(F.col("a").alias("a3"), F.col("b").alias("c3"))
    tri = wedges.join(
        e3, (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")), "left_semi"
    )
    return (
        e.agg(F.count("*").alias("edges"))
        .crossJoin(wedges.agg(F.count("*").alias("wedges")))
        .crossJoin(tri.agg(F.count("*").alias("triangles")))
    )


def pagerank_micro(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    n_iter: int = 10,
    damping_pct: int = 85,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """[EXT] PageRank over an undirected edge list (Brin & Page 1998;
    symmetrized power iteration, fixed ``n_iter`` rounds) in INTEGER
    micro-units: ranks start at 1,000,000 per node, each round a node
    sends ``rank div degree`` to every neighbor, and the damped update is
    ``(100-damping_pct)·10^4 + (damping_pct · inbound) div 100`` — all
    integer arithmetic, so results are bit-identical under any partition
    count or summation order (the unigram_logprob/exact-cents discipline
    applied to an iterative algorithm; float PageRank differs run-to-run
    at shuffle-reduce order). Rows-only by design (iterative, no SQL
    oracle per SURVEY §5.3); pinned against a pure-python mirror in tests.

    Scale: each round is one edge⋈rank join + one inbound aggregate, both
    shuffling on a vertex key over the candidate subgraph only; lineage
    truncated per round via localCheckpoint, or a durable
    ``checkpoint(checkpoint_dir)`` for executor-death tolerance on long
    runs (same dial as connected_components_star). Hub-degree skew is the
    known quadratic risk, mitigated upstream by the pair generators'
    block caps."""
    if checkpoint_dir is not None:
        pairs.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

    def _persist(df: DataFrame) -> DataFrame:
        return df.checkpoint() if checkpoint_dir is not None else df.localCheckpoint()

    u, v = F.col("u"), F.col("v")
    e = pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v")).filter(u != v).distinct()
    sym = _persist(e.union(e.select(v.alias("u"), u.alias("v"))))
    deg = sym.groupBy("u").agg(F.count("*").alias("deg"))
    base = (100 - damping_pct) * 10_000
    ranks = deg.select(F.col("u").alias("node"), F.lit(1_000_000).alias("r"))
    for _ in range(n_iter):
        contrib = (
            sym.join(ranks.withColumnRenamed("node", "u"), "u")
            .join(deg, "u")
            .select(v.alias("node"), F.expr("r div deg").alias("c"))
        )
        inbound = contrib.groupBy("node").agg(F.sum("c").alias("inc"))
        ranks = _persist(
            deg.select(F.col("u").alias("node"))
            .join(inbound, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(f"({damping_pct} * coalesce(inc, 0L)) div 100")
                ).cast("long").alias("r"),
            )
        )
    return ranks.select(F.col("node"), F.col("r").alias("rank_micro")).orderBy(
        F.desc("rank_micro"), "node"
    )
