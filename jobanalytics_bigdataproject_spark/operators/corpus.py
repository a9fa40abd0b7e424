"""[EXT] Corpus-level training-data operators over ``documents``: repetition
quality signals, segment-level corpus dedup, sequence packing, deterministic
mixture sampling, BM25 retrieval, and benchmark-contamination checks.

North-star LLM-pipeline surface (absent from the reference, which stops at
the T3 word count — code/02_RDDOperations.scala:221-264). Design rules this
module inherits from the rest of the engine:

- Everything is codegen'd built-ins; n-grams come from the proven
  ``posexplode`` + window-``lead`` pattern (operators/text.py
  ``fingerprint_docs``), never interpreted HOF lambdas.
- Shuffles carry hashes and counts, never document text: by the time a
  cross-document exchange happens the payload is a 16-byte md5 / a few
  int64s, so the shapes below survive a 100 TB corpus.
- Scores are exact integers (basis points / scaled ratios, see
  functions/exact.py rationale), so every query here is hash-checkable
  against the DuckDB oracle bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from jobanalytics_bigdataproject_spark.functions.textfns import tokenize
from jobanalytics_bigdataproject_spark.sources.readers import fan_out_scan

# ---------------------------------------------------------------------------
# Repetition / duplication quality signals (Gopher-style)
# ---------------------------------------------------------------------------


def repetition_stats(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document repetition signals used as LLM-corpus quality filters
    (the Gopher "repetitious text" family): duplicate-token fraction,
    most-frequent-bigram mass, duplicate-trigram fraction — all integer
    basis points (0..10000), exact across engines.

    Single-pass shape: one scan → window leads build bi/tri-grams in place
    → each position fans out to (kind, gram) rows via one explode → ONE
    count per (doc, kind, gram) → ONE conditional-aggregation groupBy(doc).
    Three exchanges total (window on doc_id, gram count, per-doc rollup);
    after the first partial agg only (hash, count) pairs move. Linear in
    corpus size, no joins.
    """
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    # NOT fan_out_scan-ed (r10): the doc window re-partitions right after
    # the explode — measured neutral (the shape fan-out does NOT help)
    ex = documents.select("doc_id", F.posexplode(toks).alias("pos", "tok"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    # window exprs must be materialized before they can feed the explode
    led = ex.select(
        "doc_id",
        "tok",
        F.lead("tok", 1).over(w).alias("l1"),
        F.lead("tok", 2).over(w).alias("l2"),
    )
    l1, l2 = F.col("l1"), F.col("l2")
    grams = (
        led.select(
            "doc_id",
            F.explode(
                F.array(
                    F.struct(F.lit("u").alias("kind"), F.col("tok").alias("gram")),
                    F.struct(
                        F.lit("b").alias("kind"),
                        F.when(l1.isNotNull(), F.concat_ws(" ", F.col("tok"), l1)).alias("gram"),
                    ),
                    F.struct(
                        F.lit("t").alias("kind"),
                        F.when(l2.isNotNull(), F.concat_ws(" ", F.col("tok"), l1, l2)).alias("gram"),
                    ),
                )
            ).alias("kg"),
        )
        .select("doc_id", F.col("kg.kind").alias("kind"), F.col("kg.gram").alias("gram"))
        .filter(F.col("gram").isNotNull())
    )
    counts = grams.groupBy("doc_id", "kind", "gram").agg(F.count("*").alias("c"))
    u, b, t = (F.col("kind") == k for k in ("u", "b", "t"))
    agg = counts.groupBy("doc_id").agg(
        F.sum(F.when(u, F.col("c"))).alias("n_tok"),
        F.count(F.when(u, F.lit(1))).alias("d_tok"),
        F.max(F.when(b, F.col("c"))).alias("top_big"),
        F.sum(F.when(b, F.col("c"))).alias("n_big"),
        F.count(F.when(t, F.lit(1))).alias("d_tri"),
        F.sum(F.when(t, F.col("c"))).alias("n_tri"),
    )
    return agg.select(
        "doc_id",
        F.col("n_tok").alias("n_tokens"),
        F.expr("(n_tok - d_tok) * 10000 div n_tok").alias("dup_token_bp"),
        F.coalesce(F.expr("top_big * 10000 div n_big"), F.lit(0).cast("long")).alias(
            "top_bigram_bp"
        ),
        F.coalesce(F.expr("(n_tri - d_tri) * 10000 div n_tri"), F.lit(0).cast("long")).alias(
            "dup_trigram_bp"
        ),
    )


# ---------------------------------------------------------------------------
# Segment-level corpus dedup (C4 / RefinedWeb-style span removal)
# ---------------------------------------------------------------------------


def segment_dedup(
    documents: DataFrame, text_col: str = "text", seg_len: int = 10
) -> DataFrame:
    """Corpus-level duplicate-SPAN removal accounting: chunk every document
    into fixed ``seg_len``-token segments, fingerprint each, keep exactly
    one occurrence of each fingerprint corpus-wide (first by ``(doc_id,
    seg_no)``), and report per document how many segments survive — the
    C4/RefinedWeb "remove repeated spans" primitive at the accounting
    level (the reassembled text itself is a trivial ``concat_ws`` away).

    Scale shape: window leads materialize each segment once on the
    already-doc-partitioned stream; the segment TEXT is hashed to 16-byte
    md5 before the only cross-document exchange (window over seg_hash), so
    the global dedup shuffle never carries text. Final per-doc rollup
    re-partitions on doc_id. Three exchanges, all linear."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    # NOT fan_out_scan-ed (r10): same window-follows-explode shape as
    # repetition_stats — measured neutral
    ex = documents.select("doc_id", F.posexplode(toks).alias("pos", "tok"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    leads = [F.lead("tok", i).over(w) for i in range(1, seg_len)]
    # concat_ws skips NULL leads, so the (possibly short) tail segment comes
    # out right without special-casing — DuckDB's clamped list_slice agrees.
    segs = (
        ex.select(
            "doc_id",
            "pos",
            F.when(
                F.col("pos") % seg_len == 0,
                F.md5(F.concat_ws(" ", F.col("tok"), *leads)),
            ).alias("seg_hash"),
        )
        .filter(F.col("seg_hash").isNotNull())
        .select("doc_id", (F.col("pos") / seg_len).cast("long").alias("seg_no"), "seg_hash")
    )
    w2 = Window.partitionBy("seg_hash").orderBy("doc_id", "seg_no")
    flagged = segs.withColumn("rn", F.row_number().over(w2))
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_segments"),
            F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).alias("n_kept_segments"),
        )
        .withColumn("n_removed_segments", F.col("n_segments") - F.col("n_kept_segments"))
    )


# ---------------------------------------------------------------------------
# Sequence packing (token-budget binning for training batches)
# ---------------------------------------------------------------------------


def pack_sequences(
    documents: DataFrame, text_col: str = "text", budget: int = 512
) -> DataFrame:
    """Assign documents to fixed token-budget training bins: within each
    ``source`` shard, documents are laid end-to-end in ``doc_id`` order and
    a document belongs to the bin where it STARTS (documents may straddle a
    boundary — the packer's reader handles the spill, as in standard
    concat-then-chunk LM data prep).

    One running-sum window per shard — partitioned by ``source``, never a
    global window, so a 100 TB corpus packs shard-parallel. (``doc_id``
    order stands in for the curriculum/shuffle order a real pipeline would
    have materialized as a column; any deterministic order works.)"""
    n_tok = F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast("long")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(n_tok).over(w)
    return documents.select(
        "doc_id",
        "source",
        n_tok.alias("n_tok"),
        (cum - n_tok).alias("start_tok"),
    ).select(
        "doc_id",
        "source",
        "n_tok",
        F.expr(f"start_tok div {int(budget)}").alias("bin_id"),
        (F.col("start_tok") % budget).alias("bin_offset"),
    )


# ---------------------------------------------------------------------------
# Deterministic mixture sampling (domain weighting without RNG)
# ---------------------------------------------------------------------------


def mixture_sample(
    documents: DataFrame,
    rates_bp: Mapping[str, int] | None = None,
    default_bp: int = 2500,
) -> DataFrame:
    """Domain-mixture downsampling with per-``source`` keep rates (basis
    points), implemented as a DETERMINISTIC hash filter instead of RNG:
    keep a row iff the first 4 hex chars of ``md5(doc_id || ':' || source)``
    fall below the rate's threshold. Same rows on every run, on any
    cluster, after any retry — the property Bernoulli ``sample()`` loses —
    and md5 exists in both engines, so unlike the seeded-RNG samplers
    (SURVEY.md §5.3) this one is fully oracle-checkable.

    Pure per-row predicate on the scan (no shuffle, no state); the
    comparison is on a fixed-width hex prefix, which is exact for rate
    granularity 1/65536. NULL ``source`` hashes as the empty string (both
    engines coalesce before concatenating — string-concat NULL semantics
    differ between Spark's concat_ws and ANSI ``||``) and draws the
    default rate."""
    rates = dict(rates_bp) if rates_bp is not None else {"src0": 10000, "src1": 5000}

    def thr_lit(bp: int):
        if bp >= 10000:
            return None  # keep everything
        return f"{(bp * 65536) // 10000:04x}"

    bucket = F.substring(
        F.md5(
            F.concat_ws(
                ":", F.col("doc_id").cast("string"), F.coalesce(F.col("source"), F.lit(""))
            )
        ),
        1,
        4,
    )
    # build as a when-chain on source (literal map, codegen'd)
    pred = None
    for src, bp in rates.items():
        t = thr_lit(bp)
        cond = F.lit(True) if t is None else bucket < F.lit(t)
        pred = F.when(F.col("source") == src, cond) if pred is None else pred.when(
            F.col("source") == src, cond
        )
    dt = thr_lit(default_bp)
    default_cond = F.lit(True) if dt is None else bucket < F.lit(dt)
    pred = default_cond if pred is None else pred.otherwise(default_cond)
    return documents.filter(pred).select("doc_id", "lang", "source", bucket.alias("bucket_hex"))


# ---------------------------------------------------------------------------
# BM25 retrieval (integer-exact scoring)
# ---------------------------------------------------------------------------


def bm25_search(
    documents: DataFrame,
    query_terms: Sequence[str] = ("spark", "filter", "window"),
    k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """Top-k document retrieval by BM25 (k1=1.2, b=0.75) kept FULLY
    INTEGER so ranking and scores are bit-identical across engines: with
    T = total corpus tokens and N = docs, the per-term score factors as

        idf_s  = ((2*(N-df)+1) * 1000)  div (2*df+1)          # (N-df+.5)/(df+.5)
        tf_s   = (22*tf*T * 10000) div (10*tf*T + 3*T + 9*dl*N)
                 # tf*(k1+1) / (tf + k1*(1-b) + k1*b*dl/avgdl), avgdl=T/N
        score  = sum over query terms of idf_s * tf_s

    (both denominators cleared of fractions by 10*T; see functions/
    exact.py for why integer div beats float ln/÷ for cross-engine
    determinism). The tf factor's product ``22*tf*T*10000`` exceeds int64
    once ``tf*T > ~4.2e13`` (e.g. tf≥420 against a 1e11-token corpus), so
    it is computed in decimal(38,0) on Spark / HUGEINT in the DuckDB
    oracle — exact to 38 digits, which covers tf·T up to ~1e33. The final
    ``idf_s * tf_s`` stays int64 (idf_s ≤ ~2e12 at 1e9 docs, tf_s ≤
    22000 ⇒ product ≤ ~4.4e16).

    Scale shape: the explode filters to QUERY TERMS before the (doc,term)
    count, so the shuffle is |matches|, not |corpus|; df aggregates the
    already-tiny tf frame; the corpus totals are a 1-row broadcast; top-k
    is TakeOrderedAndProject (never a global sort materialization)."""
    toks = tokenize(text_col)  # min_len=3, the tfidf/T3 tokenizer
    terms = [str(t) for t in query_terms]
    # fan_out_scan: both the term explode and the totals pass tokenize
    # every document — identity at real scale (guide §2.5)
    documents = fan_out_scan(documents)
    ex = (
        documents.select("doc_id", F.size(toks).cast("long").alias("dl"), F.explode(toks).alias("term"))
        .filter(F.col("term").isin(terms))
    )
    tf = ex.groupBy("doc_id", "term").agg(
        F.count("*").alias("tf"), F.max("dl").alias("dl")
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    totals = documents.select(F.size(toks).cast("long").alias("dl")).agg(
        F.sum("dl").alias("t_tok"), F.count("*").alias("n_docs")
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "term_score",
            F.expr(
                # tf factor in decimal(38,0): 22*tf*T*10000 wraps int64 once
                # tf*T > ~4.2e13 (Spark non-ANSI wraps SILENTLY) — IntegralDivide
                # on decimals returns bigint, so the outer product stays int64.
                "((2*(n_docs - df) + 1) * 1000 div (2*df + 1))"
                " * ((CAST(22 AS DECIMAL(38,0))*tf*t_tok*10000)"
                "    div (CAST(10 AS DECIMAL(38,0))*tf*t_tok + 3*t_tok + 9*dl*n_docs))"
            ),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.sum("term_score").alias("score"))
        .orderBy(F.desc("score"), "doc_id")
        .limit(int(k))
    )


# ---------------------------------------------------------------------------
# Full corpus-prep pipeline (the composed flagship)
# ---------------------------------------------------------------------------


def full_prep_pipeline(
    documents: DataFrame,
    text_col: str = "text",
    min_quality: float = 0.35,
    langs=("en",),
    max_dup_token_bp: int = 6000,
    bench_max_id: int = 20,
    ngram: int = 8,
) -> DataFrame:
    """The complete Dolma/RefinedWeb-style training-corpus prep as ONE
    declarative plan: quality score + language ID (per-row codegen) →
    repetition filter (Gopher dup-token signal) → benchmark
    DECONTAMINATION (drop docs sharing any ``ngram``-token span with the
    eval set) → exact dedup keep-first. Output is the surviving corpus
    with its quality metadata.

    Shape at scale (one DAG, shared scan branches): quality, language AND
    the dup-token repetition signal are all per-row codegen riding the
    scan (repetition's unigram form is array-native — no explode, no
    shuffle, no join; the standalone repetition_stats earns its explode
    only for bi/tri-gram ranking); contamination hashes spans to md5 and
    BROADCASTS the eval side, flagging via a probe-side join (the corpus
    never shuffles for it); the dedup window runs LAST, on fingerprints
    of the rows that survived every filter — the same
    filter-before-shuffle ordering argument as
    text.prepare_training_corpus, now with three filters in front."""
    from jobanalytics_bigdataproject_spark.functions.textfns import fingerprint
    from jobanalytics_bigdataproject_spark.operators.text import (
        LANG_MARKERS,
        DEFAULT_STOPWORDS,
        _lang_pred,
        _quality_bp,
    )

    txt = F.col(text_col)
    *_, quality_bp = _quality_bp(txt, DEFAULT_STOPWORDS)
    # fan_out_scan: the per-row quality/lang/dup expressions and the 8-gram
    # explode below re-tokenize every document — identity at real scale
    documents = fan_out_scan(documents)
    # the Gopher dup-token signal needs only unigram multiplicity, which is
    # ARRAY-NATIVE (size/array_distinct, no lambda) — so unlike the
    # standalone repetition_stats (which also ranks bi/tri-grams and earns
    # its explode), the pipeline computes it per-row on the scan: the
    # repetition filter costs zero shuffles and zero joins here.
    dup_bp = F.expr(
        f"(size(split(lower(trim({text_col})), '\\\\s+'))"
        f" - size(array_distinct(split(lower(trim({text_col})), '\\\\s+'))))"
        f" * 10000 div size(split(lower(trim({text_col})), '\\\\s+'))"
    )
    scored = documents.select(
        "doc_id",
        "lang",
        (quality_bp / F.lit(10000.0)).alias("quality_score"),
        _lang_pred(F.lower(F.trim(txt)), LANG_MARKERS).alias("predicted_lang"),
        dup_bp.alias("dup_token_bp"),
        fingerprint(text_col).alias("__fp"),
    )

    # contamination 8-grams on the NORMALIZED tokenization (strip [^a-z],
    # drop empty tokens) — the same tokenize(min_len=1) used by the
    # standalone benchmark_contamination, so the flagged set is identical
    # whether decontamination runs standalone or inside the pipeline.
    # (Raw whitespace tokens would shift gram positions the moment a span
    # carries punctuation/digits; see tests/test_corpus.py punctuation
    # fixture.)
    ex = documents.select(
        "doc_id", F.posexplode(tokenize(text_col, min_len=1)).alias("pos", "tok")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    leads = [F.lead("tok", i).over(w) for i in range(1, ngram)]
    grams = ex.select(
        "doc_id",
        F.when(leads[-1].isNotNull(), F.md5(F.concat_ws(" ", F.col("tok"), *leads))).alias("h"),
    ).filter(F.col("h").isNotNull())
    bench = grams.filter(F.col("doc_id") < bench_max_id).select("h").distinct()
    dirty = (
        grams.filter(F.col("doc_id") >= bench_max_id)
        .join(F.broadcast(bench), "h")
        .select("doc_id")
        .distinct()
    )

    kept = (
        scored.filter(F.col("doc_id") >= bench_max_id)
        .filter(
            (F.col("quality_score") >= F.lit(float(min_quality)))
            & F.col("predicted_lang").isin(*[str(x) for x in langs])
            & (F.col("dup_token_bp") <= max_dup_token_bp)
        )
        .join(dirty, "doc_id", "left_anti")
    )
    w2 = Window.partitionBy("__fp").orderBy("doc_id")
    return (
        kept.withColumn("__rn", F.row_number().over(w2))
        .filter(F.col("__rn") == 1)
        .select("doc_id", "lang", "predicted_lang", "quality_score", "dup_token_bp")
    )


# ---------------------------------------------------------------------------
# Benchmark contamination (n-gram overlap against an eval set)
# ---------------------------------------------------------------------------


def benchmark_contamination(
    documents: DataFrame,
    bench_max_id: int = 20,
    ngram: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """Train/eval contamination check: flag corpus documents sharing any
    ``ngram``-token span with the benchmark set (here: ``doc_id <
    bench_max_id`` stands in for the eval suite; in production it's a
    separate table with the same schema). The standard n-gram-overlap
    decontamination pass (GPT-3 appendix / Dolma style).

    Scale shape: both sides shingle via window leads and hash spans to md5
    BEFORE any join; the benchmark side is distinct-reduced and BROADCAST
    (eval suites are tiny vs a 100 TB corpus), so the corpus is never
    shuffled — probe-side only, then one per-doc count. Corpus docs with
    no match keep a 0 row via the final left join (pruned columns only)."""
    toks = tokenize(text_col, min_len=1)
    # NOT fan_out_scan-ed (r10): the gram window already re-partitions by
    # doc_id right after the explode; measured, fanning the scan added
    # ~0.4 s here instead of saving
    ex = documents.select("doc_id", F.posexplode(toks).alias("pos", "tok"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    leads = [F.lead("tok", i).over(w) for i in range(1, ngram)]
    grams = ex.select(
        "doc_id",
        F.when(
            leads[-1].isNotNull(), F.md5(F.concat_ws(" ", F.col("tok"), *leads))
        ).alias("h"),
    ).filter(F.col("h").isNotNull())
    bench = (
        grams.filter(F.col("doc_id") < bench_max_id).select("h").distinct()
    )
    corpus = (
        grams.filter(F.col("doc_id") >= bench_max_id)
        .select("doc_id", "h")
        .distinct()
    )
    hits = (
        corpus.join(F.broadcast(bench), "h")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared_ngrams"))
    )
    base = documents.filter(F.col("doc_id") >= bench_max_id).select("doc_id")
    return base.join(hits, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_shared_ngrams", F.lit(0).cast("long")).alias("n_shared_ngrams"),
        (F.coalesce("n_shared_ngrams", F.lit(0).cast("long")) > 0).alias("is_contaminated"),
    )


# ---------------------------------------------------------------------------
# Deterministic splits / per-source capping / bigram novelty
# ---------------------------------------------------------------------------


def hash_split(
    documents: DataFrame,
    train_bp: int = 8000,
    val_bp: int = 1000,
    salt: str = "split:v1",
) -> DataFrame:
    """Deterministic train/val/test assignment by hash, the standard way a
    training pipeline splits a corpus so that (a) membership never changes
    across runs/clusters/retries and (b) adding documents never moves an
    existing one between splits — both properties ``randomSplit`` lacks.

    Bucket = first 4 hex chars of ``md5(doc_id || ':' || salt)`` compared
    against hex thresholds (granularity 1/65536, same device as
    ``mixture_sample``). Pure per-row projection on the scan — no shuffle,
    no state, trivially linear at 100 TB — then one per-(split, source)
    rollup for the audit report this query returns.
    """
    t_train = f"{(train_bp * 65536) // 10000:04x}"
    t_val = f"{((train_bp + val_bp) * 65536) // 10000:04x}"
    bucket = F.substring(
        F.md5(F.concat_ws(":", F.col("doc_id").cast("string"), F.lit(salt))), 1, 4
    )
    split = (
        F.when(bucket < t_train, "train").when(bucket < t_val, "val").otherwise("test")
    )
    return (
        documents.select(split.alias("split"), "source", "n_chars")
        .groupBy("split", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("n_chars").cast("long")).alias("sum_chars"),
        )
        .orderBy("split", "source")
    )


def cap_per_source(
    documents: DataFrame, max_per_source: int = 120, salt: str = "cap:v1"
) -> DataFrame:
    """Per-domain frequency cap (the RefinedWeb/CCNet "no domain dominates"
    rule): downsample each ``source`` to ≈``max_per_source`` documents,
    deterministically.

    NOT implemented as ``row_number() OVER (PARTITION BY source)`` ≤ N —
    that sorts every document of the hottest domain through one partition,
    which is exactly the skew that kills a 100 TB run. Instead: count per
    source (tiny agg, broadcast back), then keep a row iff

        bucket_int * src_count < max_per_source * 65536

    where bucket_int is the first-4-hex md5 bucket. Each row's verdict
    depends only on its own hash and its source's total, so the filter is
    a per-row predicate after a broadcast join — no per-source sort, no
    skewed window, and the kept set is stable under reruns (keeps ~N, the
    deterministic-expectation cap; exact-N needs the sort and is rarely
    what a corpus pipeline wants). Sources at/below the cap keep all rows.
    """
    counts = documents.groupBy("source").agg(F.count("*").alias("src_count"))
    bucket_int = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.col("doc_id").cast("string"), F.lit(salt))), 1, 4
        ),
        16,
        10,
    ).cast("long")
    return (
        documents.join(F.broadcast(counts), "source")
        .filter(bucket_int * F.col("src_count") < F.lit(int(max_per_source) * 65536))
        .select("doc_id", "source", "lang", "n_chars")
    )


def bigram_novelty(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document novelty score from corpus-global bigram statistics: the
    integer-basis-point fraction of a document's bigrams that are singletons
    (appear nowhere else in the corpus). A cheap, fully-distributed stand-in
    for LM-perplexity quality filtering — boilerplate/templated docs score
    near 0, unique prose scores high — without shipping a model.

    Shape: one scan → window ``lead`` builds bigrams in place (the proven
    fingerprint_docs pattern, no HOF lambdas) → md5 the bigram so the
    corpus-global exchange carries 16-byte hashes, never text → global
    per-bigram count via a second window (``COUNT(*) OVER (PARTITION BY
    h)`` — same exchange a groupBy would take, but keeps the row context so
    no join-back is needed) → per-doc conditional rollup. Three exchanges,
    all linear in token count; integer bp via ``div`` so the score is
    hash-exact against the oracle.
    """
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    # NOT fan_out_scan-ed (r10): the doc window re-partitions right after
    # the explode — measured neutral
    ex = documents.select("doc_id", F.posexplode(toks).alias("pos", "tok"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    grams = (
        ex.select(
            "doc_id",
            F.when(
                F.lead("tok", 1).over(w).isNotNull(),
                F.md5(F.concat_ws(" ", F.col("tok"), F.lead("tok", 1).over(w))),
            ).alias("h"),
        )
        .filter(F.col("h").isNotNull())
    )
    wg = Window.partitionBy("h")
    counted = grams.select("doc_id", F.count("*").over(wg).alias("global_c"))
    return (
        counted.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.sum((F.col("global_c") == 1).cast("long")).alias("n_singletons"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "n_singletons",
            F.expr("10000 * n_singletons div n_bigrams").alias("novelty_bp"),
        )
    )


def unigram_logprob(
    documents: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """[EXT] Corpus-unigram language-model scoring: each document's average
    per-token natural-log probability under the corpus's own unigram
    distribution — the CCNet-style fluency/quality signal (out-of-
    distribution and boilerplate-heavy docs score low, typical prose high).

    Determinism: a float sum of per-token ln(p) is summation-order-
    dependent, so each token's ln(cnt/total) is quantized ONCE to integer
    micro-nats (``ROUND(ln·10⁶)`` — the input double is identical on both
    engines, so the quantization is too), then summed in int64 and divided
    by the token count via ``exact_div``. Overflow headroom: |ln p| < 40
    ⇒ 4·10⁷ micro-nats/token ⇒ safe past 10¹¹ tokens per document.

    Scale shape: two shuffles — the vocab count (map-side combined; the
    token join is a shuffle join because a 100 TB corpus's vocabulary is
    NOT broadcastable) and the per-doc rollup; the corpus total is one
    broadcast scalar. No all-pairs, no driver-side vocabulary.
    """
    from jobanalytics_bigdataproject_spark.functions.exact import exact_div

    # NOT fan_out_scan-ed (r10): the vocab count re-partitions right
    # after the explode and the toks subtree has two consumers — measured
    # neutral, and the fan-out broke the operator's 4-exchange budget gate
    toks = documents.select(
        F.col(id_col), F.explode(tokenize(text_col, min_len=1)).alias("tok")
    )
    vocab = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("total"))
    lp_micro = F.round(F.log(F.col("cnt") / F.col("total")) * 1e6).cast("long")
    return (
        toks.join(vocab, "tok")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(lp_micro).alias("sum_lp_micro"),
        )
        .select(
            id_col,
            "n_tokens",
            exact_div(F.col("sum_lp_micro"), F.col("n_tokens"), 2).alias(
                "avg_lp_micro"
            ),
        )
        # no presentation sort: D-sized output, order-insensitive compare
    )


def bigram_logprob(
    documents: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """[EXT] Corpus-bigram conditional-LM scoring with add-one (Laplace)
    smoothing: each document's average per-bigram natural-log probability
    ``ln p(w_i | w_{i-1}) = ln((c(w_{i-1} w_i)+1) / (c(w_{i-1}·)+V))``
    under the corpus's own bigram statistics — the next step up from
    ``unigram_logprob``'s bag-of-words fluency signal (catches shuffled /
    boilerplate-spliced text that unigram stats score as fluent).

    Bigrams are built ARRAY-NATIVELY — ``zip_with`` over two shifted
    ``slice``s of the token array, then one explode — so there is NO
    per-document window (the unigram query's explode pattern would need a
    doc-ordered window to pair neighbours; this needs zero extra
    shuffles). Vocabulary ``V`` is the distinct-token count derived from
    the bigram-count table (vocab-sized, never a second corpus scan);
    docs with <2 tokens have no bigrams and drop out, and a token
    occurring only in such docs is by the same rule outside ``V`` —
    documented definition, mirrored exactly in the oracle.

    Determinism: like ``unigram_logprob``, each bigram's ln p is
    quantized ONCE to integer micro-nats (the (c_big+1)/(c_ctx+V) double
    is bit-identical on both engines: int64-derived operands, one IEEE
    division, one ln), summed in int64, and divided by the bigram count
    via ``exact_div`` — summation-order-independent, hence oracle
    hash-checkable.

    Scale shape: two corpus scans (count-build and probe) and two
    corpus-sized shuffles — the bigram count (map-side combined) and the
    per-doc rollup — plus one shuffle JOIN of the bigram stream against
    the (bigram-vocab-sized) count table; a 100 TB corpus's bigram
    vocabulary is NOT broadcastable, so the join keys on (ctx, nxt). The
    count table feeds THREE consumers (ctx totals, V, the LM join), so
    it is eagerly ``localCheckpoint``-ed: without that, Spark re-derives
    the whole corpus-scan→explode→aggregate subtree per consumer —
    measured 5 corpus scans, and runtime AQE exchange reuse does NOT
    collapse them (the subtrees canonicalize differently). The
    checkpoint is vocab-sized, the same lineage-truncation device as
    dedup.py's connected components (same executor-loss caveat; swap for
    ``checkpoint(dir)`` on long-lived clusters). No all-pairs, no
    driver-side vocabulary.
    """
    from jobanalytics_bigdataproject_spark.functions.exact import exact_div

    # NOT fan_out_scan-ed (r10): measured neutral (1.75 -> 1.72 s) — the
    # localCheckpoint'd vocab already bounds recomputation
    arrs = documents.select(
        F.col(id_col), tokenize(text_col, min_len=1).alias("arr")
    ).filter(F.size("arr") >= 2)
    n = F.size("arr")
    bigrams = arrs.select(
        id_col,
        F.explode(
            F.zip_with(
                F.slice("arr", 1, n - 1),
                F.slice("arr", 2, n - 1),
                lambda a, b: F.struct(a.alias("ctx"), b.alias("nxt")),
            )
        ).alias("p"),
    ).select(id_col, "p.ctx", "p.nxt")

    big_counts = (
        bigrams.groupBy("ctx", "nxt")
        .agg(F.count("*").alias("c_big"))
        .localCheckpoint()  # vocab-sized; see docstring
    )
    ctx_counts = big_counts.groupBy("ctx").agg(F.sum("c_big").alias("c_ctx"))
    vocab_size = (
        big_counts.select(F.col("ctx").alias("tok"))
        .union(big_counts.select(F.col("nxt").alias("tok")))
        .agg(F.count_distinct("tok").alias("vsz"))
    )
    lm = (
        big_counts.join(ctx_counts, "ctx")
        .crossJoin(F.broadcast(vocab_size))
        .select(
            "ctx",
            "nxt",
            F.round(
                F.log((F.col("c_big") + F.lit(1.0)) / (F.col("c_ctx") + F.col("vsz")))
                * 1e6
            )
            .cast("long")
            .alias("lp_micro"),
        )
    )
    return (
        bigrams.join(lm, ["ctx", "nxt"])
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum("lp_micro").alias("sum_lp_micro"),
        )
        .select(
            id_col,
            "n_bigrams",
            exact_div(F.col("sum_lp_micro"), F.col("n_bigrams"), 2).alias(
                "avg_lp_micro"
            ),
        )
        # no presentation sort: D-sized output, order-insensitive compare
    )


def temperature_mix(
    documents: DataFrame,
    temperature: float = 0.7,
    target_frac: float = 0.5,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """[EXT] Temperature-scaled source mixing — the standard multi-source
    training-mix knob: resample so the kept corpus's source composition
    follows ``share^(1/T)`` (T<1 upweights rare sources, T=1 preserves
    shares, T→∞ tends uniform), at overall keep fraction ``target_frac``.

    Rates are DERIVED FROM THE DATA (per-source counts → normalized
    temperature weights → per-source keep rate ``f·q_s/share_s``, clamped
    at 1 without re-normalization — an undersized rare source simply keeps
    everything; documented, matches common practice), then applied with
    the same deterministic md5-bucket filter as ``mixture_sample`` — same
    rows on every run, any cluster, any retry, and oracle-checkable.
    The bucket-vs-rate comparison is hex-string-exact: the threshold is
    rendered to the same 4-hex-char space as the bucket (``rate_bp·65536
    div 10000``, integer math), so no float sits in the keep predicate.

    Scale shape: the rate table is |sources| rows (two tiny aggs +
    broadcast back); the fact scan is touched once with a per-row
    predicate. One small shuffle, no state.
    """
    src = F.coalesce(F.col(source_col), F.lit(""))
    counts = documents.groupBy(src.alias("__src")).agg(F.count("*").alias("n_s"))
    tot = counts.agg(F.sum("n_s").alias("n_tot"))
    weights = counts.crossJoin(F.broadcast(tot)).withColumn(
        "__w", F.pow(F.col("n_s") * 1.0 / F.col("n_tot"), F.lit(1.0 / temperature))
    )
    wsum = weights.agg(F.sum("__w").alias("w_tot"))
    rates = (
        weights.crossJoin(F.broadcast(wsum))
        .withColumn(
            "rate_bp",
            F.least(
                F.lit(10000).cast("long"),
                F.round(
                    F.lit(10000.0 * target_frac)
                    * (F.col("__w") / F.col("w_tot"))
                    * F.col("n_tot")
                    / F.col("n_s")
                ).cast("long"),
            ),
        )
        .select("__src", "rate_bp")
    )
    bucket = F.substring(
        F.md5(F.concat_ws(":", F.col(id_col).cast("string"), src)), 1, 4
    )
    thr = F.lower(F.lpad(F.hex(F.expr("rate_bp * 65536 div 10000")), 4, "0"))
    return (
        documents.join(F.broadcast(rates), src == F.col("__src"))
        .filter((F.col("rate_bp") >= 10000) | (bucket < thr))
        .select(id_col, "lang", source_col, "rate_bp")
        # no presentation sort: D-sized output, order-insensitive compare
    )


def chunk_documents(
    documents: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    text_col: str = "text",
) -> DataFrame:
    """[EXT] RAG-style chunking: overlapping fixed-token windows over the
    raw whitespace tokens (original case/punctuation preserved — chunks
    feed an embedder, not the quality filters, so no normalization).

    Chunk count per doc is ``max(1, ceil((n−overlap)/step))`` with
    ``step = chunk_tokens − overlap`` — the standard rule that never emits
    a trailing chunk fully contained in its predecessor; all arithmetic is
    non-negative integer division so Spark ``div`` and DuckDB ``//``
    agree.

    Scale: one scan — split/sequence/slice/array_join are all codegen'd
    built-ins; the explode fans ~n/step rows per doc but carries only the
    token array pointer per row, and there is no shuffle at all (chunk ids
    derive from the parent row).  Output order is presentation-only."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    step = chunk_tokens - overlap
    toks = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda w: w != F.lit("")
    )
    # NOT fanned out (unlike the explode-heavy siblings): the zero-shuffle
    # property is this operator's contract (plan-gated in test_corpus.py)
    # and the per-row slice/array_join work is light
    d = (
        documents.select("doc_id", toks.alias("toks"))
        .withColumn("n_tokens", F.size("toks"))
        .filter(F.col("n_tokens") > 0)
    )
    n_chunks = F.expr(
        f"greatest(1, (greatest(n_tokens - {overlap}, 0) + {step - 1}) div {step})"
    )
    sl = F.slice(
        F.col("toks"), F.col("chunk_idx") * step + 1, chunk_tokens
    )
    return (
        d.withColumn("chunk_idx", F.explode(F.sequence(F.lit(0), n_chunks - 1)))
        .select(
            "doc_id",
            "chunk_idx",
            F.size(sl).alias("n_chunk_tokens"),
            F.array_join(sl, " ").alias("chunk_text"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


def curriculum_shards(
    documents: DataFrame,
    n_shards: int = 4,
    text_col: str = "text",
) -> DataFrame:
    """[EXT] Curriculum sharding: split the corpus into quality tiers a
    trainer can schedule easy->hard, reporting per-shard volume stats.
    Shard cutoffs are exact quality-score percentiles (value-based tiers:
    ties land in one shard, deterministic on any engine/partitioning —
    unlike a global ``ntile``, which is both rank-arbitrary under ties and
    a single-partition window at scale, the anti-pattern RFM avoids).

    Scores are the integer-basis-point quality_bp from ``text._quality_bp``
    (doubled to a ``*_bp2`` bigint so the half-point values stay integer);
    shard k = #cutoffs strictly below the doc's score.

    Scale: one scan computes scores; the (n_shards-1)-value cutoff row is
    a global aggregate broadcast back (exact ``F.percentile`` for oracle
    parity here — at 100 TB swap in percentile_approx, the documented GK
    path whose error is measured by percentile_accuracy_report); the final
    per-shard aggregate is map-side combined into n_shards rows."""
    from jobanalytics_bigdataproject_spark.operators.text import (
        DEFAULT_STOPWORDS,
        _quality_bp,
    )

    txt = F.col(text_col)
    *_, quality_bp = _quality_bp(txt, DEFAULT_STOPWORDS)
    n_tokens = F.size(F.split(F.lower(F.trim(txt)), r"\s+"))
    # fan_out_scan: the per-row quality expressions re-tokenize every
    # document — identity at real scale (guide §2.5)
    documents = fan_out_scan(documents)
    scored = documents.select(
        "doc_id",
        (quality_bp * 2).cast("long").alias("q_bp2"),
        n_tokens.alias("n_toks"),
    )
    probs = [i / n_shards for i in range(1, n_shards)]
    cutoffs = scored.agg(
        *[
            F.percentile("q_bp2", F.lit(p)).alias(f"c{i}")
            for i, p in enumerate(probs)
        ]
    )
    shard = sum(
        (F.col("q_bp2") > F.col(f"c{i}")).cast("int") for i in range(len(probs))
    )
    return (
        scored.crossJoin(F.broadcast(cutoffs))
        .withColumn("shard", shard)
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_toks").alias("tok_total"),
            F.min("q_bp2").alias("q_min_bp2"),
            F.max("q_bp2").alias("q_max_bp2"),
            F.sum("q_bp2").alias("q_sum_bp2"),
        )
        .orderBy("shard")
    )


def fuzzy_contamination(
    documents: DataFrame,
    bench_max_id: int = 20,
    jaccard_threshold: float = 0.5,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """[EXT] NEAR-duplicate train/eval contamination: the exact 8-gram pass
    (``benchmark_contamination``) misses paraphrased or lightly-edited
    leaks; this one flags corpus documents whose n-gram Jaccard against
    ANY benchmark document clears ``jaccard_threshold``, via the same
    MinHash-band machinery as dedup but probed CROSS-set.  As in the exact
    pass, ``doc_id < bench_max_id`` stands in for the eval suite.

    Stages: band buckets for both sides (``dedup.band_buckets``, one
    shingle pass each); corpus buckets probe the benchmark's buckets with
    a BROADCAST join (eval suites are tiny vs a 100 TB corpus — the
    corpus is never shuffled for the probe); candidate (corpus, bench)
    pairs verify with exact ``ngram_jaccard_pairs``; per corpus doc keep
    the max Jaccard + matched bench doc (min id on ties).  Corpus docs
    with no candidate keep a 0 row via the final left join.

    Rows-only check (xxhash64 banding has no DuckDB analog); the pytest
    pins recall against brute-force cross-pair Jaccard on planted
    paraphrases and exactness of every reported score."""
    from jobanalytics_bigdataproject_spark.operators.dedup import (
        band_buckets,
        ngram_jaccard_pairs,
    )

    is_bench = F.col("doc_id") < bench_max_id
    buckets = band_buckets(documents, text_col, num_hashes, bands, shingle_n)
    bench_b = buckets.filter(is_bench).select(
        F.col("doc_id").alias("bench_id"), "band_idx", "band_hash"
    ).distinct()
    corp_b = buckets.filter(~is_bench)
    cands = (
        corp_b.join(F.broadcast(bench_b), ["band_idx", "band_hash"])
        .select(F.col("bench_id").alias("doc_id_a"), F.col("doc_id").alias("doc_id_b"))
        .distinct()
    )
    verified = ngram_jaccard_pairs(
        documents, cands, text_col, shingle_n, threshold=jaccard_threshold
    )
    # deterministic matched-bench pick: max jaccard, then min bench id
    # (argmax via MIN(struct(-jaccard, bench_id)) — tiebreak inside the
    # aggregate, map-side partials, no window shuffle of verified pairs)
    best = (
        verified.groupBy("doc_id_b")
        .agg(
            F.max("jaccard").alias("max_jaccard"),
            F.min(
                F.struct((-F.col("jaccard")).alias("nj"), F.col("doc_id_a").alias("bid"))
            ).alias("pick"),
        )
        .select(
            F.col("doc_id_b").alias("doc_id"),
            "max_jaccard",
            F.col("pick.bid").alias("matched_bench_id"),
        )
    )
    base = documents.filter(~is_bench).select("doc_id")
    return base.join(best, "doc_id", "left").select(
        "doc_id",
        F.coalesce("max_jaccard", F.lit(0.0)).alias("max_jaccard"),
        "matched_bench_id",
        F.col("max_jaccard").isNotNull().alias("is_contaminated"),
    ).orderBy("doc_id")
