"""[EXT] Text-analysis operators over the ``documents`` table: language ID,
quality scoring, token counting, fingerprinting (north-star LLM-pipeline
surface; absent from the reference, which only does the T3 word count —
code/02_RDDOperations.scala:221-264).

Design: everything is codegen'd built-ins over one scan — each operator
appends columns without a shuffle, so a 100 TB corpus is one linear pass.
All outputs are deterministic and (except xxhash64-based ones) expressible
in DuckDB SQL for the oracle.
"""

from __future__ import annotations

import re
from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from jobanalytics_bigdataproject_spark.functions.textfns import fingerprint, tokenize

# Tiny per-language marker lexicons for the heuristic language scorer.
# Deliberately SQL-expressible (the oracle repeats the same CASE logic).
LANG_MARKERS: Mapping[str, tuple[str, ...]] = {
    "en": ("the", "and", "with", "from"),
    "es": ("el", "la", "de", "que"),
    "de": ("der", "die", "und", "nicht"),
    "fr": ("le", "la", "et", "que"),
    "zh": ("de", "le", "shi", "bu"),
}

DEFAULT_STOPWORDS: tuple[str, ...] = (
    "the", "and", "for", "with", "from", "this", "that", "are", "was",
)


def token_stats(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish regex token count
    (runs of letters / digits / single punctuation, the common pre-tokenizer
    shape) + char length. One projection, no shuffle."""
    txt = F.col(text_col)
    ws_tokens = F.split(F.trim(txt), r"\s+")
    bpe_ish = F.regexp_count(txt, F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"))
    return documents.select(
        "doc_id",
        F.size(ws_tokens).alias("ws_token_count"),
        bpe_ish.alias("regex_token_count"),
        F.length(txt).alias("char_count"),
    )


def _quality_bp(
    txt: Column, stopwords: Sequence[str]
) -> tuple[Column, Column, Column, Column]:
    """(len_bp, stop_bp, punct_bp, quality_bp) integer-basis-point columns —
    shared by ``quality_score`` and ``prepare_training_corpus`` so the
    composed pipeline can never drift from the standalone op.

    All scores in integer basis points (0..10000) so every intermediate is
    an exact integer and the single final division is bit-identical across
    engines (functions/exact.py rationale) — no float ROUND anywhere."""
    n_chars = F.length(txt)
    norm = F.lower(F.trim(txt))
    n_tokens = F.size(F.split(norm, r"\s+"))
    n_stop = _word_hits(norm, stopwords)
    n_punct = F.regexp_count(txt, F.lit(r"[^a-zA-Z0-9\s]"))
    len_bp = F.least(F.lit(20) * n_chars, F.lit(10000))
    stop_bp = F.coalesce(
        F.round(F.lit(10000.0) * n_stop / F.nullif(n_tokens, F.lit(0))), F.lit(0.0)
    ).cast("long")
    punct_bp = F.coalesce(
        F.round(F.lit(10000.0) * n_punct / F.nullif(n_chars, F.lit(0))), F.lit(0.0)
    ).cast("long")
    quality_bp = (
        (len_bp + F.least(F.lit(5) * stop_bp, F.lit(10000))) / F.lit(2.0)
        - F.least(punct_bp, F.lit(5000))
    )
    return len_bp, stop_bp, punct_bp, quality_bp


def quality_score(
    documents: DataFrame,
    text_col: str = "text",
    stopwords: Sequence[str] = DEFAULT_STOPWORDS,
) -> DataFrame:
    """Quality scoring: length score, punctuation ratio, stopword ratio and
    a blended 0..1 quality score. Pure per-row arithmetic (linear scan)."""
    len_bp, stop_bp, punct_bp, quality_bp = _quality_bp(F.col(text_col), stopwords)
    return documents.select(
        "doc_id",
        (len_bp / F.lit(10000.0)).alias("len_score"),
        (stop_bp / F.lit(10000.0)).alias("stopword_ratio"),
        (punct_bp / F.lit(10000.0)).alias("punct_ratio"),
        (quality_bp / F.lit(10000.0)).alias("quality_score"),
    )


def _word_hits(norm_text: Column, words: Sequence[str]) -> Column:
    """Count tokens — maximal non-whitespace runs of *norm_text* — that
    exactly equal any of *words*, with multiplicity.

    Semantics identical to ``size(filter(split(text,'\\s+'), t ->
    t.isin(words)))``, but as a single codegen'd ``regexp_count``: HOF
    lambdas run interpreted per element (~10× slower, measured — see
    dedup.py's minhash rewrite and VERDICT r1 #3). The leading separator
    is consumed, the trailing one is a lookahead, so adjacent tokens
    ("the the") each match without overlap. Word-boundary ``\\b`` would be
    wrong here: tokens are whitespace-delimited, so "the," must NOT count.
    """
    alt = "|".join(re.escape(w) for w in words)
    return F.regexp_count(norm_text, F.lit(rf"(?:^|\s)(?:{alt})(?=\s|$)"))


def language_id(
    documents: DataFrame,
    text_col: str = "text",
    markers: Mapping[str, Sequence[str]] = LANG_MARKERS,
) -> DataFrame:
    """Heuristic language ID: score = marker-lexicon hits per language,
    argmax wins (ties broken by language code order). An n-gram/lexicon
    heuristic in the fastText spirit, kept SQL-expressible on purpose so the
    oracle can replay it. Linear scan, no shuffle."""
    norm = F.lower(F.trim(F.col(text_col)))
    scores = [
        _word_hits(norm, tuple(ms)).alias(f"score_{lang}")
        for lang, ms in markers.items()
    ]
    scored = documents.select("doc_id", "lang", *scores)
    langs = list(markers)
    best = F.greatest(*[F.col(f"score_{lg}") for lg in langs])
    pred = F.lit(None).cast("string")
    # argmax with first-wins tie break, in declared language order
    for lg in reversed(langs):
        pred = F.when(F.col(f"score_{lg}") == best, F.lit(lg)).otherwise(pred)
    pred = F.when(best > 0, pred).otherwise(F.lit("und"))
    return scored.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        pred.alias("predicted_lang"),
        best.alias("best_score"),
    )


def _lang_pred(norm: Column, markers: Mapping[str, Sequence[str]]) -> Column:
    """Argmax language prediction column (same first-wins tie break as
    ``language_id``) over an already-normalized text column — shared with
    ``prepare_training_corpus``."""
    scores = {lg: _word_hits(norm, tuple(ms)) for lg, ms in markers.items()}
    best = F.greatest(*scores.values())
    pred = F.lit(None).cast("string")
    for lg in reversed(list(markers)):
        pred = F.when(scores[lg] == best, F.lit(lg)).otherwise(pred)
    return F.when(best > 0, pred).otherwise(F.lit("und"))


def prepare_training_corpus(
    documents: DataFrame,
    text_col: str = "text",
    min_quality: float = 0.35,
    langs: Sequence[str] = ("en",),
    stopwords: Sequence[str] = DEFAULT_STOPWORDS,
    markers: Mapping[str, Sequence[str]] = LANG_MARKERS,
) -> DataFrame:
    """The composed training-data prep pipeline — quality filter →
    language filter → exact dedup — as ONE declarative plan: a single
    document scan computes quality and predicted language per row (pure
    codegen expressions), the filters prune before any shuffle, and exact
    dedup is one window exchange on the 16-byte fingerprint of the
    SURVIVING rows only (keep min doc_id per fingerprint). At 100 TB the
    filter typically removes a large corpus fraction before the only
    shuffle — order matters, and this is the right order."""
    from pyspark.sql import Window

    txt = F.col(text_col)
    *_, quality_bp = _quality_bp(txt, stopwords)
    scored = documents.select(
        "doc_id",
        "lang",
        (quality_bp / F.lit(10000.0)).alias("quality_score"),
        _lang_pred(F.lower(F.trim(txt)), markers).alias("predicted_lang"),
        fingerprint(text_col).alias("__fp"),
    )
    kept = scored.filter(
        (F.col("quality_score") >= F.lit(float(min_quality)))
        & F.col("predicted_lang").isin(*[str(x) for x in langs])
    )
    w = Window.partitionBy("__fp").orderBy("doc_id")
    # no final orderBy: this is pipeline output feeding further stages, and
    # a presentation sort would add a second (range) exchange — the plan is
    # asserted to have exactly ONE in tests/test_plans.py
    return (
        kept.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("doc_id", "lang", "predicted_lang", "quality_score")
    )


def tfidf_top_terms(
    documents: DataFrame, text_col: str = "text", k: int = 5, scale: int = 10_000
) -> DataFrame:
    """Per-document top-k terms by tf-idf — keyword extraction for a
    training-data pipeline (e.g. topic tagging / quality signals).

    Scoring is the ratio-form idf kept FULLY INTEGER:
    ``score = (tf * (N+1) * scale) div (df+1)`` — monotone in tf and 1/df
    like log-idf, but exact integer arithmetic end-to-end, so ranking and
    values are bit-identical across engines (functions/exact.py
    rationale; a float ``ln`` could flip ranks of near-equal scores at
    the ulp level between libm implementations).

    Shape at scale: explode → (doc, term) count (one shuffle, map-side
    partial) → term df agg over the distinct doc-term pairs (vocabulary
    ≪ corpus) → broadcast scalar N → per-doc window top-k (partitioned
    by doc, never global). Docs whose tokens are all shorter than the
    tokenizer minimum produce no rows (documented)."""
    from pyspark.sql import Window

    ex = documents.select("doc_id", F.explode(tokenize(text_col)).alias("term"))
    tf = ex.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    ndocs = documents.select(F.countDistinct("doc_id").alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(ndocs))
        .withColumn(
            "score", F.expr(f"(tf * (n_docs + 1) * {scale}) div (df + 1)")
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "term")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "df", "score", "rank")
        # no presentation sort: D×k-sized output, order-insensitive compare
    )


# PII patterns deliberately restricted to the regex subset with identical
# semantics in Java (Spark) and RE2 (DuckDB oracle): no backrefs, no
# lookbehind, ASCII \d and \b only. Application order matters (an email's
# local part can contain digits): email → IP → phone.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\+?\d(?:[ -]?\d){6,}"


def redact_pii(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """PII scrubbing for a training corpus: replace emails, IPv4 addresses
    and phone-like digit runs with typed placeholder tokens, reporting
    per-category hit counts. Pure codegen'd ``regexp_replace`` /
    ``regexp_count`` — a linear scan with no shuffle, the cheapest possible
    shape for a 100 TB pass. Counts are taken on the text as each rule
    sees it (post-prior-redactions), matching what was actually replaced.

    Output carries ``md5`` + length of the redacted text rather than the
    text itself so downstream hash-checks stay compact; callers wanting the
    redacted text use the same three replaces inline."""
    t0 = F.col(text_col)
    n_email = F.regexp_count(t0, F.lit(PII_EMAIL))
    t1 = F.regexp_replace(t0, PII_EMAIL, "<EMAIL>")
    n_ip = F.regexp_count(t1, F.lit(PII_IPV4))
    t2 = F.regexp_replace(t1, PII_IPV4, "<IP>")
    n_phone = F.regexp_count(t2, F.lit(PII_PHONE))
    t3 = F.regexp_replace(t2, PII_PHONE, "<PHONE>")
    return documents.select(
        "doc_id",
        n_email.cast("long").alias("n_emails"),
        n_ip.cast("long").alias("n_ips"),
        n_phone.cast("long").alias("n_phones"),
        F.length(t3).alias("redacted_len"),
        F.md5(t3).alias("redacted_fp"),
    )


def fingerprint_docs(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprinting: md5 of normalized text (exact-dup key) plus
    a rolling-shingle min-fingerprint (md5 over 3-token shingles, min) —
    both engine- and oracle-computable.

    Single-pass plan (VERDICT r1 #4): one scan, one exchange, zero joins.
    ``posexplode_outer`` keeps shingle-less/empty docs (their min comes back
    as ''), the whole-doc fingerprint rides only on the ``pos == 0`` row (so
    the window shuffle doesn't carry 32 md5 chars per *token*), shingles are
    the proven lead-window form, and the final ``groupBy(doc_id)`` reuses the
    window's hash partitioning — Catalyst inserts no second exchange. MIN
    over all shingles == MIN over distinct, so no dropDuplicates needed."""
    from pyspark.sql import Window

    shingle_n = 3
    toks = tokenize(text_col, min_len=1)
    ex = documents.select(
        "doc_id",
        fingerprint(text_col).alias("__fp"),
        F.posexplode_outer(toks).alias("pos", "tok"),
    ).select(
        "doc_id",
        F.when(F.coalesce(F.col("pos"), F.lit(0)) == 0, F.col("__fp")).alias("__fp"),
        "pos",
        "tok",
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    leads = [F.lead("tok", i).over(w) for i in range(1, shingle_n)]
    shingle_fp = F.when(
        leads[-1].isNotNull(), F.md5(F.concat_ws(" ", F.col("tok"), *leads))
    )
    return (
        ex.select("doc_id", "__fp", shingle_fp.alias("__sfp"))
        .groupBy("doc_id")
        .agg(
            F.min("__fp").alias("doc_fp"),
            F.coalesce(F.min("__sfp"), F.lit("")).alias("min_shingle_fp"),
        )
    )
