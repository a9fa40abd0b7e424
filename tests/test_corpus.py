"""Corpus-level training-data operators (operators/corpus.py +
text.redact_pii): repetition signals, segment dedup, packing, deterministic
mixture sampling, integer-exact BM25, contamination — hand-computed
fixtures, plus determinism/monotonicity properties."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from jobanalytics_bigdataproject_spark.operators import corpus, text


def _docs(spark, rows):
    """rows: (doc_id, text, lang, source)"""
    return spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])


# ---------------------------------------------------------------------------
# repetition_stats
# ---------------------------------------------------------------------------


def test_repetition_stats_hand_computed(spark):
    df = _docs(
        spark,
        [
            (1, "a a b", "en", "s"),        # 3 tok, 2 distinct; bigrams: "a a","a b"
            (2, "a a a a", "en", "s"),      # 4 tok; bigrams 3x "a a"; trigrams 2x "a a a"
            (3, "x", "en", "s"),            # single token: no bigrams/trigrams
        ],
    )
    out = {r.doc_id: r for r in corpus.repetition_stats(df).collect()}
    assert out[1].n_tokens == 3
    assert out[1].dup_token_bp == (3 - 2) * 10000 // 3
    assert out[1].top_bigram_bp == 1 * 10000 // 2
    assert out[1].dup_trigram_bp == 0
    assert out[2].dup_token_bp == (4 - 1) * 10000 // 4
    assert out[2].top_bigram_bp == 10000          # all bigrams identical
    assert out[2].dup_trigram_bp == (2 - 1) * 10000 // 2
    assert out[3].n_tokens == 1
    assert out[3].top_bigram_bp == 0 and out[3].dup_trigram_bp == 0


# ---------------------------------------------------------------------------
# segment_dedup
# ---------------------------------------------------------------------------


def test_segment_dedup_cross_doc_spans(spark):
    shared = " ".join(f"w{i}" for i in range(10))       # one full shared segment
    uniq_a = " ".join(f"a{i}" for i in range(10))
    uniq_b = " ".join(f"b{i}" for i in range(5))        # short tail segment
    df = _docs(
        spark,
        [
            (1, f"{shared} {uniq_a}", "en", "s"),       # segs: shared, uniq_a
            (2, f"{shared} {uniq_b}", "en", "s"),       # segs: shared(dup), uniq_b
        ],
    )
    out = {r.doc_id: r for r in corpus.segment_dedup(df, seg_len=10).collect()}
    assert out[1].n_segments == 2 and out[1].n_kept_segments == 2
    assert out[2].n_segments == 2
    assert out[2].n_kept_segments == 1              # shared span kept only in doc 1
    assert out[2].n_removed_segments == 1


def test_segment_dedup_within_doc_repeat(spark):
    seg = " ".join(f"w{i}" for i in range(10))
    df = _docs(spark, [(7, f"{seg} {seg}", "en", "s")])
    r = corpus.segment_dedup(df, seg_len=10).first()
    assert r.n_segments == 2 and r.n_kept_segments == 1 and r.n_removed_segments == 1


# ---------------------------------------------------------------------------
# redact_pii
# ---------------------------------------------------------------------------


def test_redact_pii_replaces_and_counts(spark):
    df = _docs(
        spark,
        [
            (1, "mail me at jo.doe+x@site-a.example.com or call 555-123-4567", "en", "s"),
            (2, "server 192.168.0.1 and 10.0.0.255 up", "en", "s"),
            (3, "no pii here", "en", "s"),
        ],
    )
    out = {r.doc_id: r for r in text.redact_pii(df).collect()}
    assert out[1].n_emails == 1 and out[1].n_phones == 1 and out[1].n_ips == 0
    assert out[2].n_ips == 2 and out[2].n_emails == 0
    assert out[3].n_emails == out[3].n_ips == out[3].n_phones == 0
    expected1 = "mail me at <EMAIL> or call <PHONE>"
    assert out[1].redacted_fp == hashlib.md5(expected1.encode()).hexdigest()
    assert out[1].redacted_len == len(expected1)
    expected2 = "server <IP> and <IP> up"
    assert out[2].redacted_fp == hashlib.md5(expected2.encode()).hexdigest()


# ---------------------------------------------------------------------------
# pack_sequences
# ---------------------------------------------------------------------------


def test_pack_sequences_bins_and_offsets(spark):
    def words(n):
        return " ".join("w" for _ in range(n))

    df = _docs(
        spark,
        [
            (1, words(300), "en", "sA"),
            (2, words(300), "en", "sA"),
            (3, words(300), "en", "sA"),
            (4, words(10), "en", "sB"),     # other shard packs independently
        ],
    )
    out = {r.doc_id: r for r in corpus.pack_sequences(df, budget=512).collect()}
    assert (out[1].bin_id, out[1].bin_offset) == (0, 0)
    assert (out[2].bin_id, out[2].bin_offset) == (0, 300)   # starts at 300, straddles
    assert (out[3].bin_id, out[3].bin_offset) == (1, 88)    # starts at 600
    assert (out[4].bin_id, out[4].bin_offset) == (0, 0)


# ---------------------------------------------------------------------------
# mixture_sample
# ---------------------------------------------------------------------------


def test_mixture_sample_deterministic_and_monotone(spark):
    rows = [(i, f"text {i}", "en", f"src{i % 3}") for i in range(300)]
    df = _docs(spark, rows)
    a = {r.doc_id for r in corpus.mixture_sample(df).collect()}
    b = {r.doc_id for r in corpus.mixture_sample(df).collect()}
    assert a == b                                           # no RNG anywhere
    # src0 at 10000bp keeps every src0 row
    assert {i for i in range(300) if i % 3 == 0} <= a
    # a higher rate keeps a superset of a lower rate (same hash, same threshold order)
    lo = {r.doc_id for r in corpus.mixture_sample(df, rates_bp={}, default_bp=2500).collect()}
    hi = {r.doc_id for r in corpus.mixture_sample(df, rates_bp={}, default_bp=7500).collect()}
    assert lo <= hi
    # and the realized rate lands near the target (65536-granular hash buckets)
    assert 0.15 < len(lo) / 300 < 0.35


def test_mixture_sample_null_source_draws_default_rate(spark):
    # NULL source hashes as md5(doc_id || ':' || '') and gets default_bp —
    # never silently dropped, never given a named source's rate. Pins the
    # coalesce-to-sentinel device the oracle mirrors.
    rows = [(i, f"text {i}", "en", None) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    kept = corpus.mixture_sample(df, rates_bp={"src0": 10000}, default_bp=5000).collect()
    assert 0.4 < len(kept) / 400 < 0.6           # default rate applies, rows not dropped
    expected = {
        i for i in range(400)
        if hashlib.md5(f"{i}:".encode()).hexdigest()[:4] < f"{(5000 * 65536) // 10000:04x}"
    }
    assert {r.doc_id for r in kept} == expected  # exact hash arithmetic, both engines


# ---------------------------------------------------------------------------
# bm25_search
# ---------------------------------------------------------------------------


def _bm25_expected(docs, terms, k):
    """Reference implementation of the exact integer BM25 used by the op."""
    toks = {
        d: [w for w in t.lower().split() if len("".join(c for c in w if c.isalpha())) >= 3]
        for d, t in docs.items()
    }
    toks = {d: ["".join(c for c in w if c.isalpha()) for w in tw] for d, tw in toks.items()}
    toks = {d: [w for w in tw if len(w) >= 3] for d, tw in toks.items()}
    dl = {d: len(tw) for d, tw in toks.items()}
    big_t, n = sum(dl.values()), len(docs)
    scores = {}
    for term in terms:
        tf = {d: tw.count(term) for d, tw in toks.items() if term in tw}
        df_ = len(tf)
        if not df_:
            continue
        idf = ((2 * (n - df_) + 1) * 1000) // (2 * df_ + 1)
        for d, f in tf.items():
            tfp = (22 * f * big_t * 10000) // (10 * f * big_t + 3 * big_t + 9 * dl[d] * n)
            scores[d] = scores.get(d, 0) + idf * tfp
    return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


def test_bm25_matches_reference_arithmetic(spark):
    docs = {
        1: "spark filter spark join window table",
        2: "filter filter filter other words here",
        3: "window window spark",
        4: "nothing relevant at all",
        5: "spark spark spark spark spark spark spark spark",  # long, high tf
    }
    df = _docs(spark, [(d, t, "en", "s") for d, t in docs.items()])
    got = [(r.doc_id, r.score) for r in corpus.bm25_search(df, ("spark", "filter", "window"), k=5).collect()]
    assert got == _bm25_expected(docs, ("spark", "filter", "window"), 5)


# ---------------------------------------------------------------------------
# full_prep_pipeline (composed flagship)
# ---------------------------------------------------------------------------


def test_full_prep_pipeline_each_filter_fires(spark):
    good = "the quick brown fox jumps right over the lazy sleeping dog with style and grace from here"
    bench = " ".join(f"e{chr(97 + i)}" for i in range(12))           # eval doc
    contaminated = (
        "the fine words here also come with more detail from this "
        + " ".join(f"e{chr(97 + i)}" for i in range(9))               # copies 9 bench tokens
    )
    repetitive = "the the the the the the the the the the and and and and"
    low_quality = "x"                                                 # fails length score
    df = _docs(
        spark,
        [
            (1, bench, "en", "s"),
            (21, good, "en", "s"),
            (22, good, "en", "s"),                                    # exact dup of 21
            (23, contaminated, "en", "s"),
            (24, repetitive, "en", "s"),
            (25, low_quality, "en", "s"),
            (26, "el la de que el la de que si no por", "es", "s"),   # not target lang
        ],
    )
    out = corpus.full_prep_pipeline(df, min_quality=0.35, max_dup_token_bp=6000).collect()
    assert [r.doc_id for r in out] == [21]                            # only the canonical good doc
    assert out[0].predicted_lang == "en" and out[0].dup_token_bp <= 6000


def test_full_prep_pipeline_contamination_survives_punctuation(spark):
    # Pins the pipeline's decontamination tokenizer to tokenize(min_len=1)
    # (strip [^a-z], drop empties) — the same grams benchmark_contamination
    # and the DuckDB oracle build. A shared span whose copy carries
    # punctuation/digits must still be flagged: raw whitespace tokens would
    # see "eb," != "eb" and miss it.
    span = " ".join(f"e{chr(97 + i)}" for i in range(10))
    bench = span + " closing words"
    # same 10-token span but with punctuation and digits glued onto tokens
    dirty_span = " ".join(f"e{chr(97 + i)}," if i % 2 else f"e{chr(97 + i)}7" for i in range(10))
    contaminated = "the fine words here also come with more detail from this " + dirty_span
    clean = "the quick brown fox jumps right over the lazy sleeping dog with style and grace here"
    df = _docs(spark, [(1, bench, "en", "s"), (21, contaminated, "en", "s"), (22, clean, "en", "s")])

    out = {r.doc_id for r in corpus.full_prep_pipeline(df, min_quality=0.0, max_dup_token_bp=10000, langs=("en",)).collect()}
    assert out == {22}, "punctuated copy of a bench span must be decontaminated away"

    flagged = {
        r.doc_id
        for r in corpus.benchmark_contamination(df, bench_max_id=20, ngram=8).collect()
        if r.is_contaminated
    }
    assert flagged == {21}, "standalone decontamination must flag the same doc"


# ---------------------------------------------------------------------------
# benchmark_contamination
# ---------------------------------------------------------------------------


def test_contamination_flags_planted_overlap(spark):
    # letter-only words: the tokenizer strips non-letters, so "b0"-style
    # names would all collapse to the same token
    bench_text = " ".join(f"b{chr(97 + i)}" for i in range(12))   # doc_id < 20 → bench
    clean_text = " ".join(f"c{chr(97 + i)}" for i in range(12))
    # copies tokens 0..9 of the bench doc → shares 8-grams
    contaminated = " ".join(f"b{chr(97 + i)}" for i in range(10)) + " tail words here"
    df = _docs(
        spark,
        [
            (1, bench_text, "en", "s"),
            (21, contaminated, "en", "s"),
            (22, clean_text, "en", "s"),
        ],
    )
    out = {r.doc_id: r for r in corpus.benchmark_contamination(df, bench_max_id=20, ngram=8).collect()}
    assert set(out) == {21, 22}                           # bench docs excluded from output
    assert out[21].is_contaminated and out[21].n_shared_ngrams == 3  # starts at tok 0,1,2
    assert not out[22].is_contaminated and out[22].n_shared_ngrams == 0


# ---------------------------------------------------------------------------
# hash_split / cap_per_source / bigram_novelty
# ---------------------------------------------------------------------------


def _bucket_hex(doc_id, salt):
    return hashlib.md5(f"{doc_id}:{salt}".encode()).hexdigest()[:4]


def test_hash_split_matches_reference_arithmetic(spark):
    rows = [(i, f"text {i}", "en", f"src{i % 2}") for i in range(400)]
    df = _docs(spark, rows).withColumn("n_chars", F.length("text").cast("long"))
    out = {(r.split, r.source): (r.n_docs, r.sum_chars)
           for r in corpus.hash_split(df).collect()}
    # independent python replica of the md5-bucket assignment
    t_train, t_val = f"{8000 * 65536 // 10000:04x}", f"{9000 * 65536 // 10000:04x}"
    expected = {}
    for i, t, _, s in rows:
        b = _bucket_hex(i, "split:v1")
        split = "train" if b < t_train else ("val" if b < t_val else "test")
        n, c = expected.get((split, s), (0, 0))
        expected[(split, s)] = (n + 1, c + len(t))
    assert out == expected
    # growth stability: adding docs never moves an existing one
    bigger = _docs(spark, rows + [(1000 + i, "new doc", "en", "src0") for i in range(50)])
    bigger = bigger.withColumn("n_chars", F.length("text").cast("long"))
    out2 = {(r.split, r.source): r.n_docs for r in corpus.hash_split(bigger).collect()}
    for (split, s), (n, _) in expected.items():
        extra = sum(1 for i in range(50)
                    if s == "src0"
                    and ("train" if _bucket_hex(1000 + i, "split:v1") < t_train
                         else ("val" if _bucket_hex(1000 + i, "split:v1") < t_val else "test")) == split)
        assert out2[(split, s)] == n + extra


def test_cap_per_source_exact_keep_set_and_skew_shape(spark):
    # hot source (300 docs, over the cap) + cold source (40 docs, under it)
    rows = [(i, f"text {i}", "en", "hot") for i in range(300)] + [
        (1000 + i, f"text {i}", "en", "cold") for i in range(40)
    ]
    df = _docs(spark, rows).withColumn("n_chars", F.length("text").cast("long"))
    kept = {r.doc_id for r in corpus.cap_per_source(df, max_per_source=120).collect()}
    # cold source entirely kept: bucket * 40 < 120 * 65536 always
    assert {1000 + i for i in range(40)} <= kept
    # hot source: exact expected set from the same arithmetic
    expected_hot = {
        i for i in range(300)
        if int(_bucket_hex(i, "cap:v1"), 16) * 300 < 120 * 65536
    }
    assert kept - {1000 + i for i in range(40)} == expected_hot
    # the deterministic-expectation cap lands near the target
    assert 60 <= len(expected_hot) <= 180


def test_bigram_novelty_hand_computed(spark):
    df = _docs(
        spark,
        [
            (1, "a b c", "en", "s"),    # bigrams: "a b" (shared), "b c" (singleton)
            (2, "a b d", "en", "s"),    # bigrams: "a b" (shared), "b d" (singleton)
            (3, "solo", "en", "s"),     # no bigrams → no output row
        ],
    )
    out = {r.doc_id: r for r in corpus.bigram_novelty(df).collect()}
    assert set(out) == {1, 2}
    for d in (1, 2):
        assert out[d].n_bigrams == 2
        assert out[d].n_singletons == 1
        assert out[d].novelty_bp == 5000


# ---------------------------------------------------------------------------
# chunk_documents (RAG windows)
# ---------------------------------------------------------------------------


def test_chunking_covers_all_tokens_with_exact_overlap(spark):
    from jobanalytics_bigdataproject_spark.operators.corpus import chunk_documents

    text = " ".join(f"w{i}" for i in range(100))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = chunk_documents(docs, chunk_tokens=10, overlap=3).collect()
    # step 7 -> ceil((100-3)/7) = 14 chunks
    assert len(rows) == 14
    seen = []
    for r in sorted(rows, key=lambda r: r.chunk_idx):
        toks = r.chunk_text.split(" ")
        assert r.n_chunk_tokens == len(toks) <= 10
        start = r.chunk_idx * 7
        assert toks == [f"w{i}" for i in range(start, min(start + 10, 100))]
        seen.extend(toks)
    assert set(seen) == {f"w{i}" for i in range(100)}


def test_chunking_short_and_empty_docs(spark):
    from jobanalytics_bigdataproject_spark.operators.corpus import chunk_documents

    docs = spark.createDataFrame(
        [(1, "only three tokens"), (2, "   "), (3, "x")],
        "doc_id long, text string",
    )
    rows = chunk_documents(docs, chunk_tokens=10, overlap=3).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == {1, 3}  # whitespace-only doc yields nothing
    assert len(by_doc[1]) == 1 and by_doc[1][0].chunk_text == "only three tokens"
    assert len(by_doc[3]) == 1 and by_doc[3][0].n_chunk_tokens == 1


def test_chunking_no_shuffle(spark, tables):
    from jobanalytics_bigdataproject_spark.operators.corpus import chunk_documents
    from jobanalytics_bigdataproject_spark.plans.inspect import count_exchanges

    df = chunk_documents(tables["documents"]).drop("doc_id")  # drop sort? keep plan honest
    # presentation orderBy adds a range exchange; the chunking itself must
    # add none beyond it
    assert count_exchanges(chunk_documents(tables["documents"])) <= 1


def test_curriculum_shards_partitions_whole_corpus(spark, tables):
    from jobanalytics_bigdataproject_spark.operators.corpus import curriculum_shards

    docs = tables["documents"]
    rows = curriculum_shards(docs, n_shards=4).collect()
    assert [r.shard for r in rows] == sorted({r.shard for r in rows})
    assert sum(r.n_docs for r in rows) == docs.count()
    # value-tier property: shard ranges are disjoint and ascending
    for lo, hi in zip(rows, rows[1:]):
        assert lo.q_max_bp2 <= hi.q_min_bp2
    # roughly balanced (value ties can skew, but no shard may be empty
    # on the fixture's continuous-ish score distribution)
    assert all(r.n_docs > 0 for r in rows)


def test_fuzzy_contamination_catches_paraphrase(spark):
    from jobanalytics_bigdataproject_spark.operators.corpus import fuzzy_contamination
    from jobanalytics_bigdataproject_spark.operators.dedup import ngram_jaccard_pairs

    words = ("the quick brown fox jumps over the lazy dog while seven wizards "
             "brew strong potions near the ancient stone bridge at midnight "
             "under a pale winter moon as silent rivers carry old secrets "
             "toward the distant sea past sleeping villages and dark forests").split()
    para = list(words)
    para[5] = "vaults"      # light edit: two word substitutions
    para[20] = "copper"
    rows = [
        (0, " ".join(words)),                       # bench doc
        (1, "completely different benchmark text about tax law and spreadsheets " * 3),
        (100, " ".join(para)),                      # paraphrased leak of bench 0
        (101, "unrelated corpus document discussing gardening tips " * 5),
        (102, " ".join(words)),                     # exact copy of bench 0
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in fuzzy_contamination(
        docs, bench_max_id=2, jaccard_threshold=0.5
    ).collect()}
    assert set(out) == {100, 101, 102}
    assert out[102].is_contaminated and out[102].max_jaccard == 1.0
    assert out[102].matched_bench_id == 0
    assert out[100].is_contaminated and 0.5 <= out[100].max_jaccard < 1.0
    assert out[100].matched_bench_id == 0
    assert not out[101].is_contaminated and out[101].max_jaccard == 0.0

    # reported scores are EXACT: equal to brute-force cross-pair Jaccard
    cross = spark.createDataFrame(
        [(a, b) for a in (0, 1) for b in (100, 101, 102)],
        "doc_id_a long, doc_id_b long",
    )
    brute = {
        (r.doc_id_a, r.doc_id_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, cross, threshold=0.0).collect()
    }
    assert out[100].max_jaccard == brute[(0, 100)]
    assert out[102].max_jaccard == brute[(0, 102)]
