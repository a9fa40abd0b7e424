"""Exact-substring dedup (operators/substring.py — the ExactSubstr pass
of Lee et al. 2022, re-expressed as shingle-position SQL).

Hand-computable fixtures pin the whole law: keep-first occurrence
ranking, gaps-and-islands span assembly (merge at gap <= k, split past
it), exact token accounting (span union size == max+k-min), removal
reconstruction, short-doc no-ops, and raw == hashed shingle keys."""
from __future__ import annotations

import pytest

from jobanalytics_bigdataproject_spark.operators import substring


SPAN = "the quick brown fox jumps over the lazy dog tonight"  # 10 words


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cross_doc_span_detected_keep_first(spark):
    d1 = "alpha beta " + SPAN + " gamma"          # span tokens 2..11
    d2 = "one two three " + SPAN + " four five"   # span tokens 3..12
    d3 = "totally unrelated words here only once stated plainly today now"
    df = _df(spark, [(1, d1), (2, d2), (3, d3)])
    spans = substring.duplicate_spans(df, k=8).collect()
    # keep-first: doc 1 (earliest occurrence) keeps its span; only doc 2
    # is flagged, with the exact token range of the shared 10-word span
    assert [(r.doc_id, r.span_start, r.span_end) for r in spans] == [(2, 3, 12)]
    rep = {r.doc_id: r for r in substring.substring_dup_report(df, k=8).collect()}
    assert set(rep) == {2}
    assert (rep[2].n_tokens, rep[2].n_dup_spans, rep[2].dup_tokens) == (15, 1, 10)


def test_removal_reconstructs_text_and_token_law(spark):
    d1 = "alpha beta " + SPAN + " gamma"
    d2 = "one two three " + SPAN + " four five"
    df = _df(spark, [(1, d1), (2, d2)])
    out = {r.doc_id: r for r in substring.remove_duplicate_spans(df, k=8).collect()}
    assert out[1].text_clean == d1  # first occurrence untouched
    assert out[2].text_clean == "one two three four five"
    for r in out.values():  # the law the driver oracle checks end-to-end
        assert r.n_tokens_after == r.n_tokens - (10 if r.doc_id == 2 else 0)


def test_intra_doc_repetition_keep_first(spark):
    s = "a b c d e f g h"  # exactly one 8-gram
    df = _df(spark, [(1, s + " x y z " + s)])  # second copy at tokens 11..18
    spans = substring.duplicate_spans(df, k=8).collect()
    assert [(r.span_start, r.span_end) for r in spans] == [(11, 18)]
    out = substring.remove_duplicate_spans(df, k=8).first()
    assert out.text_clean == s + " x y z"
    assert out.n_tokens_after == 11


def test_gap_rule_splits_past_k_and_merges_within(spark):
    g1 = "p q r s t u v w"
    g2 = "h i j k l m n o"
    base = g1 + " filler words between the grams " + g2  # first occurrences
    split_doc = g1 + " zz " + g2  # dup grams at pos 0 and 9: gap 9 > 8 → split
    merge_doc = g1 + " " + g2     # dup grams at pos 0 and 8: gap 8 <= 8 → merge
    df = _df(spark, [(1, base), (2, split_doc), (3, merge_doc)])
    spans = sorted(
        (r.doc_id, r.span_start, r.span_end)
        for r in substring.duplicate_spans(df, k=8).collect()
    )
    assert spans == [(2, 0, 7), (2, 9, 16), (3, 0, 15)]
    rep = {r.doc_id: r for r in substring.substring_dup_report(df, k=8).collect()}
    assert (rep[2].n_dup_spans, rep[2].dup_tokens) == (2, 16)
    assert (rep[3].n_dup_spans, rep[3].dup_tokens) == (1, 16)
    # doc 2's cleaned text keeps only the separator; doc 3 empties entirely
    out = {r.doc_id: r for r in substring.remove_duplicate_spans(df, k=8).collect()}
    assert out[2].text_clean == "zz" and out[2].n_tokens_after == 1
    assert out[3].text_clean == "" and out[3].n_tokens_after == 0


def test_short_docs_noop_and_hashed_equals_raw(spark):
    df = _df(
        spark,
        [(1, "too short"), (2, "a b c d e f g h"), (3, "a b c d e f g h")],
    )
    raw = substring.substring_dup_report(df, k=8).collect()
    hashed = substring.substring_dup_report(df, k=8, hash_shingles=True).collect()
    assert raw == hashed  # the 8-byte scale key changes nothing but bytes moved
    assert [(r.doc_id, r.dup_tokens) for r in raw] == [(3, 8)]
    out = {r.doc_id: r for r in substring.remove_duplicate_spans(df, k=8).collect()}
    assert out[1].text_clean == "too short"  # shorter than k: untouched
    assert out[2].text_clean == "a b c d e f g h"  # first occurrence kept


def test_fixture_corpus_report_is_consistent(spark, tables):
    """On the real documents fixture the report's accounting must be
    internally consistent with the removal output, whatever k finds."""
    docs = tables["documents"].limit(300)
    rep = {r.doc_id: r for r in substring.substring_dup_report(docs, k=6).collect()}
    out = {r.doc_id: r for r in substring.remove_duplicate_spans(docs, k=6).collect()}
    assert set(rep) <= set(out)
    for did, r in out.items():
        dup = rep[did].dup_tokens if did in rep else 0
        assert r.n_tokens_after == r.n_tokens - dup
        if did in rep:
            assert 0 < rep[did].dup_tokens <= rep[did].n_tokens


def test_incremental_probe_against_store_and_batch(spark, tmp_path):
    """Dedup-on-arrival: batch spans duplicated against HISTORY (via the
    persisted shingle store — history never re-shingled) and within the
    batch itself are both cut; update_store makes batch N+1 dedup
    against batch N."""
    path = str(tmp_path / "substr_store")
    hist = _df(spark, [(1, "alpha beta " + SPAN + " gamma")])
    substring.shingle_store_write(hist, path, k=8)
    batch = _df(
        spark,
        [
            (10, "one two three " + SPAN + " four five"),  # vs history
            (11, "x y z a b c d e f g h"),                 # first in batch
            (12, "q r s a b c d e f g h"),                 # duplicates 11's tail
        ],
    )
    out = {
        r.doc_id: r
        for r in substring.substring_dedup_incremental(
            spark, batch, path, k=8, update_store=True
        ).collect()
    }
    assert out[10].text_clean == "one two three four five"
    assert out[11].text_clean == "x y z a b c d e f g h"  # batch keep-first
    assert out[12].text_clean == "q r s"
    assert out[12].n_tokens_after == 3 and out[12].n_tokens == 11
    # the store learned the batch: a re-arrival of doc 11's tail is cut
    batch2 = _df(spark, [(20, "now then a b c d e f g h")])
    out2 = substring.substring_dedup_incremental(spark, batch2, path, k=8).first()
    assert out2.text_clean == "now then"
    # without update_store the store is unchanged by the probe
    from jobanalytics_bigdataproject_spark.sources import bucket_store

    n_before = bucket_store.open(spark, path).count()
    substring.substring_dedup_incremental(spark, batch2, path, k=8)
    assert bucket_store.open(spark, path).count() == n_before


def test_incremental_equals_full_rebuild_on_fixture(spark, tables, tmp_path):
    """The incremental law: store(history) + probe(batch) must equal the
    FULL-corpus keep-first removal restricted to the batch docs (history
    doc_ids precede batch doc_ids, so corpus occurrence order and
    history-then-batch order agree)."""
    docs = tables["documents"].limit(400)
    cutoff = 300
    hist = docs.filter("doc_id < 300")
    batch = docs.filter("doc_id >= 300")
    path = str(tmp_path / "store")
    substring.shingle_store_write(hist, path, k=6)
    inc = {
        r.doc_id: (r.n_tokens, r.n_tokens_after, r.text_clean)
        for r in substring.substring_dedup_incremental(spark, batch, path, k=6).collect()
    }
    full = {
        r.doc_id: (r.n_tokens, r.n_tokens_after, r.text_clean)
        for r in substring.remove_duplicate_spans(docs, k=6, hash_shingles=True).collect()
        if r.doc_id >= cutoff
    }
    assert inc == full


def test_streaming_sink_dedups_across_batches_exactly_once(spark, tmp_path):
    """The foreachBatch sink: batch 2 dedups against batch 1 via the
    learned store, outputs land as snapshot versions keyed by batch id,
    and a RETRY of a batch no-ops (exactly-once) — including its store
    learn, which is effect-idempotent."""
    from jobanalytics_bigdataproject_spark.sources import snapshots as snap

    store = str(tmp_path / "store")
    out = str(tmp_path / "out")
    substring.shingle_store_write(_df(spark, [(0, "seed corpus only")]), store, k=8)
    sink = substring.substring_dedup_sink(spark, store, out, k=8)
    b1 = _df(spark, [(1, "alpha beta " + SPAN + " gamma")])
    b2 = _df(spark, [(2, "one two three " + SPAN + " four five")])
    sink(b1, 0)
    sink(b2, 1)
    rows = {r.doc_id: r for r in snap.read_snapshot(spark, out).collect()}
    assert rows[1].text_clean == "alpha beta " + SPAN + " gamma"  # first arrival kept
    assert rows[2].text_clean == "one two three four five"        # cut vs batch 1
    v = snap.current_version(spark, out)
    from jobanalytics_bigdataproject_spark.sources import bucket_store

    n_store = bucket_store.open(spark, store).count()
    sink(b2, 1)  # Spark retries a failed micro-batch with the SAME id
    assert snap.current_version(spark, out) == v  # output no-oped
    assert snap.read_snapshot(spark, out).count() == 2
    # the retry's store learn appended nothing (anti-join found no news)
    assert bucket_store.open(spark, store).count() == n_store


def test_min_span_tokens_filters_short_islands(spark):
    """VERDICT r8 #4: the ExactSubstr length threshold — only islands at
    least min_span_tokens long are removed; a duplicated bare k-gram
    survives when the dial is above k."""
    long_dup = "the quick brown fox jumps over the lazy dog tonight again yes"  # 12
    short_dup = "p q r s t u v w"  # exactly one 8-gram, island length 8
    d1 = long_dup + " filler001 " + short_dup
    d2 = "lead words here " + long_dup + " middle filler " + short_dup
    df = _df(spark, [(1, d1), (2, d2)])
    # default: both islands in doc 2 flagged (lengths 12 and 8)
    base = sorted(
        (r.span_end - r.span_start + 1)
        for r in substring.duplicate_spans(df, k=8).collect()
    )
    assert base == [8, 12]
    # threshold 10: the 8-token island survives, the 12-token one goes
    spans = substring.duplicate_spans(df, k=8, min_span_tokens=10).collect()
    assert [(r.doc_id, r.span_end - r.span_start + 1) for r in spans] == [(2, 12)]
    out = {
        r.doc_id: r
        for r in substring.remove_duplicate_spans(
            df, k=8, min_span_tokens=10
        ).collect()
    }
    assert out[1].text_clean == d1  # first occurrence untouched
    # doc 2 keeps its short duplicate k-gram, loses only the long island
    assert short_dup in out[2].text_clean
    assert long_dup not in out[2].text_clean
    assert out[2].n_tokens_after == out[2].n_tokens - 12
    # threshold <= k (or None) preserves current behavior exactly
    dflt = substring.duplicate_spans(df, k=8, min_span_tokens=8).collect()
    assert sorted((r.span_end - r.span_start + 1) for r in dflt) == base


def test_min_span_tokens_monotone(spark):
    """Raising the threshold is monotone: the removed-token total never
    increases, and every surviving span set is a subset of the looser one."""
    corpus = [
        (1, "alpha beta " + SPAN + " gamma " + SPAN),
        (2, "one two three " + SPAN + " four five"),
        (3, "a b c d e f g h x y z a b c d e f g h"),
        (4, SPAN + " " + SPAN + " " + SPAN),
    ]
    df = _df(spark, corpus)
    prev_spans, prev_cut = None, None
    for thr in (None, 9, 12, 25, 60):
        spans = {
            (r.doc_id, r.span_start, r.span_end)
            for r in substring.duplicate_spans(df, k=8, min_span_tokens=thr).collect()
        }
        cut = sum(e - s + 1 for _, s, e in spans)
        if prev_spans is not None:
            assert spans <= prev_spans
            assert cut <= prev_cut
        prev_spans, prev_cut = spans, cut
    assert prev_spans == set()  # a 60-token island cannot exist here


def test_max_doc_tokens_refuses_pathological_doc(spark):
    """VERDICT r8 #5: the per-document re-assembly buffer is O(tokens);
    the cap fails the job LOUDLY on an oversize document instead of
    letting one pathological row OOM the aggregate."""
    from pyspark.errors import SparkRuntimeException

    huge = (1, " ".join(f"w{i}" for i in range(200)))
    ok = (2, "alpha beta " + SPAN)
    df = _df(spark, [huge, ok])
    with pytest.raises(SparkRuntimeException, match="max_doc_tokens=100"):
        substring.remove_duplicate_spans(df, k=8, max_doc_tokens=100).collect()
    # a cap above the corpus max is a no-op — identical output
    capped = {
        r.doc_id: r.text_clean
        for r in substring.remove_duplicate_spans(df, k=8, max_doc_tokens=500).collect()
    }
    plain = {
        r.doc_id: r.text_clean
        for r in substring.remove_duplicate_spans(df, k=8).collect()
    }
    assert capped == plain


def test_bucketed_store_probe_is_store_side_shuffle_free(spark, tmp_path):
    """VERDICT r8 #2 plan gate: the shingle store is a BUCKETED external
    table, so the probe semi-join plans exactly ONE shuffle — the batch
    side, into the store's layout. Broadcast is disabled for the
    assertion because at 100 TB the store side is never broadcastable;
    the co-partitioned path is the shape under test."""
    from jobanalytics_bigdataproject_spark.sources import bucket_store

    path = str(tmp_path / "substr_store")
    hist = _df(spark, [(1, "alpha beta " + SPAN + " gamma")])
    substring.shingle_store_write(hist, path, k=8, num_buckets=4)
    batch = _df(spark, [(10, "one two three " + SPAN + " four five")])
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        store = bucket_store.open(spark, path)
        sp = substring.shingle_positions(batch, 8, "text", "doc_id", hash_shingles=True)
        probe = sp.join(store.select("shingle"), "shingle", "left_semi")
        plan = probe._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan  # the store scan uses its buckets
        # exactly one hash-repartition: the batch side; zero on the store
        assert plan.count("Exchange hashpartitioning") == 1
        # and the probe still returns the right answer through that plan
        assert probe.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_store_appends_bounded_and_maintain_compacts(spark, tmp_path):
    """VERDICT r8 #2 file-count bound: 10 learned batches append at most
    num_buckets files each (the append pre-repartitions into the bucket
    layout); maintain(dedup_stores=[path]) compacts the accumulation back
    to ≤ one file per bucket, preserving content bit-for-bit and leaving
    the store probe-able."""
    from jobanalytics_bigdataproject_spark.sources import bucket_store, maintenance
    from jobanalytics_bigdataproject_spark.sources import snapshots as snap

    path = str(tmp_path / "substr_store")
    substring.shingle_store_write(
        _df(spark, [(0, "seed corpus words only here")]), path, k=4, num_buckets=4
    )
    for i in range(10):
        batch = _df(
            spark, [(i + 1, f"batch{i} unique tokens alpha{i} beta{i} gamma{i} delta{i}")]
        )
        substring.substring_store_learn(spark, batch, path, k=4)
    n_files = bucket_store.file_count(spark, path)
    assert n_files <= 4 * 11  # ≤ num_buckets per initial write + learn
    assert n_files > 4  # accumulation genuinely happened (triggers compaction)
    before = sorted(map(tuple, bucket_store.open(spark, path).collect()))

    table = str(tmp_path / "tbl")
    snap.write_snapshot(_df(spark, [(1, "x")]), table)
    res = maintenance.maintain(
        spark, table, dedup_stores=[path], dedup_store_max_files=4
    )
    assert res["dedup_store_files"][path] <= 4  # one file set per bucket
    assert bucket_store.file_count(spark, path) <= 4
    after = sorted(map(tuple, bucket_store.open(spark, path).collect()))
    assert after == before
    # the compacted store still dedups a re-arrival correctly
    out = substring.substring_dedup_incremental(
        spark, _df(spark, [(99, f"batch3 unique tokens alpha3 beta3 gamma3 delta3")]),
        path, k=4,
    ).first()
    assert out.n_tokens_after == 0  # fully historical → fully cut
    # below the threshold maintain() leaves the store untouched
    res2 = maintenance.maintain(
        spark, table, dedup_stores=[path], dedup_store_max_files=64
    )
    assert res2["dedup_store_files"][path] == bucket_store.file_count(spark, path)


def test_store_reopens_after_catalog_loss(spark, tmp_path):
    """The catalog is ephemeral (local derby); the _bucket_meta.json
    sidecar lets a NEW session re-register the external bucketed table
    metadata-only — same rows, bucket layout intact."""
    from jobanalytics_bigdataproject_spark.sources import bucket_store

    path = str(tmp_path / "substr_store")
    hist = _df(spark, [(1, "alpha beta " + SPAN + " gamma")])
    substring.shingle_store_write(hist, path, k=8, num_buckets=4)
    rows = sorted(map(tuple, bucket_store.open(spark, path).collect()))
    # simulate a fresh session: the catalog forgot the table
    spark.sql(f"DROP TABLE {bucket_store._table_name(path)}")
    again = sorted(map(tuple, bucket_store.open(spark, path).collect()))
    assert again == rows
    # and the re-registered spec still powers the incremental probe
    out = substring.substring_dedup_incremental(
        spark, _df(spark, [(10, "one two three " + SPAN + " four five")]), path, k=8
    ).first()
    assert out.text_clean == "one two three four five"


def test_decontaminate_cuts_eval_spans_only(spark):
    """Substring decontamination (round 9): spans present in the eval
    set are cut from the corpus; corpus-INTERNAL repetition is NOT
    (this is presence-probing, not dedup), and eval docs are never
    modified — only probed."""
    repeat = "p q r s t u v w"  # an 8-gram the corpus repeats internally
    ev = _df(spark, [(1000, "intro words " + SPAN + " outro words")])
    corpus = _df(
        spark,
        [
            (1, "alpha beta " + SPAN + " gamma"),        # leaked span
            (2, repeat + " filler " + repeat),            # internal dup only
            (3, "completely clean text with nothing shared here at all"),
        ],
    )
    out = {
        r.doc_id: r
        for r in substring.substring_decontaminate(corpus, ev, k=8).collect()
    }
    assert out[1].text_clean == "alpha beta gamma"      # leak cut, rest kept
    assert out[1].n_tokens_after == out[1].n_tokens - 10
    # internal repetition untouched — decontamination is not dedup
    assert out[2].n_tokens_after == out[2].n_tokens
    assert repeat in out[2].text_clean
    assert out[3].n_tokens_after == out[3].n_tokens
    # hashed keys give the identical cut
    hashed = {
        r.doc_id: r
        for r in substring.substring_decontaminate(
            corpus, ev, k=8, hash_shingles=True
        ).collect()
    }
    assert {d: (r.n_tokens_after, r.text_clean) for d, r in out.items()} == {
        d: (r.n_tokens_after, r.text_clean) for d, r in hashed.items()
    }
    # min_span_tokens gates the cut: the 10-token leak survives at 12
    gated = {
        r.doc_id: r
        for r in substring.substring_decontaminate(
            corpus, ev, k=8, min_span_tokens=12
        ).collect()
    }
    assert gated[1].n_tokens_after == gated[1].n_tokens


def test_decontaminate_incremental_matches_batch_and_sink_exactly_once(spark, tmp_path):
    """Store-backed decontamination == the batch pass with hashed keys
    (the store IS the eval set's hashed shingles); the streaming sink
    commits exactly-once and, with no learn step, a batch's result is
    independent of every other batch."""
    from jobanalytics_bigdataproject_spark.sources import snapshots as snap

    ev = _df(spark, [(1000, "intro words " + SPAN + " outro words")])
    corpus = _df(
        spark,
        [
            (1, "alpha beta " + SPAN + " gamma"),
            (2, "p q r s t u v w filler p q r s t u v w"),  # internal dup only
            (3, "completely clean text with nothing shared here at all"),
        ],
    )
    store = str(tmp_path / "eval_store")
    substring.shingle_store_write(ev, store, k=8, num_buckets=4)
    inc = {
        r.doc_id: (r.n_tokens_after, r.text_clean)
        for r in substring.substring_decontaminate_incremental(
            spark, corpus, store, k=8
        ).collect()
    }
    batch = {
        r.doc_id: (r.n_tokens_after, r.text_clean)
        for r in substring.substring_decontaminate(corpus, ev, k=8).collect()
    }
    assert inc == batch
    assert inc[1][1] == "alpha beta gamma"          # leak cut
    assert "p q r s t u v w filler" in inc[2][1]    # internal dup kept

    # sink: two batches, then a retry of batch 1 — exactly-once output
    out = str(tmp_path / "out")
    sink = substring.substring_decontaminate_sink(spark, store, out, k=8)
    sink(corpus.filter("doc_id <= 2"), 0)
    sink(corpus.filter("doc_id = 3"), 1)
    v = snap.current_version(spark, out)
    sink(corpus.filter("doc_id = 3"), 1)  # retry with the same batch id
    assert snap.current_version(spark, out) == v
    rows = {r.doc_id: r.text_clean for r in snap.read_snapshot(spark, out).collect()}
    assert rows == {d: t for d, (_, t) in inc.items()}
