"""BPE trainer/encoder (operators/bpe.py): hand-computed merge sequence on
the classic corpus, deterministic ties, encoder consistency."""

from __future__ import annotations

from jobanalytics_bigdataproject_spark.operators import bpe


def test_merge_loop_hand_computed():
    # classic Sennrich-style toy corpus
    wc = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    rules = bpe._merge_loop(wc, n_merges=4)
    # pair counts round 1: ('e','s') 9, ('s','t') 9, ('t','</w>') 9, ...
    # ties at 9 break lexicographically -> ('e','s') first, then ('es','t'),
    # then ('est','</w>'), then ('l','o') (5+2=7)
    assert [(r[1], r[2]) for r in rules] == [
        ("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"),
    ]
    assert [r[3] for r in rules] == [9, 9, 9, 7]


def test_bpe_train_and_stats_on_spark(spark):
    rows = [(i, "low lower newest widest " * 3) for i in range(6)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    merges = bpe.bpe_train(docs, n_merges=6)
    got = [(r.rank, r.left, r.right) for r in merges.orderBy("rank").collect()]
    assert got[0] == (0, "e", "s") and len(got) == 6

    stats = {r.doc_id: r for r in bpe.bpe_token_stats(docs, merges).collect()}
    assert len(stats) == 6
    s = stats[0]
    assert s.n_tokens_ws == 12
    # merges compress: fewer BPE tokens than characters+end markers,
    # more than whitespace words (6 merges can't fully fuse every word)
    assert s.n_tokens_ws <= s.n_tokens_bpe < 12 * 7
    assert 0 < s.compression_bp < 10000
    # identical docs -> identical counts (determinism)
    assert all(
        (r.n_tokens_bpe, r.compression_bp) == (s.n_tokens_bpe, s.compression_bp)
        for r in stats.values()
    )


def test_bpe_encoder_applies_rank_order():
    ranks = {("e", "s"): 0, ("es", "t"): 1, ("est", bpe.END): 2}
    assert bpe._encode_word(list("newest") + [bpe.END], ranks) == 4  # n,e,w,est</w>
    assert bpe._encode_word(list("best") + [bpe.END], ranks) == 2    # b,est</w>
    assert bpe._encode_word(list("zz") + [bpe.END], dict(ranks)) == 3
