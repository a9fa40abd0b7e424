"""[EXT] Byte-pair-encoding tokenizer training and application (Sennrich
et al. 2016, "Neural Machine Translation of Rare Words with Subword
Units" — public algorithm; the tokenizer-training member of the
LLM-data-pipeline family).

Shape, matching how production BPE trainers actually scale: the ONLY
corpus-sized stage is the word-frequency aggregate (one shuffle, map-side
combined); the merge loop then runs on the bounded word-frequency dict —
at most ``max_words`` rows collected deterministically (count desc, word
asc), the same bounded-collect posture as ``pq_train``'s sample. A 100 TB
corpus has a vocabulary orders of magnitude smaller than itself; capping
it makes the driver cost explicit instead of accidental.

Determinism: merge selection ties break lexicographically on the pair, so
the rule table is a pure function of the word-frequency dict — identical
across runs, partitionings and engines. Iterative + in-dict merging is
not SQL-expressible → rows-only driver check (SURVEY §5.3); tests pin the
merge sequence on the classic hand-computable corpus.

Application (``bpe_token_stats``) re-runs the learned merges per word
inside Arrow-batched ``mapInPandas`` with the kilobyte rule table in the
closure — linear scan, no shuffle, no row-at-a-time Python UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

END = "</w>"  # word-end marker so merges can't cross word boundaries


def _word_counts(documents: DataFrame, text_col: str, max_words: int):
    rows = (
        documents.select(
            F.explode(
                F.filter(
                    F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                    lambda w: w != F.lit(""),
                )
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "w")
        .limit(max_words)
        .collect()
    )
    return [(r.w, int(r.n)) for r in rows]


def _merge_loop(word_counts, n_merges: int):
    """Classic BPE on an in-memory word-frequency dict. Returns the rule
    list [(rank, left, right, pair_count)]."""
    words = [(tuple(w) + (END,), n) for w, n in word_counts]
    rules = []
    for rank in range(n_merges):
        pair_n: dict[tuple[str, str], int] = {}
        for syms, n in words:
            for a, b in zip(syms, syms[1:]):
                pair_n[(a, b)] = pair_n.get((a, b), 0) + n
        if not pair_n:
            break
        # max count, ties broken lexicographically -> deterministic
        (left, right), cnt = min(pair_n.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        rules.append((rank, left, right, cnt))
        merged = left + right
        new_words = []
        for syms, n in words:
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words.append((tuple(out), n))
        words = new_words
    return rules


def bpe_train(
    documents: DataFrame,
    n_merges: int = 40,
    text_col: str = "text",
    max_words: int = 65536,
) -> DataFrame:
    """Learn ``n_merges`` BPE merge rules from the corpus; returns one row
    per rule: (rank, left, right, pair_count). See module docstring for
    the scale shape."""
    rules = _merge_loop(_word_counts(documents, text_col, max_words), n_merges)
    spark = documents.sparkSession
    return spark.createDataFrame(
        rules or [], "rank INT, left STRING, right STRING, pair_count BIGINT"
    )


def _encode_word(syms: list[str], ranks: dict[tuple[str, str], int]) -> int:
    """Token count after applying merges in rank order (greedy lowest-rank
    first — the canonical BPE apply)."""
    while len(syms) > 1:
        best_i, best_r = -1, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_r is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return len(syms)


def bpe_token_stats(
    documents: DataFrame,
    merges: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Per-document BPE vs whitespace token counts + compression in basis
    points, applying a learned rule table (kilobytes, closed over the
    Arrow batches — never joined against the corpus)."""
    ranks = {
        (r.left, r.right): int(r.rank) for r in merges.select("rank", "left", "right").collect()
    }
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_tokens_ws", T.LongType()),
            T.StructField("n_tokens_bpe", T.LongType()),
            T.StructField("compression_bp", T.LongType()),
        ]
    )

    def batches(it):
        import pandas as pd

        for pdf in it:
            out = {k: [] for k in ("doc_id", "n_tokens_ws", "n_tokens_bpe", "compression_bp")}
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                ws = [w for w in str(text).lower().strip().split() if w]
                n_chars_tok = 0
                n_bpe = 0
                for w in ws:
                    syms = list(w) + [END]
                    n_chars_tok += len(syms)
                    n_bpe += _encode_word(syms, ranks)
                out["doc_id"].append(doc_id)
                out["n_tokens_ws"].append(len(ws))
                out["n_tokens_bpe"].append(n_bpe)
                # chars-per-word baseline -> bpe tokens, in basis points
                out["compression_bp"].append(
                    (10000 * n_bpe) // n_chars_tok if n_chars_tok else 0
                )
            yield pd.DataFrame(out)

    return documents.select("doc_id", text_col).mapInPandas(batches, schema)
