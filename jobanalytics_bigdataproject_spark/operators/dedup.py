"""[EXT] Deduplication operators over ``documents`` (north-star LLM-pipeline
surface; the reference's only dedup is key-based dropDuplicates —
code/01_DataPreprocessing.scala:31).

Five strategies, each with an explicit 100 TB story:

- exact:        md5-fingerprint groupBy — one shuffle on the 16-byte hash,
                never on the text itself.
- MinHash+LSH:  shingle → per-seed min-hash signature (linear scan) → band →
                explode bands → groupBy band-bucket (shuffle on small
                band-hash keys) → pairs only within buckets. Candidate
                verification joins back by doc id. No O(n²) anywhere.
- SimHash:      64-bit weighted-bit fingerprint; near-dups = equal simhash
                (or banded chunks for hamming<k) — same bucket-join shape.
- n-gram Jaccard: exact verification metric for candidate pairs (explode
                shingle sets, intersect/union counts) — only ever run on
                LSH/bucket candidates, not all pairs.
- embedding cosine near-dup: see operators/similarity.py.

Everything is built-ins (xxhash64/md5/explode/groupBy) — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from jobanalytics_bigdataproject_spark.functions.textfns import (
    fingerprint,
    minhash_signature,
    shingles,
    tokenize,
)


def exact_dup_groups(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup: group by normalized-text md5. Returns one row per
    fingerprint with the group size and the smallest doc_id (the canonical
    survivor). Shuffle key is the 32-hex-char hash — uniform, skew-free."""
    return (
        documents.select(F.col("doc_id"), fingerprint(text_col).alias("doc_fp"))
        .groupBy("doc_fp")
        .agg(
            F.count("*").alias("dup_count"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
        .orderBy("doc_fp")
    )


def dedup_exact(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Keep only the canonical (min doc_id) row per exact fingerprint —
    the actual dedup, as a semi-join of the input against the survivors."""
    survivors = exact_dup_groups(documents, text_col).select(
        F.col("canonical_doc_id").alias("doc_id")
    )
    return documents.join(survivors, on="doc_id", how="semi")


def minhash_signatures(
    documents: DataFrame,
    text_col: str = "text",
    num_hashes: int = 32,
    shingle_n: int = 3,
) -> DataFrame:
    """Per-doc MinHash signature over word-shingles. Linear scan; signature
    is num_hashes longs (deterministic xxhash64 seeds 0..n-1)."""
    toks = tokenize(text_col, min_len=1)
    sh = F.array_distinct(shingles(toks, shingle_n))
    return documents.select(
        "doc_id",
        minhash_signature(sh, num_hashes).alias("minhash"),
    )


def minhash_lsh_candidates(
    documents: DataFrame,
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """LSH banding: split the signature into ``bands`` rows-per-band chunks,
    hash each chunk, explode to (band_idx, band_hash, doc_id), group — docs
    sharing any band bucket are candidate near-dups.

    Scale shape: explode multiplies rows by ``bands`` (cheap, fixed factor);
    the shuffle key is (band_idx, band_hash) — high cardinality, uniform.
    Bucket pair-expansion is bounded by bucket size; pathological buckets
    (all-identical corpora) are exactly the dups we want."""
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(documents, text_col, num_hashes, shingle_n)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.xxhash64(
                    *[F.element_at("minhash", b * rows_per_band + r + 1) for r in range(rows_per_band)]
                ).alias("band_hash"),
            )
            for b in range(bands)
        ]
    )
    banded = sigs.select("doc_id", F.explode(band_structs).alias("band")).select(
        "doc_id", "band.band_idx", "band.band_hash"
    )
    left = banded.alias("a")
    right = banded.alias("b")
    return (
        left.join(
            right,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
        )
        .distinct()
    )


def simhash64(tokens: Column) -> Column:
    """64-bit SimHash from a token array, pure built-ins: per-token
    xxhash64, then for each of 64 bit positions sum ±1 votes and take the
    sign. Expressed as aggregate-over-array; linear in tokens×64 — heavy-ish
    per row but shuffle-free (tune by sampling tokens at scale)."""
    hashes = F.transform(tokens, lambda t: F.xxhash64(t))

    def _vote(bit: int):
        def inner(acc, h):
            return acc + F.when(
                F.shiftright(h, bit).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1)

        return inner

    bit_exprs = []
    for bit in range(64):
        vote = F.aggregate(hashes, F.lit(0), _vote(bit))
        bit_exprs.append(
            F.when(vote > 0, F.shiftleft(F.lit(1).cast("long"), bit)).otherwise(
                F.lit(0).cast("long")
            )
        )
    out = bit_exprs[0]
    for e in bit_exprs[1:]:
        out = out.bitwiseOR(e)
    return out


def simhash_docs(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc 64-bit SimHash; near-dup candidates share the full hash or a
    16-bit chunk (4-chunk banding ⇒ catches hamming distance ≤ 3)."""
    toks = tokenize(text_col, min_len=1)
    sh = simhash64(toks)
    return documents.select(
        "doc_id",
        sh.alias("simhash"),
        *[
            F.shiftrightunsigned(sh, 16 * c).bitwiseAND(F.lit(0xFFFF)).alias(f"chunk{c}")
            for c in range(4)
        ],
    )


def ngram_jaccard_pairs(
    documents: DataFrame,
    candidate_pairs: DataFrame,
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.0,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs (doc_id_a <
    doc_id_b). Joins each side to its distinct-shingle set and computes
    |A∩B| / |A∪B| with array built-ins.

    Only ever applied to candidate pairs (LSH output), so the join fan-out
    is |candidates|, not O(n²)."""
    toks = tokenize(text_col, min_len=1)
    sets = documents.select(
        "doc_id", F.array_distinct(shingles(toks, shingle_n)).alias("sh")
    )
    a = sets.select(F.col("doc_id").alias("doc_id_a"), F.col("sh").alias("sh_a"))
    b = sets.select(F.col("doc_id").alias("doc_id_b"), F.col("sh").alias("sh_b"))
    from jobanalytics_bigdataproject_spark.functions.exact import exact_div

    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        candidate_pairs.join(a, "doc_id_a")
        .join(b, "doc_id_b")
        .select(
            "doc_id_a",
            "doc_id_b",
            F.coalesce(exact_div(inter, union, 4), F.lit(0.0)).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
