"""Text scalar helpers: tokenization, shingles, fingerprints.

Tokenization mirrors the reference's RDD word-count lambda
(code/02_RDDOperations.scala:231-246): lowercase, split on whitespace,
strip ``[^a-z]``, keep length > 2 — but as codegen'd built-ins
(explode/split/regexp_replace), never a Python lambda.

Fingerprints use ``md5`` (present in both Spark and the DuckDB oracle, so
fingerprint queries are hash-checkable end-to-end). [EXT] — the reference
has no dedup beyond dropDuplicates-by-key.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokenize(c: Column | str, min_len: int = 3) -> Column:
    """lower → split on \\s+ → strip non-letters → drop short tokens.

    Returns an ``array<string>`` column. Same semantics as the reference's
    per-row lambda (02:231-246) expressed as one codegen'd expression."""
    col = F.col(c) if isinstance(c, str) else c
    words = F.split(F.lower(F.trim(col)), r"\s+")
    cleaned = F.transform(words, lambda w: F.regexp_replace(w, "[^a-z]", ""))
    return F.filter(cleaned, lambda w: F.length(w) >= min_len)


def shingles(tokens: Column, n: int = 3) -> Column:
    """Word n-gram shingles from a token array: array of space-joined n-grams.

    Built from ``sequence`` + ``transform`` + ``slice`` — pure built-ins, no
    UDF, so shingling 100 TB of documents stays JVM-side."""
    k = F.greatest(F.size(tokens) - F.lit(n - 1), F.lit(0))
    idx = F.sequence(F.lit(1), k)
    return F.when(k > 0, F.transform(idx, lambda i: F.array_join(F.slice(tokens, i, n), " "))).otherwise(
        F.array().cast("array<string>")
    )


def fingerprint(c: Column | str) -> Column:
    """Exact-dup document fingerprint: md5 of whitespace-normalized lowercase
    text. md5 exists in both Spark and DuckDB → oracle-checkable."""
    col = F.col(c) if isinstance(c, str) else c
    return F.md5(F.regexp_replace(F.lower(F.trim(col)), r"\s+", " "))


# NOTE: MinHash/SimHash live in operators/dedup.py as explode-based
# aggregations — a higher-order-function (transform/aggregate) formulation
# was measured ~10× slower because HOF lambdas are interpreted per element,
# outside whole-stage codegen.
