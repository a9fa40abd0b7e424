"""[EXT] Persisted classifier stores — fit once, score on arrival
(VERDICT r9 #2): the steady state every production corpus pipeline
(FineWeb, CCNet) actually runs, applied to the two distilled models
this engine trains (`ml/quality.py`, `ml/language.py`).

The engine spent rounds 8-9 converting the dedup family to
fit-once/probe-on-arrival (shingle store, band store, IVF/vamana
append); this module gives the MODEL family the same shape:

- ``save_quality_model`` / ``save_language_model`` fit and persist the
  ``PipelineModel`` via MLlib's native writer (a directory of parquet
  coefficient/metadata files — readable by any Spark cluster) beside a
  ``_model_meta.json`` sidecar recording kind, fit params, label
  cutoffs / class mapping, and the fit time.
- ``score_quality`` / ``score_language`` load (with a per-process cache
  — the model is KB-to-MB scale, the load is driver-side metadata) and
  run the STATELESS scoring pass on any corpus: no percentile scan, no
  IDF fit, no LR iterations — one transform.
- ``quality_score_sink`` / ``language_id_sink`` are foreachBatch
  scorers with exactly-once snapshot commits (the ``snapshots.
  snapshot_sink`` batch-id idempotency contract): score-on-arrival for
  a document stream.
- ``refresh`` refits from a corpus path when the stored model is older
  than ``max_age_s`` — wired into ``maintenance.maintain(model_stores=
  ...)`` so the nightly table service owns model freshness the same way
  it owns compaction debt.
- ``model_detail`` is the DESCRIBE DETAIL-style telemetry twin of
  ``bucket_store.store_detail``.

Storage layout::

    <store>/_model_meta.json   # kind, params, cuts/langs, fitted_utc
    <store>/pipeline/          # PipelineModel.save (native MLlib)

All filesystem access goes through the Hadoop FileSystem API, so the
store lives wherever the cluster's warehouse does (local, HDFS, object
store). The fit itself is the documented distributed path in
`ml/quality.py` / `ml/language.py`; this module adds zero per-row
Python.

No counterpart in the reference (its MLlib phase fits in-session and
exits, code/04_MachineLearning.scala:88-326); this is the [EXT]
serving half.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession

from jobanalytics_bigdataproject_spark.sources import sidecar

_META = "_model_meta.json"

_fs = sidecar.fs_for  # shared py4j FileSystem triple (sources/sidecar.py)


def _write_meta(spark: SparkSession, store_dir: str, meta: dict) -> None:
    sidecar.write_json(spark, f"{store_dir}/{_META}", meta)


def read_meta(spark: SparkSession, store_dir: str) -> dict:
    try:
        return sidecar.read_json(spark, f"{store_dir}/{_META}")
    except FileNotFoundError:
        raise FileNotFoundError(
            f"no model store at {store_dir} (missing {_META}) — "
            "save_quality_model/save_language_model first"
        ) from None


# fitted models are immutable once written (refresh overwrites the whole
# store); the cache key carries fitted_utc so a refresh in THIS process
# invalidates naturally, and a refresh by another process is picked up on
# the next read_meta (every score call re-reads the tiny sidecar)
_MODEL_CACHE: dict[tuple[str, float], object] = {}


def _load_pipeline(spark: SparkSession, store_dir: str, meta: dict):
    from pyspark.ml import PipelineModel

    key = (store_dir.rstrip("/"), float(meta["fitted_utc"]))
    model = _MODEL_CACHE.get(key)
    if model is None:
        model = PipelineModel.load(f"{store_dir}/pipeline")
        # drop superseded fits for this store: a long-lived scorer process
        # spanning many refreshes must not pin every old coefficient set
        for k in [k for k in _MODEL_CACHE if k[0] == key[0]]:
            del _MODEL_CACHE[k]
        _MODEL_CACHE[key] = model
    return model


def _staged_pipeline_save(spark: SparkSession, model, store_dir: str) -> None:
    """Persist the PipelineModel via write-then-swap, NOT an in-place
    overwrite: a refresh on a live store must not delete the pipeline
    directory while a concurrent scorer is mid-``PipelineModel.load``
    (ADVICE-style crash window). The model writes to ``pipeline__staging``
    first; the swap is two renames (live → old, staging → live) with
    undo, so a reader resolves either the old or the new fit — the
    remaining window is the instant between the renames, which a loading
    reader survives by retrying (load errors are loud, never a mixed
    coefficient set). Same choreography as ``bucket_store.compact``."""
    staging = f"{store_dir}/pipeline__staging"
    live = f"{store_dir}/pipeline"
    old = f"{store_dir}/pipeline__old"
    fs, _, jvm = _fs(spark, store_dir)
    Path = jvm.org.apache.hadoop.fs.Path
    for p in (staging, old):
        if fs.exists(Path(p)):
            fs.delete(Path(p), True)
    model.write().overwrite().save(staging)
    if fs.exists(Path(live)):
        if not fs.rename(Path(live), Path(old)):
            raise IOError(f"model store: could not stage out {live}")
    if not fs.rename(Path(staging), Path(live)):
        if fs.exists(Path(old)):
            fs.rename(Path(old), Path(live))  # undo — old model intact
        raise IOError(
            f"model store: could not swap in {staging}; prior model restored"
        )
    if fs.exists(Path(old)):
        fs.delete(Path(old), True)


def save_quality_model(
    documents: DataFrame,
    store_dir: str,
    n_features: int = 1 << 15,
    train_bp: int = 8000,
    salt: str = "split:v1",
) -> dict:
    """Fit the distilled quality classifier on *documents* and persist it
    at *store_dir*; returns the meta dict. Replaces any prior model
    there via the staged swap (refresh = re-save)."""
    from jobanalytics_bigdataproject_spark.ml.quality import fit_quality_pipeline

    spark = documents.sparkSession
    model, (lo, hi) = fit_quality_pipeline(documents, n_features, train_bp, salt)
    _staged_pipeline_save(spark, model, store_dir)
    meta = {
        "kind": "quality",
        "format": 1,
        "fitted_utc": time.time(),
        "params": {
            "n_features": int(n_features),
            "train_bp": int(train_bp),
            "salt": salt,
        },
        "cuts": [float(lo), float(hi)],
    }
    _write_meta(spark, store_dir, meta)
    return meta


def score_quality(
    spark: SparkSession, documents: DataFrame, store_dir: str
) -> DataFrame:
    """Score *documents* with the STORED quality model — the stateless
    steady-state pass (no percentile scan, no IDF fit, no LR
    iterations). Same output columns as ``doc_quality_classifier``."""
    from jobanalytics_bigdataproject_spark.ml.quality import score_quality_with

    meta = read_meta(spark, store_dir)
    if meta["kind"] != "quality":
        raise ValueError(
            f"model store at {store_dir} holds a {meta['kind']!r} model, "
            "not a quality model"
        )
    model = _load_pipeline(spark, store_dir, meta)
    p = meta["params"]
    return score_quality_with(
        model, tuple(meta["cuts"]), documents, p["train_bp"], p["salt"]
    )


def save_language_model(
    documents: DataFrame,
    store_dir: str,
    text_col: str = "text",
    label_col: str | None = None,
    n_features: int = 1 << 12,
    ngram: int = 3,
    min_hits: int = 2,
    min_prob: float = 0.5,
    train_bp: int = 8000,
    salt: str = "langsplit:v1",
) -> dict:
    """Fit the distilled language classifier on *documents* and persist
    it; returns the meta dict. A degenerate corpus (fewer than 2
    confident classes in the train split) is REFUSED loudly — the
    heuristic is the answer there and persisting nothing silently would
    leave a store that scores differently than the caller believes."""
    from jobanalytics_bigdataproject_spark.ml.language import fit_language_pipeline

    spark = documents.sparkSession
    fitted = fit_language_pipeline(
        documents, text_col, label_col, n_features, ngram, min_hits, train_bp, salt
    )
    if fitted is None:
        raise ValueError(
            "save_language_model: corpus has < 2 confident language classes "
            "in the train split — no decision boundary to learn; use the "
            "heuristic (operators/text.language_id) directly instead of a "
            "stored model"
        )
    model, langs = fitted
    _staged_pipeline_save(spark, model, store_dir)
    meta = {
        "kind": "language",
        "format": 1,
        "fitted_utc": time.time(),
        "params": {
            "text_col": text_col,
            "label_col": label_col,
            "n_features": int(n_features),
            "ngram": int(ngram),
            "min_hits": int(min_hits),
            "min_prob": float(min_prob),
            "train_bp": int(train_bp),
            "salt": salt,
        },
        "langs": list(langs),
    }
    _write_meta(spark, store_dir, meta)
    return meta


def score_language(
    spark: SparkSession, documents: DataFrame, store_dir: str
) -> DataFrame:
    """Score *documents* with the STORED language model (heuristic
    fallback included — it is part of the serving contract, not the
    training loop). Same output columns as ``doc_language_classifier``."""
    from jobanalytics_bigdataproject_spark.ml.language import score_language_with

    meta = read_meta(spark, store_dir)
    if meta["kind"] != "language":
        raise ValueError(
            f"model store at {store_dir} holds a {meta['kind']!r} model, "
            "not a language model"
        )
    model = _load_pipeline(spark, store_dir, meta)
    p = meta["params"]
    # label_col is a FIT-time concern only (it feeds training labels,
    # which the scoring output never reads) — replaying it at score time
    # would refuse every unlabeled arrival batch, the exact corpus a
    # stored model exists to serve. Pass it through only when the batch
    # actually carries the column (keeps the store==fresh-fit
    # equivalence bit-exact on the labeled fit corpus).
    lc = p["label_col"] if p["label_col"] in (documents.columns or []) else None
    return score_language_with(
        model, meta["langs"], documents, p["text_col"], lc,
        p["min_hits"], p["min_prob"], p["train_bp"], p["salt"],
    )


def score(spark: SparkSession, documents: DataFrame, store_dir: str) -> DataFrame:
    """Kind-dispatched scoring — what a generic serving layer calls."""
    meta = read_meta(spark, store_dir)
    if meta["kind"] == "quality":
        return score_quality(spark, documents, store_dir)
    if meta["kind"] == "language":
        return score_language(spark, documents, store_dir)
    raise ValueError(f"unknown model kind {meta['kind']!r} at {store_dir}")


def quality_score_sink(spark: SparkSession, store_dir: str, out_table: str):
    """Structured Streaming sink: ``.writeStream.foreachBatch(
    quality_score_sink(spark, store, table))`` — score-on-arrival for a
    document stream against the PERSISTED quality model. Each micro-
    batch is one stateless transform (the model never refits in the hot
    path — ``maintain``/``refresh`` owns that), committed to a versioned
    snapshot table with the batch id as idempotency key (exactly-once
    output, the ``snapshots.snapshot_sink`` contract)."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        from jobanalytics_bigdataproject_spark.sources import snapshots as sn

        scored = score_quality(spark, batch_df, store_dir)
        sn.write_snapshot(
            scored, out_table, mode="append",
            idempotency_key=f"quality-score-{batch_id}",
        )

    return _write


def language_id_sink(spark: SparkSession, store_dir: str, out_table: str):
    """foreachBatch twin of ``quality_score_sink`` for the stored
    language model — same exactly-once contract."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        from jobanalytics_bigdataproject_spark.sources import snapshots as sn

        scored = score_language(spark, batch_df, store_dir)
        sn.write_snapshot(
            scored, out_table, mode="append",
            idempotency_key=f"language-id-{batch_id}",
        )

    return _write


def refresh(
    spark: SparkSession,
    store_dir: str,
    corpus_path: str,
    max_age_s: float | None = None,
) -> bool:
    """Refit the stored model from the parquet corpus at *corpus_path*
    when it is older than ``max_age_s`` seconds (``None`` = refit
    unconditionally). The refit reuses the STORED fit params, so a
    refresh never silently changes the operating point — change params
    by calling ``save_*_model`` explicitly. Returns True when a refit
    happened. This is the ``maintain(model_stores=...)`` hook.

    Concurrency: the refit lands via ``_staged_pipeline_save``'s
    rename swap, so a scorer loading during the refresh resolves the
    old or the new fit, never a half-written directory; the meta
    sidecar (with the new ``fitted_utc`` cache key) is written only
    after the swap completes."""
    meta = read_meta(spark, store_dir)
    if max_age_s is not None and time.time() - meta["fitted_utc"] <= max_age_s:
        return False
    corpus = spark.read.parquet(corpus_path)
    p = meta["params"]
    if meta["kind"] == "quality":
        save_quality_model(
            corpus, store_dir, p["n_features"], p["train_bp"], p["salt"]
        )
    elif meta["kind"] == "language":
        save_language_model(
            corpus, store_dir, p["text_col"], p["label_col"], p["n_features"],
            p["ngram"], p["min_hits"], p["min_prob"], p["train_bp"], p["salt"],
        )
    else:
        raise ValueError(f"unknown model kind {meta['kind']!r} at {store_dir}")
    return True


def model_detail(spark: SparkSession, store_dir: str) -> dict:
    """DESCRIBE DETAIL-style telemetry for a model store (the
    ``bucket_store.store_detail`` twin): kind, fit params, age, and the
    on-disk footprint of the persisted pipeline — driver-side metadata
    only, no data I/O."""
    meta = read_meta(spark, store_dir)
    fs, _, jvm = _fs(spark, store_dir)
    p = jvm.org.apache.hadoop.fs.Path(f"{store_dir}/pipeline")
    nbytes = int(fs.getContentSummary(p).getLength()) if fs.exists(p) else 0
    return {
        "path": store_dir,
        "kind": meta["kind"],
        "params": dict(meta["params"]),
        "fitted_utc": meta["fitted_utc"],
        "age_s": time.time() - meta["fitted_utc"],
        "pipeline_bytes": nbytes,
        **({"cuts": meta["cuts"]} if "cuts" in meta else {}),
        **({"langs": meta["langs"]} if "langs" in meta else {}),
    }
