"""[EXT] Event-time window operators over the ``events`` table
(SURVEY.md §2.11 — absent from the batch-only reference; nearest analog is
its epoch-ms timestamp decomposition, code/01_DataPreprocessing.scala:52-63).

Every operator is written against a plain DataFrame: ``F.window`` /
``F.session_window`` compute identically in batch and streaming, so the
batch path is oracle-checkable (DuckDB time_bucket / gaps-and-islands) and
the *same function* applied to a ``readStream`` frame gives the streaming
behavior. ``with_watermark`` is the only streaming-specific wrapper.

Scale: windowed aggregations shuffle on (window, keys) — bounded state per
watermark; session windows use Spark's native session merge. JSON props
extraction is a per-row JsonPath eval, linear scan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jobanalytics_bigdataproject_spark.functions.exact import money_sum


def tumbling_window_agg(
    events: DataFrame,
    window_len: str = "10 minutes",
    ts_col: str = "ts",
    keys: Sequence[str] = ("event_type",),
) -> DataFrame:
    """Tumbling event-time windows: count + value stats per (window, keys).
    Window start is emitted as a formatted string so results hash identically
    across engines (SURVEY.md §5.3 timestamp caution)."""
    w = F.window(F.col(ts_col), window_len)
    return (
        events.groupBy(w.alias("w"), *keys)
        .agg(
            F.count("*").alias("event_count"),
            money_sum("value").alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            *keys,
            "event_count",
            "total_value",
        )
    )


def sliding_window_agg(
    events: DataFrame,
    window_len: str = "10 minutes",
    slide: str = "5 minutes",
    ts_col: str = "ts",
    keys: Sequence[str] = ("event_type",),
) -> DataFrame:
    """Sliding windows: each event lands in window_len/slide windows."""
    w = F.window(F.col(ts_col), window_len, slide)
    return (
        events.groupBy(w.alias("w"), *keys)
        .agg(
            F.count("*").alias("event_count"),
            money_sum("value").alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            *keys,
            "event_count",
            "total_value",
        )
    )


def session_window_agg(
    events: DataFrame,
    gap: str = "5 minutes",
    ts_col: str = "ts",
    key: str = "user_id",
) -> DataFrame:
    """Session windows: per-key sessions closed after ``gap`` of silence.
    Uses Spark's native ``session_window`` (dynamic merge in streaming;
    batch semantics == classic gaps-and-islands, which is what the DuckDB
    oracle replays)."""
    w = F.session_window(F.col(ts_col), gap)
    return (
        events.groupBy(w.alias("w"), key)
        .agg(
            F.count("*").alias("event_count"),
            money_sum("value").alias("total_value"),
        )
        .select(
            F.col(key),
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "event_count",
            "total_value",
        )
    )


def json_props_extract(
    events: DataFrame, props_col: str = "props", key: str = "k"
) -> DataFrame:
    """JSON property extraction (F.get_json_object) + typed cast — the
    [EXT] map/JSON surface (SURVEY.md §2.8 note)."""
    return events.select(
        "event_id",
        "event_type",
        F.get_json_object(F.col(props_col), f"$.{key}").cast("long").alias(f"prop_{key}"),
    )


def with_watermark(
    events: DataFrame, delay: str = "1 hour", ts_col: str = "ts"
) -> DataFrame:
    """Late-data bound for streaming aggregations: state for a window is
    dropped once the event-time watermark passes window_end + delay."""
    return events.withWatermark(ts_col, delay)


def dedup_stream(
    events: DataFrame,
    keys: Sequence[str] = ("event_id",),
    delay: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """[EXT] Streaming exact dedup: ``dropDuplicatesWithinWatermark`` keeps
    one row per key among events whose event times fall within the
    watermark delay of each other, and — unlike plain ``dropDuplicates``
    on a stream — DROPS key state once the watermark passes, so state is
    bounded by (keys seen per delay window), not keys-ever-seen. This is
    the streaming-ingest half of exact dedup for a training-data pipeline
    (the batch half is operators/dedup.dedup_exact: at 100 TB, dedup the
    firehose with this, the corpus with that)."""
    return events.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        list(keys)
    )


def stream_from_directory(
    spark,
    path: str,
    schema,
    fmt: str = "parquet",
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-source stream: replays a directory as a micro-batch stream —
    how the batch fixtures double as streaming tests."""
    return (
        spark.readStream.format(fmt)
        .schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(path)
    )


def read_events_stream(spark, path: str, max_files_per_trigger: int = 1) -> DataFrame:
    """Streaming reader for the ``events`` fixture layout. A stream source
    needs a declared schema, but the fixture's physical ts encoding has two
    generations — TIMESTAMP(NANOS) (a long under nanosAsLong) and
    TIMESTAMP(MICROS, isAdjustedToUTC=false) (TIMESTAMP_NTZ) — so probe the
    directory's footer with a one-off batch read (metadata-only, no data
    scan) and declare the matching schema + conversion, mirroring
    sources/readers.read_table's batch path exactly: mixing them up shifts
    every event time by 10^3 (the 1970-01-20 failure mode)."""
    from pyspark.sql import types as T

    ts_type = dict(spark.read.parquet(path).dtypes).get("ts")
    ts_field = T.LongType() if ts_type == "bigint" else T.TimestampNTZType()
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_field),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    raw = stream_from_directory(spark, path, schema, "parquet", max_files_per_trigger)
    if ts_type == "bigint":
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # session pinned to UTC (readers._ensure_session_conf) ⇒ value-preserving
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))
