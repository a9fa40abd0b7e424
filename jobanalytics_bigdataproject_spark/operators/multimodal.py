"""[EXT] Multimodal column plumbing (north-star surface; no reference
analog): images/audio/video as opaque ``binary`` columns + typed metadata,
with decode / feature-extract implemented as Arrow-batched ``mapInPandas``.

The container has no image libraries, so the *image* decoders are STUBS
behind an import-try (``NotImplementedError`` if a real decode is
requested without the library). The *audio* modality is REAL: WAV payloads
are synthesized and decoded with the stdlib ``wave`` module + numpy
(``attach_wav_payload`` / ``decode_audio``), end-to-end through the same
Arrow ``mapInPandas`` plumbing. At 100 TB the binary payloads dominate
I/O: the scan projects only (id, payload) and the extraction is a linear
``mapInPandas`` pass with no shuffle; downstream aggregations see only the
small typed metadata.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # real decoders would come from these; absent in this container
    import PIL.Image  # noqa: F401

    _HAS_PIL = True
except Exception:  # noqa: BLE001
    _HAS_PIL = False


def attach_binary_payload(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Fixture adapter: materialize an opaque binary column (UTF-8 bytes of
    the text) + typed metadata struct, the shape a real multimodal table
    would have (payload, media_type, n_bytes, checksum)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return documents.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("media_type"),
            F.octet_length(payload).alias("n_bytes"),
            F.md5(payload).alias("checksum"),
        ).alias("meta"),
    )


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.StringType()),
        T.StructField("feat", T.ArrayType(T.FloatType())),
    ]
)


def extract_features(
    media: DataFrame, dim: int = 8, real_decode: bool = False
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``real_decode=True`` requires an image library (absent here →
    NotImplementedError, clearly marked stub). The default path computes a
    deterministic fake embedding (first ``dim`` byte values / 255) so the
    whole distributed pipeline — Arrow transfer, pandas batch shapes,
    schema enforcement, downstream joins — is exercised for real."""
    if real_decode and not _HAS_PIL:
        raise NotImplementedError(
            "real media decode requires an image library (PIL) not present "
            "in this environment; stubbed per project constraints"
        )

    def batches(it: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        import hashlib

        import pandas as pd

        for pdf in it:
            payloads = pdf["payload"]
            feats = [
                [b / 255.0 for b in bytes(p[:dim]).ljust(dim, b"\0")]
                for p in payloads
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len),
                    "checksum": payloads.map(
                        lambda p: hashlib.md5(bytes(p)).hexdigest()
                    ),
                    "feat": feats,
                }
            )

    return media.select("doc_id", "payload").mapInPandas(batches, FEATURE_SCHEMA)


def media_metadata(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Pure-JVM metadata projection (no Python): the oracle-checkable part
    of the multimodal surface — byte length + checksum per payload."""
    media = attach_binary_payload(documents, text_col)
    return media.select(
        "doc_id",
        F.col("meta.media_type").alias("media_type"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.checksum").alias("checksum"),
    )


def synth_wav(seed: int, n_samples: int = 800, sample_rate: int = 8000) -> bytes:
    """Deterministic mono 16-bit PCM WAV payload (stdlib ``wave`` writer):
    a sine whose frequency derives from ``seed``. Pure function of its
    arguments, so fixtures and oracles can re-derive expectations."""
    import io
    import math
    import wave

    freq = 100.0 + (seed % 32) * 25.0
    amp = 12000 + (seed % 7) * 2000
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        frames = bytearray()
        for i in range(n_samples):
            v = int(amp * math.sin(2.0 * math.pi * freq * i / sample_rate))
            frames += v.to_bytes(2, "little", signed=True)
        w.writeframes(bytes(frames))
    return buf.getvalue()


def attach_wav_payload(
    documents: DataFrame, n_samples: int = 800, sample_rate: int = 8000
) -> DataFrame:
    """Fixture adapter for the audio modality: one deterministic WAV per
    doc (seeded by doc_id) as an opaque binary column. Arrow-batched
    ``mapInPandas`` so payload synthesis distributes like a real ingest."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def batches(it: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [
                        synth_wav(int(d), n_samples, sample_rate)
                        for d in pdf["doc_id"]
                    ],
                }
            )

    return documents.select("doc_id").mapInPandas(batches, schema)


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_sec", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.IntegerType()),
        T.StructField("feat", T.ArrayType(T.FloatType())),
    ]
)


def decode_audio(media: DataFrame, n_chunks: int = 8) -> DataFrame:
    """REAL audio decode — no stub: parses each WAV payload with the
    stdlib ``wave`` reader inside Arrow-batched ``mapInPandas`` and emits
    typed metadata (channels/rate/duration) plus a per-chunk RMS feature
    vector (numpy over the PCM samples). Linear pass, no shuffle; only
    (doc_id, payload) is projected into Python, so at 100 TB the cost is
    the payload transfer itself — exactly what a real media pipeline pays.

    Not SQL-expressible (binary container parsing) → rows-only driver
    check, per SURVEY.md §5.3.
    """

    def batches(it: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        import io
        import wave

        import numpy as np
        import pandas as pd

        rows: dict[str, list] = {f.name: [] for f in AUDIO_SCHEMA.fields}
        for pdf in it:
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
                    nch, width, rate = (
                        w.getnchannels(),
                        w.getsampwidth(),
                        w.getframerate(),
                    )
                    nframes = w.getnframes()
                    raw = w.readframes(nframes)
                dtype = {1: np.int8, 2: np.int16, 4: np.int32}[width]
                samples = np.frombuffer(raw, dtype=dtype).astype(np.float64)
                chunks = np.array_split(samples, n_chunks) if len(samples) else []
                rows["doc_id"].append(doc_id)
                rows["n_channels"].append(nch)
                rows["sample_rate"].append(rate)
                rows["n_samples"].append(len(samples))
                rows["duration_sec"].append(nframes / rate if rate else 0.0)
                rows["rms"].append(
                    float(np.sqrt(np.mean(samples**2))) if len(samples) else 0.0
                )
                rows["peak"].append(
                    int(np.max(np.abs(samples))) if len(samples) else 0
                )
                rows["feat"].append(
                    [
                        float(np.sqrt(np.mean(c**2))) if len(c) else 0.0
                        for c in chunks
                    ]
                )
            yield pd.DataFrame(rows)
            rows = {f.name: [] for f in AUDIO_SCHEMA.fields}

    return media.select("doc_id", "payload").mapInPandas(batches, AUDIO_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("thumb", T.BinaryType()),
        T.StructField("thumb_bytes", T.LongType()),
    ]
)


def resize_stub(media: DataFrame, target_bytes: int = 64, real_decode: bool = False) -> DataFrame:
    """Image-resize plumbing: mapInPandas over payloads producing a
    'thumbnail' binary column. STUB transform (deterministic byte
    truncation) — a real implementation swaps the inner function for a
    PIL resize; schema/batching/partitioning are the real thing."""
    if real_decode and not _HAS_PIL:
        raise NotImplementedError(
            "real image resize requires PIL; stubbed per project constraints"
        )

    def batches(it: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in it:
            thumbs = pdf["payload"].map(lambda p: bytes(p[:target_bytes]))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "thumb": thumbs,
                    "thumb_bytes": thumbs.map(len),
                }
            )

    return media.select("doc_id", "payload").mapInPandas(batches, RESIZE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def frame_sample_stub(
    media: DataFrame, frame_size: int = 32, every_nth: int = 4, max_frames: int = 8
) -> DataFrame:
    """Video frame-sampling plumbing: one payload row fans out to N frame
    rows (mapInPandas may emit more rows than it receives — the exact
    shape a real decoder needs). STUB: fixed-size byte windows at a
    stride; a real implementation swaps in an actual demuxer."""

    def batches(it: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in it:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                for k in range(max_frames):
                    start = k * frame_size * every_nth
                    if start >= len(raw):
                        break
                    ids.append(doc_id)
                    idxs.append(k)
                    frames.append(raw[start : start + frame_size])
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return media.select("doc_id", "payload").mapInPandas(batches, FRAME_SCHEMA)
