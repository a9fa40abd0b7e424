"""Pure-numpy baseline JPEG codec (operators/jpeg.py) + MJPEG tier.

No image library exists in this environment, so the suite avoids the
"inverse bugs cancel" trap three ways: (1) the DCT matrix is checked for
orthogonality on its own (encode's FDCT and decode's IDCT are then exact
inverses BY ALGEBRA, not by fiat); (2) a solid-gray image has a
hand-derivable pixel value through the whole pipeline (only the DC
coefficient survives, quantization arithmetic done on paper in the test);
(3) the emitted byte stream is validated against the T.81 marker grammar
structurally (segment lengths, stuffing, table counts), which an
encoder-side bug cannot co-conspire with.
"""

from __future__ import annotations

import numpy as np
import pytest

from jobanalytics_bigdataproject_spark.operators import jpeg, multimodal


def test_dct_matrix_is_orthogonal():
    A = jpeg._dct_matrix()
    assert np.allclose(A @ A.T, np.eye(8), atol=1e-12)


def test_annex_k_tables_form_valid_prefix_codes():
    for bits, vals in (
        (jpeg.DC_LUMA_BITS, jpeg.DC_LUMA_VALS),
        (jpeg.DC_CHROMA_BITS, jpeg.DC_CHROMA_VALS),
        (jpeg.AC_LUMA_BITS, jpeg.AC_LUMA_VALS),
        (jpeg.AC_CHROMA_BITS, jpeg.AC_CHROMA_VALS),
    ):
        codes = jpeg._canonical_codes(bits, vals)
        # prefix-free: no code is a prefix of another
        as_strings = sorted(
            format(c, f"0{ln}b") for c, ln in codes.values()
        )
        for a, b in zip(as_strings, as_strings[1:]):
            assert not b.startswith(a), (a, b)
    assert len(jpeg.AC_LUMA_VALS) == 162  # Annex K symbol count
    assert len(jpeg.AC_CHROMA_VALS) == 162


def test_solid_gray_hand_derived_pixel():
    """g=130: Y=130 everywhere, level shift -> 2, DC = 8*2 = 16 (orthonormal
    2D DCT sums 64 cells * 2 * (1/8)). Quality 85 scales q[0,0]=16 by
    s=200-170=30 -> (16*30+50)//100 = 5. Quantized DC = round(16/5) = 3;
    decoded DC = 15 -> pixel 128 + 15/8 = 129.875 -> 130 after rounding.
    Every pixel must equal exactly 130 — no tolerance."""
    px = np.full((16, 16, 3), 130, dtype=np.uint8)
    dec = jpeg.decode_jpeg(jpeg.encode_jpeg(px, quality=85))
    assert (dec == 130).all()


def test_roundtrip_psnr_on_gradient():
    g = np.zeros((24, 40, 3), dtype=np.uint8)
    yy, xx = np.mgrid[0:24, 0:40]
    g[..., 0] = (xx * 6) % 256
    g[..., 1] = (yy * 9) % 256
    g[..., 2] = ((xx + yy) * 4) % 256
    dec = jpeg.decode_jpeg(jpeg.encode_jpeg(g, quality=90))
    mse = ((dec.astype(float) - g.astype(float)) ** 2).mean()
    psnr = 10 * np.log10(255**2 / mse)
    assert psnr > 35.0, psnr  # smooth content at q90 should be near-lossless


def test_non_multiple_of_8_dims_and_quality_dial():
    rng = np.random.default_rng(42)
    n = rng.integers(0, 256, (17, 23, 3), dtype=np.uint8)
    dec = jpeg.decode_jpeg(jpeg.encode_jpeg(n, quality=75))
    assert dec.shape == (17, 23, 3)
    sizes = [len(jpeg.encode_jpeg(n, q)) for q in (10, 50, 90)]
    assert sizes == sorted(sizes), sizes  # more quality, more bytes
    # lower quality -> coarser quantization -> strictly worse error
    err = [
        np.abs(jpeg.decode_jpeg(jpeg.encode_jpeg(n, q)).astype(float) - n).mean()
        for q in (10, 90)
    ]
    assert err[0] > err[1]


def test_byte_stuffing_roundtrip():
    """An image engineered to emit 0xFF bytes in the entropy stream must
    survive the stuff/de-stuff path. High-frequency noise at low quality
    reliably produces 0xFF entropy bytes; assert at least one stuffed pair
    actually exists so the test cannot silently stop covering the path."""
    rng = np.random.default_rng(7)
    n = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    raw = jpeg.encode_jpeg(n, quality=25)
    assert b"\xff\x00" in raw, "fixture no longer exercises byte stuffing"
    dec = jpeg.decode_jpeg(raw)
    assert dec.shape == (32, 32, 3)


def test_marker_grammar_structurally_valid():
    import struct

    raw = jpeg.encode_jpeg(np.full((8, 8, 3), 99, dtype=np.uint8), 85)
    assert raw[:2] == b"\xff\xd8" and raw[-2:] == b"\xff\xd9"
    pos, seen = 2, []
    while True:
        assert raw[pos] == 0xFF
        marker = raw[pos + 1]
        seen.append(marker)
        if marker == 0xDA:
            break
        (ln,) = struct.unpack_from(">H", raw, pos + 2)
        pos += 2 + ln
    assert seen.count(0xDB) == 2 and seen.count(0xC4) == 4  # 2 DQT, 4 DHT
    assert 0xC0 in seen  # SOF0 baseline


def test_decode_rejects_unsupported_modes():
    raw = bytearray(jpeg.encode_jpeg(np.full((8, 8, 3), 50, np.uint8), 85))
    idx = raw.find(b"\xff\xc0")
    raw[idx + 1] = 0xC3  # rebrand SOF0 as lossless sequential
    with pytest.raises(ValueError, match="SOF"):
        jpeg.decode_jpeg(bytes(raw))
    with pytest.raises(ValueError, match="SOI"):
        jpeg.decode_jpeg(b"not a jpeg")
    # a baseline stream rebranded SOF2 routes to the progressive path,
    # whose scan validation must refuse the Ss=0/Se=63 baseline scan
    # header loudly (not mis-decode it as a DC scan)
    raw[idx + 1] = 0xC2
    with pytest.raises(ValueError, match="Ss=0"):
        jpeg.decode_jpeg(bytes(raw))


def test_jpeg_end_walks_concatenated_stream():
    a = jpeg.encode_jpeg(multimodal.synth_frame_pixels(1), 85)
    b = jpeg.encode_jpeg(multimodal.synth_frame_pixels(2, 24, 16), 60)
    s = a + b
    e1 = jpeg.jpeg_end(s, 0)
    assert e1 == len(a) and s[e1 : e1 + 2] == b"\xff\xd8"
    assert jpeg.jpeg_end(s, e1) == len(s)
    with pytest.raises(ValueError, match="truncated"):
        jpeg.jpeg_end(a[:-4], 0)


def test_synth_mjpeg_deterministic_and_decodable():
    s1 = multimodal.synth_mjpeg(5, n_frames=3)
    assert s1 == multimodal.synth_mjpeg(5, n_frames=3)
    pos = 0
    for i in range(3):
        end = jpeg.jpeg_end(s1, pos)
        px = jpeg.decode_jpeg(s1[pos:end])
        ref = multimodal.synth_frame_pixels(5 * 1000 + i)
        assert px.shape == ref.shape
        # q85 on this synthetic pattern: decode stays close to source
        assert np.abs(px.astype(float) - ref.astype(float)).mean() < 12.0
        pos = end
    assert pos == len(s1)


def test_mjpeg_frame_sample_and_features(spark):
    docs = spark.range(0, 6).selectExpr("id as doc_id")
    media = multimodal.attach_mjpeg_payload(docs, n_frames=6, quality=85)
    frames = multimodal.frame_sample_mjpeg(media, every_nth=2, max_frames=3)
    got = frames.groupBy("doc_id").count().collect()
    assert len(got) == 6 and all(r["count"] == 3 for r in got)
    # each emitted frame is itself a complete, decodable JPEG
    one = frames.filter("doc_id = 4 and frame_idx = 2").first()
    px = jpeg.decode_jpeg(bytes(one["frame"]))
    ref = multimodal.synth_frame_pixels(4 * 1000 + 2)
    assert px.shape == ref.shape
    assert np.abs(px.astype(float) - ref.astype(float)).mean() < 12.0

    feats = multimodal.mjpeg_frame_features(media, every_nth=2, max_frames=3)
    rows = {(r.doc_id, r.frame_idx): r for r in feats.collect()}
    assert len(rows) == 18
    # pinned against an independent local decode of the same pure fixture
    r = rows[(4, 2)]
    raw = multimodal.synth_mjpeg(4, n_frames=6)
    pos = 0
    for _ in range(2):
        pos = jpeg.jpeg_end(raw, pos)
    local = jpeg.decode_jpeg(raw[pos : jpeg.jpeg_end(raw, pos)]).astype(float)
    assert r.width == 16 and r.height == 12
    assert r.mean_r == pytest.approx(local[..., 0].mean(), abs=1e-9)
    luma = 0.299 * local[..., 0] + 0.587 * local[..., 1] + 0.114 * local[..., 2]
    assert r.mean_luma == pytest.approx(luma.mean(), abs=1e-9)
    assert r.luma_std == pytest.approx(luma.std(), abs=1e-9)


def test_420_subsampled_roundtrip():
    """4:2:0 — what real MJPEG cameras emit: the decoder's sampling-factor
    + chroma-upsample path gets a real stream, not just 4:4:4. Smooth
    chroma survives 2x2 decimation; luma detail is untouched."""
    g = np.zeros((24, 40, 3), dtype=np.uint8)
    yy, xx = np.mgrid[0:24, 0:40]
    g[..., 0] = (xx * 5) % 256
    g[..., 1] = (yy * 7) % 256
    g[..., 2] = 90
    raw = jpeg.encode_jpeg(g, quality=90, subsampling="420")
    # SOF declares 2x2 Y sampling
    idx = raw.find(b"\xff\xc0")
    assert raw[idx + 11] == 0x22, hex(raw[idx + 11])
    dec = jpeg.decode_jpeg(raw)
    assert dec.shape == (24, 40, 3)
    mse = ((dec.astype(float) - g.astype(float)) ** 2).mean()
    psnr = 10 * np.log10(255**2 / mse)
    assert psnr > 30.0, psnr
    # 4:2:0 must be materially smaller than 4:4:4 at the same quality
    assert len(raw) < len(jpeg.encode_jpeg(g, quality=90, subsampling="444"))


def test_420_non_multiple_of_16_dims():
    rng = np.random.default_rng(11)
    n = rng.integers(0, 256, (19, 21, 3), dtype=np.uint8)
    dec = jpeg.decode_jpeg(jpeg.encode_jpeg(n, quality=80, subsampling="420"))
    assert dec.shape == (19, 21, 3)


def test_restart_intervals_roundtrip():
    """DRI/RSTn: markers every 2 MCUs, DC predictors reset per interval —
    exercises the decoder's restart segmentation, which 0-DRI streams
    never touch. Result must be identical to the no-restart encode."""
    g = np.zeros((16, 48, 3), dtype=np.uint8)
    yy, xx = np.mgrid[0:16, 0:48]
    g[..., 0] = (xx * 11) % 256
    g[..., 1] = (yy * 13) % 256
    g[..., 2] = ((xx * yy) // 3) % 256
    raw = jpeg.encode_jpeg(g, quality=85, restart_interval=2)
    assert b"\xff\xdd" in raw  # DRI segment present
    assert any(bytes([0xFF, 0xD0 + m]) in raw for m in range(8))
    dec_rst = jpeg.decode_jpeg(raw)
    dec_plain = jpeg.decode_jpeg(jpeg.encode_jpeg(g, quality=85))
    assert np.array_equal(dec_rst, dec_plain)
    # jpeg_end must walk an RST-bearing stream too (MJPEG demux path)
    two = raw + jpeg.encode_jpeg(g, quality=50, subsampling="420", restart_interval=1)
    e1 = jpeg.jpeg_end(two, 0)
    assert e1 == len(raw) and jpeg.jpeg_end(two, e1) == len(two)


def test_420_with_restarts_composed():
    rng = np.random.default_rng(5)
    n = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    raw = jpeg.encode_jpeg(n, quality=70, subsampling="420", restart_interval=1)
    dec = jpeg.decode_jpeg(raw)
    assert dec.shape == (32, 32, 3)
    # same pixels as the unrestarted 4:2:0 stream (predictor resets are
    # an encoding detail, not a pixel-path one)
    dec2 = jpeg.decode_jpeg(jpeg.encode_jpeg(n, quality=70, subsampling="420"))
    assert np.array_equal(dec, dec2)


def test_video_near_dups_finds_reencodes_only(spark):
    """Video near-dup bridge: doc pairs sharing content (seed_mod planting
    — same frames, one re-encoded at lower quality) must pair up; distinct
    content must not. Candidates come from the per-frame chunk-pigeonhole
    bucket join, verified by aligned zip_with hamming."""
    docs = spark.range(0, 8).selectExpr("id as doc_id")
    # seeds: doc_id % 4 -> (0,4), (1,5), (2,6), (3,7) are re-encode pairs
    media = multimodal.attach_mjpeg_payload(docs, n_frames=6, seed_mod=4)
    # measured fixture separation: re-encode frames land 0-4 bits apart,
    # distinct content 27-36 — min_frame_frac=0.6 (2 of 3 frames within
    # the pigeonhole-exact bound) keeps candidates guaranteed and the
    # verdict margin wide on both sides
    pairs = {
        (r.id_a, r.id_b)
        for r in multimodal.video_near_dup_pairs(
            media, every_nth=2, max_frames=3, max_hamming=3, min_frame_frac=0.6
        ).collect()
    }
    assert pairs == {(0, 4), (1, 5), (2, 6), (3, 7)}, pairs


def test_video_signatures_shape_and_determinism(spark):
    docs = spark.range(0, 3).selectExpr("id as doc_id")
    media = multimodal.attach_mjpeg_payload(docs, n_frames=6)
    s1 = {r.doc_id: list(r.frame_hashes) for r in
          multimodal.mjpeg_video_signatures(media, every_nth=2, max_frames=3).collect()}
    s2 = {r.doc_id: list(r.frame_hashes) for r in
          multimodal.mjpeg_video_signatures(media, every_nth=2, max_frames=3).collect()}
    assert s1 == s2 and all(len(v) == 3 for v in s1.values())


def test_curate_video_corpus_dedups_clusters_and_gates_quality(spark):
    """Composed curation: a 3-clip duplicate CLUSTER (A~B~C via seed_mod)
    must collapse to its min-id representative (pairwise logic alone
    would leave 1.5 survivors on average), and a planted blank clip must
    fall to the luma-variation gate."""
    import pandas as pd

    from pyspark.sql import types as T

    docs = spark.range(0, 9).selectExpr("id as doc_id")
    # seed_mod=3 -> clusters {0,3,6}, {1,4,7}, {2,5,8}
    media = multimodal.attach_mjpeg_payload(docs, n_frames=6, seed_mod=3)
    # plant a blank (solid-color) video as doc 100: luma_std == 0
    blank_px = np.full((12, 16, 3), 77, dtype=np.uint8)
    blank = b"".join(jpeg.encode_jpeg(blank_px, 85) for _ in range(6))
    blank_df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [100], "payload": [blank], "n_frames": [6]}),
        schema=T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("payload", T.BinaryType()),
                T.StructField("n_frames", T.IntegerType()),
            ]
        ),
    )
    survivors = {
        r.doc_id: r
        for r in multimodal.curate_video_corpus(
            media.unionByName(blank_df), max_frames=3, min_luma_std=5.0
        ).collect()
    }
    assert set(survivors) == {0, 1, 2}  # one per cluster, blank gated out
    assert all(r.n_frames_sampled == 3 for r in survivors.values())
    assert all(r.mean_luma_std >= 5.0 for r in survivors.values())


# ---- round 8: ADVICE r7 decoder-robustness fixes ----------------------


def _encode_grayscale(plane: np.ndarray, samp_byte: int, quality: int = 90) -> bytes:
    """Hand-assemble a single-component baseline JPEG declaring the given
    sampling byte — per T.81 A.2 a one-component scan is NON-interleaved
    (one data unit per MCU) whatever the declared factors, which is what
    some real grayscale encoders emit (ADVICE r7)."""
    import struct

    from jobanalytics_bigdataproject_spark.operators.jpeg import (
        AC_LUMA_BITS,
        AC_LUMA_VALS,
        DC_LUMA_BITS,
        DC_LUMA_VALS,
        ZIGZAG,
        _BitWriter,
        _block_grid,
        _canonical_codes,
        _encode_block,
        scaled_quant_tables,
    )

    h, w = plane.shape
    ql, _ = scaled_quant_tables(quality)
    h_p, w_p = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    p = np.pad(plane.astype(np.float64), ((0, h_p - h), (0, w_p - w)), mode="edge")
    grid = _block_grid(p, ql)
    dc = (_canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS),)
    ac = (_canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS),)
    bw = _BitWriter()
    pred = 0
    for by in range(h_p // 8):  # raster order, one block per data unit
        for bx in range(w_p // 8):
            pred = _encode_block(bw, grid[by, bx], pred, 0, dc, ac)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xFFDB, bytes([0]) + bytes(ql.reshape(-1)[ZIGZAG].astype(np.uint8)))
    out += seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, samp_byte, 0]))
    out += seg(0xFFC4, bytes([0x00]) + bytes(DC_LUMA_BITS) + bytes(DC_LUMA_VALS))
    out += seg(0xFFC4, bytes([0x10]) + bytes(AC_LUMA_BITS) + bytes(AC_LUMA_VALS))
    out += seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += bw.flush() + b"\xff\xd9"
    return bytes(out)


def test_grayscale_with_subsampling_factors_decodes_noninterleaved():
    """A grayscale JPEG legally declaring hf=vf=2 must decode identically
    to the 1x1 declaration — single-component scans are non-interleaved
    (T.81 A.2), so the sampling factors do not change MCU geometry."""
    g = np.add.outer(np.arange(24) * 7, np.arange(16) * 5).astype(np.uint8)
    dec_11 = jpeg.decode_jpeg(_encode_grayscale(g, 0x11))
    dec_22 = jpeg.decode_jpeg(_encode_grayscale(g, 0x22))
    assert dec_11.shape == dec_22.shape == (24, 16, 3)
    assert np.array_equal(dec_11, dec_22)
    assert np.abs(dec_22[..., 0].astype(float) - g).mean() < 3.0


def test_fill_bytes_before_markers_skipped():
    """T.81 B.1.1.2 allows any number of 0xFF fill bytes before a marker
    code; both decode_jpeg and jpeg_end must skip them (ADVICE r7)."""
    px = np.full((8, 8, 3), 77, np.uint8)
    raw = jpeg.encode_jpeg(px, 85)
    # pad before the first DQT and before the EOI
    stuffed = raw.replace(b"\xff\xdb", b"\xff\xff\xff\xdb", 1)
    stuffed = stuffed[:-2] + b"\xff\xff" + stuffed[-2:]
    dec = jpeg.decode_jpeg(stuffed)
    assert np.array_equal(dec, jpeg.decode_jpeg(raw))
    assert jpeg.jpeg_end(stuffed) == len(stuffed)


def test_partial_component_scan_refused():
    """A 3-component frame delivered as a single-component scan (legal
    multi-scan baseline) would silently mis-decode under one-scan
    geometry — it must be refused loudly instead (ADVICE r7)."""
    import struct

    raw = jpeg.encode_jpeg(np.full((8, 8, 3), 50, np.uint8), 85)
    i = raw.index(b"\xff\xda")
    (ln,) = struct.unpack_from(">H", raw, i + 2)
    one_comp = bytes([1, 1, 0x00, 0, 63, 0])
    patched = (
        raw[:i]
        + b"\xff\xda"
        + struct.pack(">H", len(one_comp) + 2)
        + one_comp
        + raw[i + 2 + ln :]
    )
    with pytest.raises(ValueError, match="scan has 1 of the frame's 3"):
        jpeg.decode_jpeg(patched)


# --- progressive DCT (SOF2) — VERDICT r9 #9 ---------------------------------


def _prog_parity(img: np.ndarray, quality: int = 85) -> None:
    """Progressive and baseline encodings at the same quality quantize to
    the SAME coefficients, so their decodes must be bit-identical — the
    anti-"inverse bugs cancel" device for the multi-scan path: the
    baseline side of the comparison is pinned by its own hand-derived /
    grammar tests, so a progressive scan that drops or misplaces even
    one coefficient bit shows up as a pixel diff."""
    base = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality))
    prog = jpeg.decode_jpeg(jpeg.encode_jpeg_progressive(img, quality))
    assert np.array_equal(base, prog)


def test_progressive_parity_noise():
    rng = np.random.default_rng(5)
    _prog_parity(rng.integers(0, 256, size=(41, 53, 3)).astype(np.uint8))


def test_progressive_parity_gradient_and_flat():
    xx, yy = np.meshgrid(np.arange(48), np.arange(32))
    grad = np.stack(
        [(xx * 3) % 256, (yy * 5) % 256, ((xx + yy) * 2) % 256], axis=-1
    ).astype(np.uint8)
    _prog_parity(grad)  # long EOB runs across blocks (EOBn path)
    _prog_parity(np.full((24, 24, 3), 130, np.uint8))  # every AC scan all-EOB
    _prog_parity(multimodal.synth_frame_pixels(3), 60)  # synth fixture, low q


def test_progressive_parity_odd_dims_and_qualities():
    rng = np.random.default_rng(11)
    for hw, q in (((8, 8), 95), ((17, 9), 85), ((9, 17), 30)):
        _prog_parity(rng.integers(0, 256, size=(*hw, 3)).astype(np.uint8), q)


def test_progressive_stream_structure():
    """The emitted stream is really multi-scan SOF2: one SOF2 marker, the
    planned 9 SOS scans (DC first, 4 AC first incl. the split luma band,
    DC refine, 3 AC refine), per-scan DHT redefinitions, and jpeg_end
    still walks it (MJPEG demux must not break on progressive members)."""
    import struct as _s

    img = multimodal.synth_frame_pixels(1)
    raw = jpeg.encode_jpeg_progressive(img, 85)
    assert raw[:2] == b"\xff\xd8" and raw[-2:] == b"\xff\xd9"
    pos, markers = 2, []
    while pos + 2 <= len(raw):
        assert raw[pos] == 0xFF
        m = raw[pos + 1]
        markers.append(m)
        if m == 0xD9:
            break
        (ln,) = _s.unpack_from(">H", raw, pos + 2)
        pos += 2 + ln
        if m == 0xDA:  # skip entropy to next marker
            while pos + 1 < len(raw) and not (
                raw[pos] == 0xFF and raw[pos + 1] != 0x00
                and not 0xD0 <= raw[pos + 1] <= 0xD7
            ):
                pos += 1
    assert markers.count(0xC2) == 1 and 0xC0 not in markers
    assert markers.count(0xDA) == 9
    assert markers.count(0xC4) == 2 + 7  # 2 DC tables + one per AC scan
    assert jpeg.jpeg_end(raw) == len(raw)


def test_progressive_refinement_actually_refines():
    """Truncating the stream after the first-pass scans (before the
    refinement scans) must still decode — to a COARSER image: the
    successive-approximation claim, observed rather than asserted from
    structure. (A progressive decoder that secretly needs every scan
    would throw; one that ignores refinement would decode both equal.)"""
    img = multimodal.synth_frame_pixels(2)
    raw = jpeg.encode_jpeg_progressive(img, 85)
    # find the 6th SOS (the DC refinement scan) and cut there
    import struct as _s

    pos, cuts = 2, []
    while pos + 2 <= len(raw):
        m = raw[pos + 1]
        if m == 0xD9:
            break
        (ln,) = _s.unpack_from(">H", raw, pos + 2)
        if m == 0xDA:
            cuts.append(pos)
        pos += 2 + ln
        if m == 0xDA:
            while pos + 1 < len(raw) and not (
                raw[pos] == 0xFF and raw[pos + 1] != 0x00
                and not 0xD0 <= raw[pos + 1] <= 0xD7
            ):
                pos += 1
    assert len(cuts) == 9
    coarse = jpeg.decode_jpeg(raw[: cuts[5]] + b"\xff\xd9")
    full = jpeg.decode_jpeg(raw)
    err_coarse = np.abs(coarse.astype(int) - img.astype(int)).mean()
    err_full = np.abs(full.astype(int) - img.astype(int)).mean()
    assert not np.array_equal(coarse, full)
    assert err_full < err_coarse  # refinement moves TOWARD the source
