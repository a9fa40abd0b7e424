"""Connected components / near-dup pipeline + multimodal resize &
frame-sample plumbing."""

from __future__ import annotations

from pyspark.sql import functions as F

from jobanalytics_bigdataproject_spark.operators import dedup, multimodal


def test_connected_components_clusters(spark):
    # two clusters {1,2,3} (chain) and {10,11}; singleton 20 has no edges
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], ["doc_id_a", "doc_id_b"]
    )
    comps = {r.doc_id: r.component for r in dedup.connected_components(pairs).collect()}
    assert comps == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_connected_components_long_chain(spark):
    # 0-1-2-...-9 chain: needs multiple propagation rounds
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], ["doc_id_a", "doc_id_b"]
    )
    comps = {r.doc_id: r.component for r in dedup.connected_components(pairs).collect()}
    assert set(comps.values()) == {0} and len(comps) == 10


def test_star_cc_equals_label_propagation(spark):
    import random

    random.seed(7)
    nodes = list(range(200))
    edges = [
        tuple(sorted(random.sample(nodes, 2))) for _ in range(150)
    ]
    df = spark.createDataFrame(edges, ["doc_id_a", "doc_id_b"])
    old = {(r.doc_id, r.component) for r in dedup.connected_components(df).collect()}
    new = {(r.doc_id, r.component) for r in dedup.connected_components_star(df).collect()}
    assert new == old and len(new) > 0


def test_star_cc_logarithmic_rounds_on_chain(spark):
    # 0-1-...-63 chain: min-label propagation moves the label one hop per
    # round (needs 63); the star transforms contract it in ~log2(64) rounds.
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], ["doc_id_a", "doc_id_b"]
    )
    star = {
        r.doc_id: r.component
        for r in dedup.connected_components_star(chain, max_iterations=6).collect()
    }
    assert set(star.values()) == {0} and len(star) == 64
    prop = {
        r.doc_id: r.component
        for r in dedup.connected_components(chain, max_iterations=6).collect()
    }
    assert set(prop.values()) != {0}  # label prop is NOT done in 6 rounds


def test_star_cc_empty_edges(spark):
    from pyspark.sql import types as T

    empty = spark.createDataFrame(
        [],
        T.StructType(
            [
                T.StructField("doc_id_a", T.LongType()),
                T.StructField("doc_id_b", T.LongType()),
            ]
        ),
    )
    assert dedup.connected_components_star(empty).count() == 0


def test_neardup_dedup_removes_planted_dups(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, base),
        (2, base),                                # exact dup of 1
        (3, base.replace("kappa", "lambda")),     # near dup of 1
        (4, "totally different content with many unrelated words here"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    kept = sorted(
        r.doc_id
        for r in dedup.neardup_dedup(df, jaccard_threshold=0.5).select("doc_id").collect()
    )
    assert 1 in kept and 4 in kept
    assert 2 not in kept          # exact dup clustered with 1
    assert len(kept) <= 3


def test_resize_stub_shapes(tables):
    media = multimodal.attach_binary_payload(tables["documents"].limit(10))
    out = multimodal.resize_stub(media, target_bytes=16).collect()
    assert len(out) == 10
    assert all(r.thumb_bytes <= 16 and len(r.thumb) == r.thumb_bytes for r in out)


def test_frame_sample_fanout(tables):
    media = multimodal.attach_binary_payload(tables["documents"].limit(5))
    out = multimodal.frame_sample_stub(media, frame_size=8, every_nth=2, max_frames=4)
    rows = out.collect()
    assert len(rows) > 5  # fan-out: more frame rows than docs
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r.frame_idx)
    for idxs in per_doc.values():
        assert sorted(idxs) == list(range(len(idxs)))  # contiguous frame idx
        assert len(idxs) <= 4


def test_real_decode_stub_raises(tables):
    import pytest

    media = multimodal.attach_binary_payload(tables["documents"].limit(1))
    with pytest.raises(NotImplementedError):
        multimodal.resize_stub(media, real_decode=True)


def test_wav_decode_end_to_end(tables):
    # REAL decode: synth WAV payloads per doc, parse with the stdlib wave
    # reader through mapInPandas, and check against the stdlib-recomputed
    # ground truth on the driver.
    import io
    import wave

    import numpy as np

    docs = tables["documents"].select("doc_id").limit(12)
    media = multimodal.attach_wav_payload(docs, n_samples=400, sample_rate=8000)
    decoded = {r.doc_id: r for r in multimodal.decode_audio(media, n_chunks=4).collect()}
    assert len(decoded) == 12
    for doc_id, r in decoded.items():
        raw = multimodal.synth_wav(int(doc_id), n_samples=400, sample_rate=8000)
        with wave.open(io.BytesIO(raw), "rb") as w:
            assert r.n_channels == w.getnchannels() == 1
            assert r.sample_rate == w.getframerate() == 8000
            assert r.n_samples == w.getnframes() == 400
            samples = np.frombuffer(
                w.readframes(w.getnframes()), dtype=np.int16
            ).astype(np.float64)
        assert abs(r.duration_sec - 400 / 8000) < 1e-12
        assert abs(r.rms - float(np.sqrt(np.mean(samples**2)))) < 1e-6
        assert r.peak == int(np.max(np.abs(samples)))
        assert len(r.feat) == 4
        # chunk RMS values recombine to the global RMS (equal chunk sizes)
        assert abs(
            float(np.sqrt(np.mean(np.array(r.feat, dtype=np.float64) ** 2))) - r.rms
        ) < 1e-3


def test_wav_payload_is_deterministic(tables):
    docs = tables["documents"].select("doc_id").limit(3)
    a = {r.doc_id: bytes(r.payload) for r in multimodal.attach_wav_payload(docs).collect()}
    b = {r.doc_id: bytes(r.payload) for r in multimodal.attach_wav_payload(docs).collect()}
    assert a == b
    assert all(p[:4] == b"RIFF" and p[8:12] == b"WAVE" for p in a.values())
