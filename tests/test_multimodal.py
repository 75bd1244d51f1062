"""Multimodal plumbing: binary columns + Arrow-batched header ops. Codec
work is stubbed (no image libs in this container); the Spark-side schema,
batching, and metadata math are real and pinned here."""

from __future__ import annotations

import struct

import pytest

from pyspark.sql import functions as F

from igpm_pem_spark.multimodal.binary_ops import (
    MAGIC,
    decode_image_metadata,
    pack_fake_image,
    resize_images,
    resize_pixels,
    sample_frames,
    synthetic_media,
)


def test_synthetic_media_deterministic(spark):
    a = sorted(
        (r.asset_id, bytes(r.bytes)) for r in synthetic_media(spark, 50, 2).collect()
    )
    b = sorted(
        (r.asset_id, bytes(r.bytes)) for r in synthetic_media(spark, 50, 8).collect()
    )
    assert a == b


def test_decode_matches_header(spark):
    media = synthetic_media(spark, 40)
    got = {r.asset_id: r for r in decode_image_metadata(media).collect()}
    for r in media.collect():
        raw = bytes(r.bytes)
        w, h, c = struct.unpack(">HHB", raw[4:9])
        d = got[r.asset_id]
        assert (d.width, d.height, d.channels) == (w, h, c)
        assert d.valid and d.n_bytes == len(raw)


def test_corrupt_bytes_flagged_invalid(spark):
    rows = [
        (1, "image", bytearray(b"NOTMAGIC" + b"x" * 5), {}),
        (2, "image", bytearray(pack_fake_image(10, 20)), {}),
        (3, "image", bytearray(MAGIC), {}),  # truncated header
    ]
    media = spark.createDataFrame(
        rows, "asset_id BIGINT, kind STRING, bytes BINARY, meta MAP<STRING,STRING>"
    )
    got = {r.asset_id: r.valid for r in decode_image_metadata(media).collect()}
    assert got == {1: False, 2: True, 3: False}


def test_resize_plan_bounds(spark):
    media = synthetic_media(spark, 60)
    for r in resize_images(media, max_side=128).collect():
        assert max(r.new_width, r.new_height) <= 128
        assert 0 < r.scale <= 1.0


def test_resize_pixels_metadata_only_fixture_drops(spark):
    """The IMG1 synthetic container carries no pixel payload: the real
    pixel path skips it (decode returns None) instead of fabricating."""
    assert resize_pixels(synthetic_media(spark, 5)).count() == 0


def test_decode_array_ppm_golden():
    """Golden-pixel PPM P6 decode: hand-written 2×2 image."""
    import numpy as np

    from igpm_pem_spark.multimodal.binary_ops import _decode_array

    raw = b"P6\n# a comment\n2 2\n255\n" + bytes(
        [255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 8, 7]
    )
    px = _decode_array(raw)
    assert px.shape == (2, 2, 3)
    assert px[0, 0].tolist() == [255, 0, 0]
    assert px[0, 1].tolist() == [0, 255, 0]
    assert px[1, 0].tolist() == [0, 0, 255]
    assert px[1, 1].tolist() == [9, 8, 7]
    assert px.dtype == np.uint8


def test_decode_array_bmp_golden():
    """Golden-pixel 24-bit BMP decode: 2×2 bottom-up, BGR order, 4-byte
    row padding (2*3=6 bytes → stride 8)."""
    import struct as _s

    from igpm_pem_spark.multimodal.binary_ops import _decode_array

    # rows stored bottom-up: file row 0 = image bottom row
    bottom = bytes([7, 8, 9, 255, 0, 0]) + b"\x00\x00"  # (9,8,7) (0,0,255) in RGB
    top = bytes([0, 0, 255, 0, 255, 0]) + b"\x00\x00"  # (255,0,0) (0,255,0)
    pixel_data = bottom + top
    header = (
        b"BM"
        + _s.pack("<IHHI", 54 + len(pixel_data), 0, 0, 54)
        + _s.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(pixel_data), 0, 0, 0, 0)
    )
    px = _decode_array(header + pixel_data)
    assert px.shape == (2, 2, 3)
    assert px[0, 0].tolist() == [255, 0, 0]
    assert px[0, 1].tolist() == [0, 255, 0]
    assert px[1, 0].tolist() == [9, 8, 7]
    assert px[1, 1].tolist() == [0, 0, 255]


def test_decode_array_compressed_needs_codec():
    from igpm_pem_spark.multimodal.binary_ops import HAVE_CODECS, _decode_array

    jpeg_ish = b"\xff\xd8\xff\xe0" + b"\x00" * 64
    if not HAVE_CODECS:
        with pytest.raises(NotImplementedError):
            _decode_array(jpeg_ish)


def test_resize_pixels_real_resample_golden(spark):
    """End-to-end REAL pixel path on Spark: PPM media → decode → NN
    resample → PPM re-encode. Golden check: 4×4 gradient fit into 2×2
    with floor-index NN keeps pixels (0,0) (0,2) (2,0) (2,2)."""
    import numpy as np

    from igpm_pem_spark.multimodal.binary_ops import (
        _decode_array,
        pack_ppm,
        resize_pixels,
    )

    src = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    media = spark.createDataFrame(
        [(1, "image", bytearray(pack_ppm(src)), {"src": "golden"})],
        "asset_id BIGINT, kind STRING, bytes BINARY, meta MAP<STRING,STRING>",
    )
    rows = resize_pixels(media, max_side=2).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.new_width, r.new_height, r.fmt) == (2, 2, "ppm")
    got = _decode_array(bytes(r.bytes))
    want = src[[0, 2]][:, [0, 2]]
    assert np.array_equal(got, want)


def test_resize_pixels_ppm_media_table(spark):
    """The deterministic PPM media table decodes and resizes end-to-end;
    dims match the metadata plan and never exceed max_side."""
    from igpm_pem_spark.multimodal.binary_ops import (
        resize_images,
        resize_pixels,
        synthetic_media_ppm,
    )

    media = synthetic_media_ppm(spark, 20)
    plan = {r.asset_id: (r.new_width, r.new_height) for r in resize_images(media, max_side=10).collect()}
    real = {r.asset_id: (r.new_width, r.new_height) for r in resize_pixels(media, max_side=10).collect()}
    assert len(real) == 20
    assert real == plan
    assert all(max(wh) <= 10 for wh in real.values())


def test_frame_sampling(spark):
    rows = [
        (1, "video", bytearray(b""), {"n_frames": "35"}),
        (2, "video", bytearray(b""), {"n_frames": "5"}),
        (3, "image", bytearray(b""), {}),
    ]
    media = spark.createDataFrame(
        rows, "asset_id BIGINT, kind STRING, bytes BINARY, meta MAP<STRING,STRING>"
    )
    got = sorted(
        (r.asset_id, r.frame_idx) for r in sample_frames(media, every_n=10).collect()
    )
    assert got == [(1, 0), (1, 10), (1, 20), (1, 30), (2, 0)]


def test_feature_extraction_feeds_similarity_pipeline(spark):
    """End-to-end multimodal composition: binary assets → deterministic
    feature vectors → ANN near-dup. Duplicate payloads must surface as
    cosine-1.0 pairs through the SAME similarity operators the embeddings
    table uses."""
    from igpm_pem_spark.multimodal.binary_ops import extract_features
    from igpm_pem_spark.operators.similarity import (
        ann_lsh_topk,
        near_dup_pairs_ann,
    )

    base = synthetic_media(spark, 40)
    # asset 1000 duplicates asset 0's bytes exactly
    dup = base.where("asset_id = 0").select(
        (F.col("asset_id") + 1000).alias("asset_id"), "kind", "bytes", "meta"
    )
    media = base.unionByName(dup)
    emb = extract_features(media)
    assert emb.count() == 41
    row = emb.first()
    assert len(row.embedding) == 64
    # identical content ⇒ identical embedding ⇒ cos4 = 1.0 near-dup pair
    pairs = near_dup_pairs_ann(
        emb, threshold=0.999, id_col="asset_id", vec_col="embedding"
    ).collect()
    assert any(
        {r.id_a, r.id_b} == {0, 1000} and r.cos4 == 1.0 for r in pairs
    )
    # the ANN top-k path runs on extracted features too
    topk = ann_lsh_topk(
        emb, k=2, query_mod=1000, id_col="asset_id", vec_col="embedding"
    ).collect()
    per_query = {r.query_id for r in topk}
    assert 0 in per_query  # query subset asset 0 found neighbors


def test_feature_extraction_deterministic_across_partitionings(spark):
    from igpm_pem_spark.multimodal.binary_ops import extract_features

    a = {
        r.asset_id: tuple(r.embedding)
        for r in extract_features(synthetic_media(spark, 30, 2)).collect()
    }
    b = {
        r.asset_id: tuple(r.embedding)
        for r in extract_features(synthetic_media(spark, 30, 8)).collect()
    }
    assert a == b


def test_feature_extraction_feeds_kmeans(spark):
    """Multimodal → clustering composition: binary assets → deterministic
    features → Lloyd k-means assignment. Exact-duplicate payloads must
    land in the same cluster, and the assignment covers every asset."""
    from igpm_pem_spark.multimodal.binary_ops import extract_features
    from igpm_pem_spark.operators.clustering import kmeans_assign

    base = synthetic_media(spark, 30)
    dup = base.where("asset_id = 0").select(
        (F.col("asset_id") + 1000).alias("asset_id"), "kind", "bytes", "meta"
    )
    feats = extract_features(base.unionByName(dup)).withColumnRenamed(
        "asset_id", "vec_id"
    )
    res = kmeans_assign(spark, feats, k=4, iters=2)
    got = {r.vec_id: r.cluster for r in res.assignments.collect()}
    assert len(got) == 31
    assert got[1000] == got[0]  # identical bytes -> identical embedding -> same cluster
    assert set(got.values()) <= set(range(4))


def test_wav_golden_against_stdlib_wave(spark):
    """pack_wav/_decode_wav round-trip checked against Python's stdlib wave
    reader on the same bytes — a genuinely independent decoder."""
    import io
    import wave

    import numpy as np

    from igpm_pem_spark.multimodal.binary_ops import _decode_wav, pack_wav

    t = np.arange(500, dtype=np.int64)
    s = (1009 * 3 + 97 * t) % 4001 - 2000
    raw = pack_wav(s, 16000)
    with wave.open(io.BytesIO(raw)) as w:
        assert (w.getframerate(), w.getnchannels(), w.getsampwidth()) == (16000, 1, 2)
        ref = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
    rate, ch, got = _decode_wav(raw)
    assert (rate, ch) == (16000, 1)
    assert (got == ref).all() and (got == s.astype("<i2")).all()


def test_wav_decode_walks_extra_chunks():
    import struct as st

    import numpy as np

    from igpm_pem_spark.multimodal.binary_ops import _decode_wav, pack_wav

    raw = bytearray(pack_wav(np.arange(10), 8000))
    # splice a LIST chunk (odd-sized, word-aligned) between fmt and data
    extra = b"LIST" + st.pack("<I", 5) + b"INFOx" + b"\x00"
    di = raw.index(b"data")
    raw = bytes(raw[:di]) + extra + bytes(raw[di:])
    rate, ch, s = _decode_wav(raw)
    assert rate == 8000 and len(s) == 10


def test_decode_audio_stats_matches_numpy_oracle(spark):
    import numpy as np

    from igpm_pem_spark.multimodal.binary_ops import (
        decode_audio_stats,
        synthetic_media_wav,
    )

    media = synthetic_media_wav(spark, n=25, num_partitions=4)
    got = {r.asset_id: r for r in decode_audio_stats(media).collect()}
    assert len(got) == 25
    for i in range(25):
        t = np.arange(400 + i % 37, dtype=np.int64)
        s = ((1009 * i + 97 * t) % 4001 - 2000).astype("float64")
        rate = 8000 * (1 + i % 3)
        r = got[i]
        assert r.valid and r.sample_rate == rate and r.n_samples == len(t)
        assert abs(r.duration_ms - 1000.0 * len(t) / rate) < 1e-9
        assert abs(r.rms - float(np.sqrt(np.mean(s * s)))) < 1e-9
        assert r.peak == int(np.max(np.abs(s)))


def test_decode_audio_stats_flags_corrupt_rows(spark):
    from igpm_pem_spark.multimodal.binary_ops import decode_audio_stats

    media = spark.createDataFrame(
        [(1, "audio", b"not a wav at all", {"source": "x"}),
         (2, "image", b"PNG...", {"source": "y"})],
        "asset_id BIGINT, kind STRING, bytes BINARY, meta MAP<STRING,STRING>",
    )
    rows = decode_audio_stats(media).collect()
    assert len(rows) == 1  # non-audio kinds filtered out
    assert rows[0].asset_id == 1 and not rows[0].valid
