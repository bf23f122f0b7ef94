"""Multimodal binary-column plumbing tests (decode stubbed, plumbing real)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import PythonException

from pq_vector_spark.operators.multimodal import (
    attach_media_metadata,
    extract_features,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        ("m0", "image", bytearray(b"\x89PNG fake"), 640, 480, None, "image/png"),
        ("m1", "video", bytearray(b"\x00\x00ftyp fake"), 1920, 1080, 3500, "video/mp4"),
        ("m2", "audio", bytearray(b"RIFF fake"), None, None, 2000, "audio/wav"),
    ]
    return spark.createDataFrame(
        rows,
        "media_id STRING, kind STRING, content BINARY, width INT, height INT,"
        " duration_ms INT, mime STRING",
    )


def test_attach_metadata(media):
    out = attach_media_metadata(media).collect()
    by_id = {r["media_id"]: r for r in out}
    assert by_id["m0"]["content_bytes"] == 9
    assert len(by_id["m0"]["content_sha"]) == 64


def test_fake_feature_extraction_deterministic(media):
    a = extract_features(media, dim=8, fake=True).select("media_id", "feature").collect()
    b = extract_features(media, dim=8, fake=True).select("media_id", "feature").collect()
    fa = {r["media_id"]: r["feature"] for r in a}
    fb = {r["media_id"]: r["feature"] for r in b}
    assert fa == fb  # content-hash-seeded ⇒ stable across runs
    assert all(len(v) == 8 for v in fa.values())


def test_real_decode_is_stubbed(media):
    # fake=False must raise NotImplementedError inside the workers
    with pytest.raises(Exception) as ei:
        extract_features(media, dim=8, fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_sample_frames_fanout(media):
    # non-PPM payload → fake decoder keeps the fan-out shape deterministic
    out = sample_frames(
        media.filter(F.col("kind") == "video"), every_ms=1000, decoder="fake"
    ).collect()
    # 3500 ms at 1000 ms cadence ⇒ frames at 0, 1000, 2000
    assert sorted(r["frame_ts_ms"] for r in out) == [0, 1000, 2000]
    again = sample_frames(
        media.filter(F.col("kind") == "video"), every_ms=1000, decoder="fake"
    ).collect()
    assert sorted(map(str, out)) == sorted(map(str, again))  # deterministic


def test_sample_frames_real_ppm_video(spark):
    """Concatenated-P6 video: the sampled frames are the ACTUAL frame bytes,
    and the per-frame channel means match a direct decode."""
    from pq_vector_spark.operators.multimodal import decode_ppm, ppm_bytes, split_ppm_frames

    frames = [
        ppm_bytes(2, 2, bytes([i * 10 + c for _ in range(4) for c in range(3)]))
        for i in range(4)
    ]
    video = b"".join(frames)
    assert split_ppm_frames(video) == frames
    df = spark.createDataFrame(
        [("v0", bytearray(video), 4000)], "media_id STRING, content BINARY, duration_ms INT"
    )
    out = sample_frames(df, every_ms=1000).orderBy("frame_ts_ms").collect()
    assert [r["frame_ts_ms"] for r in out] == [0, 1000, 2000, 3000]
    assert [r["frame_index"] for r in out] == [0, 1, 2, 3]
    for r in out:
        assert bytes(r["frame"]) == frames[r["frame_index"]]
        w, h, mr, mg, mb = decode_ppm(bytes(r["frame"]))
        assert (r["frame_width"], r["frame_height"]) == (int(w), int(h))
        assert r["frame_mean_r"] == pytest.approx(mr)
        assert r["frame_mean_b"] == pytest.approx(mb)


def test_sample_frames_null_payload_yields_null_stats(spark):
    """NULL content on the REAL ('ppm') path must produce NULL frame/index/
    stat columns — never hash-fabricated numbers (those would silently
    corrupt a training pipeline's feature columns)."""
    from pq_vector_spark.operators.multimodal import ppm_bytes

    video = b"".join(
        ppm_bytes(2, 2, bytes([i * 10] * 12)) for i in range(2)
    )
    df = spark.createDataFrame(
        [("v0", bytearray(video), 2000), ("v_null", None, 2000)],
        "media_id STRING, content BINARY, duration_ms INT",
    )
    out = sample_frames(df, every_ms=1000, decoder="ppm").collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["media_id"], []).append(r)
    # real row decodes normally
    assert all(r["frame"] is not None for r in by_id["v0"])
    # NULL payload: one row per sampled ts, every derived column NULL
    assert sorted(r["frame_ts_ms"] for r in by_id["v_null"]) == [0, 1000]
    for r in by_id["v_null"]:
        for c in ("frame_index", "frame", "frame_width", "frame_height",
                  "frame_mean_r", "frame_mean_g", "frame_mean_b"):
            assert r[c] is None, f"{c} fabricated for NULL payload: {r[c]}"


def test_split_ppm_frames_linear_many_frames():
    """Many-frame payload parses with absolute-offset scanning (the old
    per-frame tail slice was O(n²) bytes); spot-check frame identity."""
    from pq_vector_spark.operators.multimodal import ppm_bytes, split_ppm_frames

    frames = [ppm_bytes(3, 3, bytes([i % 256] * 27)) for i in range(500)]
    got = split_ppm_frames(b"".join(frames))
    assert len(got) == 500
    assert got[0] == frames[0] and got[499] == frames[499]


def test_sample_frames_none_decoder_raises(media):
    with pytest.raises(Exception) as ei:
        sample_frames(media.filter(F.col("kind") == "video"), decoder=None).collect()
    assert "NotImplementedError" in str(ei.value)
    with pytest.raises(ValueError, match="unknown video decoder"):
        sample_frames(media, decoder="h264")


def test_extract_features_rejects_unknown_decoder_on_driver(media):
    with pytest.raises(ValueError, match="unknown decoder"):
        extract_features(media, decoder="jpeg")


def test_ppm_header_comments():
    """netpbm '#' comment lines between header tokens must parse."""
    from pq_vector_spark.operators.multimodal import decode_ppm

    rgb = bytes(range(12))
    payload = b"P6\n# a comment\n2 # inline\n2\n# another\n255\n" + rgb
    w, h, mr, mg, mb = decode_ppm(payload)
    assert (w, h) == (2.0, 2.0)
    plain = b"P6\n2 2\n255\n" + rgb
    assert decode_ppm(plain) == decode_ppm(payload)


def test_features_feed_vector_operators(spark, media):
    """Extracted features are array<float> ready for topk/similarity."""
    from pq_vector_spark.operators.topk import brute_force_topk

    feats = extract_features(media, dim=8, fake=True).select("media_id", "feature")
    out = brute_force_topk(feats, "feature", [0.5] * 8, 2, tie_break="media_id")
    assert out.count() == 2


# ----------------------- real decoders (round-2) -----------------------


def test_decode_wav_roundtrip():
    import numpy as np

    from pq_vector_spark.operators.multimodal import decode_wav, wav_bytes

    samples = np.array([0, 100, -100, 32767, -32768, 5, -5, 8], dtype=np.int16)
    payload = wav_bytes(samples, sample_rate=16000)
    feats = decode_wav(payload)
    assert feats[:3] == [1.0, 16000.0, 8.0]
    assert feats[3] == samples.astype(np.float64).mean()


def test_decode_wav_stereo_channel_means():
    import numpy as np

    from pq_vector_spark.operators.multimodal import decode_wav, wav_bytes

    inter = np.array([10, -10, 20, -20, 30, -30, 40, -40], dtype=np.int16)
    payload = wav_bytes(inter, sample_rate=8000, n_channels=2)
    feats = decode_wav(payload)
    assert feats[:3] == [2.0, 8000.0, 4.0]
    assert feats[3] == 25.0 and feats[4] == -25.0


def test_decode_ppm():
    from pq_vector_spark.operators.multimodal import decode_ppm, ppm_bytes

    rgb = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255])  # 2x2
    feats = decode_ppm(ppm_bytes(2, 2, rgb))
    assert feats[:2] == [2.0, 2.0]
    assert feats[2:] == [127.5, 127.5, 127.5]


def test_extract_features_wav_decoder_distributed(spark):
    import numpy as np
    from pyspark.sql import functions as F

    from pq_vector_spark.operators.multimodal import extract_features, wav_bytes

    rows = [
        (i, bytearray(wav_bytes(np.arange(i, i + 8, dtype=np.int16))))
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "media_id INT, content BINARY")
    out = extract_features(df, "content", decoder="wav").select(
        "media_id", F.col("feature")[3].alias("mean_pcm")
    )
    got = dict(out.collect())
    for i in range(20):
        assert got[i] == float(np.arange(i, i + 8).mean())


def test_extract_features_no_decoder_raises(spark):
    from pq_vector_spark.operators.multimodal import extract_features

    df = spark.createDataFrame([(0, bytearray(b"xx"))], "media_id INT, content BINARY")
    with pytest.raises(Exception):
        extract_features(df, "content").collect()


def test_resize_ppm_nearest_neighbor():
    from pq_vector_spark.operators.multimodal import decode_ppm, ppm_bytes, resize_ppm

    # 2×2 image: distinct corner colors
    rgb = bytes([255, 0, 0,  0, 255, 0,
                 0, 0, 255,  255, 255, 0])
    src = ppm_bytes(2, 2, rgb)
    up = resize_ppm(src, 4, 4)
    w, h, *means = decode_ppm(up)
    assert (w, h) == (4.0, 4.0)
    # each source pixel becomes a 2×2 block → means preserved exactly
    assert means == list(decode_ppm(src)[2:])
    down = resize_ppm(src, 1, 1)
    assert decode_ppm(down)[:2] == [1.0, 1.0]
    assert decode_ppm(down)[2:] == [255.0, 0.0, 0.0]  # NN picks top-left


def test_resize_images_operator(spark):
    from pq_vector_spark.operators.multimodal import (
        decode_ppm,
        ppm_bytes,
        resize_images,
    )

    rows = [
        ("m1", "image", ppm_bytes(4, 2, bytes(range(24))), 4, 2),
        ("m2", "image", None, None, None),
    ]
    df = spark.createDataFrame(
        rows, "media_id STRING, kind STRING, content BINARY, width INT, height INT"
    )
    out = {r["media_id"]: r for r in resize_images(df, 2, 2).collect()}
    assert out["m2"]["content"] is None and out["m2"]["width"] is None
    w, h, *_ = decode_ppm(bytes(out["m1"]["content"]))
    assert (w, h) == (2.0, 2.0)
    assert out["m1"]["width"] == 2 and out["m1"]["height"] == 2
