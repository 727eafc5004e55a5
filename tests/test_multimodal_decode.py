"""Real pure-numpy media decoders: PPM/BMP/WAV roundtrips + the Spark
real-decode path end-to-end."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from ip_filter_spark.operators.multimodal import (
    decode_bmp,
    decode_payload,
    decode_png,
    decode_ppm,
    decode_wav,
    extract_features,
    make_bmp,
    make_png,
    make_ppm,
    make_wav,
    resize_image_nearest,
)


def test_ppm_roundtrip():
    b = make_ppm(7, 5, seed=3)
    px = decode_ppm(b)
    rng = np.random.default_rng(3)
    assert px.shape == (5, 7, 3)
    assert (px == rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)).all()


def test_ppm_header_comments():
    b = b"P6\n# a comment\n2 2\n# another\n255\n" + bytes(range(12))
    px = decode_ppm(b)
    assert px.shape == (2, 2, 3) and px.ravel().tolist() == list(range(12))


def test_bmp_roundtrip():
    rng = np.random.default_rng(8)
    px_want = rng.integers(0, 256, (4, 6, 3), dtype=np.uint8)
    assert (decode_bmp(make_bmp(6, 4, seed=8)) == px_want).all()


def test_wav_roundtrip():
    b = make_wav(1000, 16000, seed=2)
    rate, ch, samples = decode_wav(b)
    rng = np.random.default_rng(2)
    assert (rate, ch, samples.shape) == (16000, 1, (1000, 1))
    assert (samples.ravel() == rng.integers(-32768, 32767, 1000, dtype=np.int16)).all()


def test_resize_nearest():
    px = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    out = resize_image_nearest(px, 2, 2)
    assert out.shape == (2, 2, 3)
    assert (out == px[::2, ::2]).all()


def test_unsupported_codecs_raise():
    with pytest.raises(NotImplementedError, match="real media decode"):
        decode_payload(b"\xff\xd8\xff\xe0jpeg...", "image")  # JPEG magic
    with pytest.raises(NotImplementedError, match="real media decode"):
        decode_payload(b"anything", "video")


def test_spark_real_decode_path(spark):
    """End-to-end: real PPM/WAV payloads through the mapInPandas stage."""
    rows = [
        (1, "image", (make_ppm(8, 8, seed=1), "image/ppm")),
        (2, "image", (make_bmp(8, 8, seed=2), "image/bmp")),
        (3, "audio", (make_wav(640, 8000, seed=3), "audio/wav")),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload struct<bytes binary, codec string>"
    )
    feats = {r.media_id: r for r in extract_features(media, dim=16, deterministic_fake=False).collect()}
    assert set(feats) == {1, 2, 3}
    for r in feats.values():
        v = np.asarray(r.feature)
        assert v.shape == (16,) and abs(np.linalg.norm(v) - 1.0) < 1e-5
    # image fold checks out against the local decode
    local = decode_ppm(make_ppm(8, 8, seed=1)).astype(np.float32).ravel()
    n = len(local) - len(local) % 16
    want = local[:n].reshape(16, -1).sum(axis=1).astype(np.int64)
    assert list(feats[1].raw_fold) == want.tolist()


def test_png_roundtrip_all_filters():
    """zlib-inflated PNG with every scanline filter (None/Sub/Up/Average/
    Paeth), RGB and RGBA, reconstructed bit-exactly."""
    for ch in (3, 4):
        for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
            b = make_png(13, 9, seed=7, channels=ch, filters=filters)
            px = decode_png(b)
            want = np.random.default_rng(7).integers(0, 256, (9, 13, ch), dtype=np.uint8)
            assert px.shape == (9, 13, ch)
            assert (px == want).all(), (ch, filters)
    # dispatch path picks PNG up by magic
    sig = decode_payload(make_png(4, 4, 1), "image")
    assert sig.shape == (4 * 4 * 3,)


def test_png_unsupported_variants_raise():
    b = make_png(4, 4, 1)
    # 16-bit depth / palette / interlace are honestly unsupported
    hacked = bytearray(b)
    hacked[24] = 16  # bit depth byte inside IHDR
    with pytest.raises(NotImplementedError, match="8-bit RGB/RGBA"):
        decode_png(bytes(hacked))
    with pytest.raises(NotImplementedError, match="not a PNG"):
        decode_png(b"nope")


def test_spark_real_decode_path_png(spark):
    """A PNG payload flows through the mapInPandas feature stage like the
    uncompressed codecs, matching the local decode fold."""
    media = spark.createDataFrame(
        [(9, "image", (make_png(8, 8, seed=5), "image/png"))],
        "media_id long, kind string, payload struct<bytes binary, codec string>",
    )
    r = extract_features(media, dim=16, deterministic_fake=False).collect()[0]
    local = decode_png(make_png(8, 8, seed=5)).astype(np.float32).ravel()
    n = len(local) - len(local) % 16
    want = local[:n].reshape(16, -1).sum(axis=1).astype(np.int64)
    assert list(r.raw_fold) == want.tolist()
