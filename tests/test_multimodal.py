"""Multimodal binary-column plumbing: sniffing, feature UDF shape, stub."""

import pytest
from pyspark.sql import functions as F

from langid_mr_spark import multimodal as MM

PAYLOADS = [
    (0, bytes.fromhex("89504e470d0a1a0a") + b"rest-of-png"),
    (1, bytes.fromhex("ffd8ffe0") + b"jpeg-body"),
    (2, bytes.fromhex("47494638") + b"gif-body"),
    (3, b"<html><body>x</body></html>"),
    (4, b"\x00\x01\x02 arbitrary"),
    (5, None),
]
WANT = {0: "png", 1: "jpeg", 2: "gif", 3: "html", 4: "unknown", 5: None}


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(PAYLOADS, "id long, payload binary")


def test_sniff_format(frame):
    got = {r["id"]: r["meta"]["format"]
           for r in MM.with_metadata(frame).collect()}
    assert got == WANT


def test_metadata_sizes(frame):
    got = {r["id"]: r["meta"]["size_bytes"]
           for r in MM.with_metadata(frame).collect()}
    for i, payload in PAYLOADS:
        assert got[i] == (len(payload) if payload is not None else None)


def test_extract_features_shape_and_determinism(frame):
    out1 = {r["id"]: r["features"] for r in MM.extract_features(frame).collect()}
    out2 = {r["id"]: r["features"] for r in MM.extract_features(frame).collect()}
    assert out1 == out2
    for i, payload in PAYLOADS:
        vec = out1[i]
        assert len(vec) == MM.FEATURE_DIM
        if payload:
            assert sum(vec) == pytest.approx(1.0)
        else:
            assert vec == [0.0] * MM.FEATURE_DIM
    # python twin agrees
    for i, payload in PAYLOADS:
        assert out1[i] == pytest.approx(MM.fake_features(payload))


def test_decode_image_is_honest_stub(frame):
    with pytest.raises(Exception) as exc_info:
        MM.decode_image(frame).collect()
    assert "NotImplementedError" in str(exc_info.value) or \
        isinstance(exc_info.value, NotImplementedError)


# --- real container-header decode -------------------------------------------

import struct as _S

from langid_mr_spark.multimodal import decode_header, decode_headers


def _png(w=640, h=480, depth=8, color=2):
    ihdr = _S.pack(">II", w, h) + bytes([depth, color, 0, 0, 0])
    return (b"\x89PNG\r\n\x1a\n" + _S.pack(">I", 13) + b"IHDR" + ihdr
            + b"\x00" * 4)


def _jpeg(w=320, h=200, ncomp=3):
    app0 = b"\xff\xe0" + _S.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = (b"\xff\xc0" + _S.pack(">H", 8 + 3 * ncomp) + b"\x08"
            + _S.pack(">HH", h, w) + bytes([ncomp]) + b"\x00" * (3 * ncomp))
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def _gif(w=12, h=34):
    return b"GIF89a" + _S.pack("<HH", w, h) + b"\x00" * 3


def _wav(channels=2, rate=44100, bits=16):
    fmt = _S.pack("<HHIIHH", 1, channels, rate, rate * channels * bits // 8,
                  channels * bits // 8, bits)
    return (b"RIFF" + _S.pack("<I", 36) + b"WAVE"
            + b"fmt " + _S.pack("<I", 16) + fmt
            + b"data" + _S.pack("<I", 0))


def test_decode_header_png_jpeg_gif_wav():
    png = decode_header(_png(1920, 1080, depth=8, color=6))
    assert (png["kind"], png["width"], png["height"],
            png["channels"], png["bit_depth"]) == ("png", 1920, 1080, 4, 8)
    jpg = decode_header(_jpeg(320, 200))
    assert (jpg["kind"], jpg["width"], jpg["height"],
            jpg["channels"]) == ("jpeg", 320, 200, 3)
    gif = decode_header(_gif(12, 34))
    assert (gif["kind"], gif["width"], gif["height"]) == ("gif", 12, 34)
    wav = decode_header(_wav(1, 16000, 16))
    assert (wav["kind"], wav["channels"], wav["sample_rate"],
            wav["bit_depth"]) == ("wav", 1, 16000, 16)


def test_decode_header_poison_is_error_not_raise():
    assert decode_header(None)["error"] == "empty payload"
    assert decode_header(b"")["error"] == "empty payload"
    assert decode_header(b"plain text")["error"] == "unknown container"
    truncated = _png()[:14]  # magic ok, IHDR cut off
    assert decode_header(truncated)["error"] is not None
    desync = b"\xff\xd8\xff" + b"\x00" * 8  # JPEG magic, garbage markers
    assert decode_header(desync)["error"] is not None


def test_decode_headers_dataframe(spark):
    rows = [(1, _png(64, 32)), (2, _wav(2, 48000, 24)),
            (3, b"not media"), (4, _jpeg(10, 20)), (5, None)]
    df = spark.createDataFrame(rows, "id long, payload binary")
    got = {r["id"]: r for r in
           decode_headers(df).orderBy("id").collect()}
    assert got[1]["kind"] == "png" and got[1]["width"] == 64
    assert got[2]["sample_rate"] == 48000 and got[2]["bit_depth"] == 24
    assert got[3]["kind"] is None and got[3]["header_error"]
    assert got[4]["height"] == 20
    assert got[5]["header_error"] == "empty payload"
    assert len(got) == 5  # poison rows survive as rows
