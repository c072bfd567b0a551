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
