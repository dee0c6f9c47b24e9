"""Multimodal binary-column plumbing (stubbed decode)."""

from __future__ import annotations

import hashlib

from meteor_spark.operators.multimodal import FEATURE_SCHEMA, attach_binary, decode_image, extract_features


def test_attach_binary_schema(spark):
    df = spark.createDataFrame([(1, "hello")], "doc_id long, text string")
    media = attach_binary(df)
    assert [f.name for f in media.schema.fields] == ["doc_id", "content", "media_meta"]
    row = media.first()
    assert bytes(row["content"]) == b"hello"
    assert row["media_meta"]["mime"] == "text/plain"


def test_extract_features_deterministic(spark):
    df = spark.createDataFrame([(1, "hello"), (2, "world")], "doc_id long, text string")
    out = {r["doc_id"]: r for r in extract_features(attach_binary(df)).collect()}
    d = hashlib.md5(b"hello").hexdigest()
    assert out[1]["content_md5"] == d
    assert out[1]["n_bytes"] == 5
    assert out[1]["width"] == int(d[0:2], 16)
    assert out[1]["height"] == int(d[2:4], 16)
    assert extract_features(attach_binary(df)).schema == FEATURE_SCHEMA


def test_decode_image_stub():
    w, h = decode_image(b"abc")
    digest = hashlib.md5(b"abc").hexdigest()
    assert (w, h) == (int(digest[0:2], 16), int(digest[2:4], 16))
    assert 0 <= w <= 255 and 0 <= h <= 255
