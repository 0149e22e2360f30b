"""Multimodal binary-column plumbing: schema, Arrow batching, stubbed decode."""

import hashlib

import pytest

from kafka_connect_plugins_spark.operators.multimodal import (
    decode_image_meta,
    media_features,
    media_from_documents,
)


def _docs(spark):
    return spark.createDataFrame(
        [
            (0, "hello world", "en", "s0", 11),
            (1, "a" * 100, "en", "s0", 100),
            (2, "the quick brown fox", "en", "s1", 19),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_media_synthesis_schema_and_bytes(spark):
    media = media_from_documents(_docs(spark))
    assert [f.name for f in media.schema.fields] == ["media_id", "kind", "content", "meta"]
    rows = {r["media_id"]: r for r in media.collect()}
    assert rows[0]["kind"] == "image" and bytes(rows[0]["content"])[:4] == b"IMG0"
    assert bytes(rows[0]["content"])[4:] == b"hello world"
    assert rows[1]["kind"] == "audio" and rows[2]["kind"] == "video"
    assert rows[2]["meta"]["source"] == "s1"


def test_media_features_arrow_batch(spark):
    media = media_from_documents(_docs(spark))
    feats = {r["media_id"]: r for r in media_features(media).collect()}
    payload = b"IMG0" + b"hello world"
    assert feats[0]["n_bytes"] == len(payload)
    assert feats[0]["sha256"] == hashlib.sha256(payload).hexdigest()
    assert feats[0]["magic"] == payload[:4].hex()
    assert 0.0 <= feats[0]["entropy"] <= 8.0
    # all-identical bytes after the magic → near-zero entropy for doc 1's body
    assert feats[1]["entropy"] < feats[0]["entropy"]


def test_decode_stub_fake_is_deterministic(spark):
    media = media_from_documents(_docs(spark))
    a = {r["media_id"]: r for r in decode_image_meta(media).collect()}
    b = {r["media_id"]: r for r in decode_image_meta(media).collect()}
    assert a == b
    r = a[1]  # body = 100 bytes of 'a'
    assert r["decoder"] == "fake-deterministic"
    assert r["width"] == 10 and r["height"] == 10
    assert r["mean_pixel"] == float(ord("a"))


def test_decode_strict_raises_without_codec(spark):
    try:
        import PIL  # noqa: F401

        pytest.skip("pillow unexpectedly present")
    except ImportError:
        pass
    media = media_from_documents(_docs(spark))
    with pytest.raises(Exception) as exc_info:
        decode_image_meta(media, strict=True).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )
