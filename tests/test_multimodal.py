"""Multimodal plumbing: binary columns + Arrow-batched mapInPandas
feature extraction (the codec decode itself is stubbed — not available
in this environment — but every Spark-side seam is real)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from rc_scanner_spark.operators.multimodal import (
    attach_fake_media,
    decode_image,
    extract_features,
    frame_sample_plan,
)

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(50)
    return attach_fake_media(docs)


def test_media_schema(media):
    assert dict(media.dtypes) == {
        "doc_id": "bigint",
        "media": "binary",
        "media_type": "string",
        "width": "int",
        "height": "int",
        "duration_ms": "bigint",
    }


def test_extract_features_roundtrip(spark, media):
    feats = extract_features(media).collect()
    assert len(feats) == 50
    src = {r["doc_id"]: bytes(r["media"]) for r in media.collect()}
    for r in feats:
        payload = src[r["doc_id"]]
        assert r["n_bytes"] == len(payload)
        assert r["checksum"] == hashlib.md5(payload).hexdigest()
        assert len(r["feature"]) == 8
        assert all(0.0 <= x < 1.0 for x in r["feature"])


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_frame_sample_plan(spark):
    df = spark.createDataFrame(
        [(1, None, None), (2, None, 3500)],
        "doc_id long, media binary, duration_ms long",
    )
    rows = frame_sample_plan(df, every_ms=1000).collect()
    got = sorted((r["doc_id"], r["frame_ts_ms"]) for r in rows)
    assert got == [(2, 0), (2, 1000), (2, 2000), (2, 3000)]


def test_resize_media_preserves_schema_and_composes(spark, media):
    from rc_scanner_spark.operators.multimodal import _fake_resize, resize_media

    small = resize_media(media, width=16, height=4)
    assert small.dtypes == media.dtypes
    rows = {r["doc_id"]: r for r in small.collect()}
    src = {r["doc_id"]: bytes(r["media"]) for r in media.collect()}
    assert set(rows) == set(src)
    for doc_id, r in rows.items():
        assert r["width"] == 16 and r["height"] == 4
        assert bytes(r["media"]) == _fake_resize(src[doc_id], 64)
        assert len(r["media"]) == 64
    # resize stages compose: same schema in and out
    thumb = resize_media(small, width=2, height=2).collect()
    assert all(len(r["media"]) == 4 for r in thumb)


def test_resize_media_null_payload_passthrough(spark):
    from rc_scanner_spark.operators.multimodal import resize_media

    df = spark.createDataFrame(
        [(1, None, "image/fake", 10, 10, None)],
        "doc_id long, media binary, media_type string, width int, "
        "height int, duration_ms long",
    )
    out = resize_media(df, width=8, height=8).collect()
    assert out[0]["media"] is None
