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
