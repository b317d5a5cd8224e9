"""Planted-semantics test for round-7 batch 31."""

from __future__ import annotations

from rc_scanner_spark.queries import build_registry

from tests.conftest import write_fixture

REG = build_registry()
_write = write_fixture


def test_multimodal_pair_integrity_planted(spark, tmp_path):
    docs = [
        (1, "a", "en", "A", 1),   # paired, good dim
        (2, "b", "en", "A", 1),   # paired, BAD dim
        (3, "c", "en", "B", 1),   # missing embedding
    ]
    _write(
        spark, tmp_path, "documents", docs,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    vecs = [
        (1, [0.0] * 64, 0),
        (2, [0.0] * 8, 0),    # wrong dimensionality
        (9, [0.0] * 64, 0),   # orphan: no document 9
    ]
    _write(
        spark, tmp_path, "embeddings", vecs,
        "vec_id long, embedding array<float>, label long",
    )
    out = {
        r.source: (r.n_docs, r.n_paired, r.n_missing_pair, r.n_bad_dim)
        for r in REG["multimodal_pair_integrity"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert out == {
        "A": (2, 2, 0, 1),
        "B": (1, 0, 1, 0),
        "__orphan_embeddings__": (0, 0, 1, 0),
    }
