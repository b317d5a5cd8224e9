"""Planted-semantics tests for the round-6 warehouse8 batch
(Gumbel/ES weighted sampling, truncation fidelity, PMI
collocations).

Hand-computed tiny fixtures — the oracle gate can't catch a semantic
flaw mirrored into the SQL twin, these can.
"""

from __future__ import annotations

import hashlib
import math

from rc_scanner_spark.queries import build_registry

from tests.conftest import write_fixture

REG = build_registry()
_write = write_fixture

_SPAN = 16 ** 15


def _es_key_nano(doc_id: int, w: int) -> int:
    h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16)
    return math.floor(math.log((h + 1) / _SPAN) / w * 1e9)


def test_sample_gumbel_topk_planted(spark, tmp_path):
    rows = [(i, "x", w) for i, w in [(1, 10), (2, 1000), (3, 1), (4, 0)]]
    _write(
        spark, tmp_path, "documents", rows,
        "doc_id long, text string, n_chars long",
    )
    out = [
        (r.doc_id, r.es_key_nano)
        for r in REG["sample_gumbel_topk"].fn(spark, str(tmp_path)).collect()
    ]
    # doc 4 (zero weight) excluded; ranking replays the exact md5 math
    expect = sorted(
        [(i, _es_key_nano(i, w)) for i, w in [(1, 10), (2, 1000), (3, 1)]],
        key=lambda t: (-t[1], t[0]),
    )
    assert out == expect
    # the heaviest doc should carry the closest-to-zero (largest) key
    assert out[0][0] == 2


def test_sample_gumbel_weight_monotonicity(spark, tmp_path):
    # identical hash input is impossible, but weight dominance is
    # statistical: with 200 docs of weight 1000 vs 200 of weight 1,
    # the heavy class must dominate the top-100.
    rows = [(i, "x", 1000 if i < 200 else 1) for i in range(400)]
    _write(
        spark, tmp_path, "documents", rows,
        "doc_id long, text string, n_chars long",
    )
    out = REG["sample_gumbel_topk"].fn(spark, str(tmp_path)).collect()
    heavy = sum(1 for r in out if r.doc_id < 200)
    assert heavy > 90


def test_embed_dim_truncation_same_bucket_fixture(spark, tmp_path):
    # pick two ids that DO share an md5 bucket so the planted pair
    # always materializes (bucket = md5-60bit % 64)
    ids = []
    b0 = None
    for i in range(1, 200):
        b = int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) % 64
        if b0 is None:
            b0, ids = b, [i]
        elif b == b0:
            ids.append(i)
            if len(ids) == 2:
                break
    va = [1.0] * 64
    vb = [1.0] * 16 + [0.0] * 48  # cos64 = 16/(8*4)=0.5, cos16 = 1
    rows = [(ids[0], va, 0), (ids[1], vb, 0)]
    _write(
        spark, tmp_path, "embeddings", rows,
        "vec_id long, embedding array<float>, label int",
    )
    [r] = REG["embed_dim_truncation_fidelity"].fn(
        spark, str(tmp_path)
    ).collect()
    assert (r.band, r.n_pairs) == (5, 1)  # cos64 = 0.5
    assert r.mean_err_milli == 500  # |0.5 - 1.0| = 0.5
    assert r.max_err_milli == 500


def test_text_pmi_cooccur_planted(spark, tmp_path):
    # corpus tokens: "x y" x5 and "x z" x5 interleaved in one doc
    # each, plus filler "w w" x5 docs.
    rows = (
        [(i, "x y", "s") for i in range(5)]
        + [(10 + i, "x z", "s") for i in range(5)]
        + [(20 + i, "w w", "s") for i in range(5)]
    )
    _write(
        spark, tmp_path, "documents", rows,
        "doc_id long, text string, source string",
    )
    out = {
        (r.ta, r.tb): (r.n_ab, r.pmi_milli)
        for r in REG["text_pmi_cooccur"].fn(spark, str(tmp_path)).collect()
    }
    # totals: T = 30 tokens; c(x)=10, c(y)=5, c(z)=5, c(w)=10
    # bigrams: (x,y) x5, (x,z) x5, (w,w) x5
    pmi_xy = math.floor(math.log(5 * 30.0 / (10.0 * 5.0)) * 1000)
    pmi_ww = math.floor(math.log(5 * 30.0 / (10.0 * 10.0)) * 1000)
    assert out == {
        ("x", "y"): (5, pmi_xy),
        ("x", "z"): (5, pmi_xy),
        ("w", "w"): (5, pmi_ww),
    }


def test_text_pmi_cooccur_short_docs_guard(spark, tmp_path):
    # docs with 0 and 1 tokens must not blow up the bigram transform
    rows = [
        (1, "1234 !!!", "s"),       # 0 tokens
        (2, "solo", "s"),           # 1 token
        *[(10 + i, "a b", "s") for i in range(5)],
    ]
    _write(
        spark, tmp_path, "documents", rows,
        "doc_id long, text string, source string",
    )
    out = {
        (r.ta, r.tb): r.n_ab
        for r in REG["text_pmi_cooccur"].fn(spark, str(tmp_path)).collect()
    }
    assert out == {("a", "b"): 5}
