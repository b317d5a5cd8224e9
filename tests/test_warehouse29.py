"""Planted-semantics tests for round-11 batch 45 (the portable twins
of the four rows-only mechanisms).  The oracle gate can't catch a
flaw mirrored into the SQL twin; hand-computed fixtures can."""

from __future__ import annotations

import numpy as np

from rc_scanner_spark.queries import build_registry

from tests.conftest import write_fixture

REG = build_registry()
_write = write_fixture

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"
EMB_SCHEMA = "vec_id long, embedding array<float>, label int"


def _doc(i, text, source="s1"):
    return (i, text, "en", source, len(text))


# --------------------------------------------------------------------
# multimodal_phash_portable
# --------------------------------------------------------------------


def test_phash_portable_prefix_collisions(spark, tmp_path):
    # Docs 1 and 2 share the first 64 chars exactly (they differ only
    # after) -> identical prefix fingerprint -> all four bands collide
    # -> one pair at hamming 0.  Doc 3 is unrelated -> no pair.
    prefix = "a" * 30 + " shared prefix text that runs past " + "b" * 10
    assert len(prefix) >= 64 or len(prefix + " tail") >= 64
    base = (prefix + "x" * 70)[:100]
    rows = [
        _doc(1, base + " first tail"),
        _doc(2, base + " second completely different continuation"),
        _doc(3, "an entirely different document body with no shared prefix"),
    ]
    _write(spark, tmp_path, "documents", rows, DOC_SCHEMA)
    got = REG["multimodal_phash_portable"].fn(spark, str(tmp_path)).collect()
    assert [(r.id_a, r.id_b, r.hamming) for r in got] == [(1, 2, 0)]


# --------------------------------------------------------------------
# pack_bins_nextfit_portable
# --------------------------------------------------------------------


def test_pack_nextfit_planted(spark, tmp_path):
    # Token counts by doc: 500, 400, 200, 100 (descending order is by
    # n_tokens DESC).  Next-fit with budget 512:
    #   500 -> bin 1 (fill 500)
    #   400 -> 500+400 > 512 -> bin 2 (fill 400)
    #   200 -> 400+200 > 512 -> bin 3 (fill 200)
    #   100 -> 200+100 <= 512 -> bin 3 (fill 300)
    rows = [
        _doc(1, " ".join(["w"] * 500)),
        _doc(2, " ".join(["w"] * 400)),
        _doc(3, " ".join(["w"] * 200)),
        _doc(4, " ".join(["w"] * 100)),
    ]
    _write(spark, tmp_path, "documents", rows, DOC_SCHEMA)
    got = (
        REG["pack_bins_nextfit_portable"].fn(spark, str(tmp_path)).collect()
    )
    assert [(r.doc_id, r.rn, r.bin) for r in got] == [
        (1, 1, 1),
        (2, 2, 2),
        (3, 3, 3),
        (4, 4, 3),
    ]


def test_pack_nextfit_oversized_item_own_bin(spark, tmp_path):
    # An item larger than the budget occupies its own bin and the NEXT
    # item still starts a fresh bin (fill tracks the oversized value).
    rows = [
        _doc(1, " ".join(["w"] * 600)),
        _doc(2, " ".join(["w"] * 100)),
    ]
    _write(spark, tmp_path, "documents", rows, DOC_SCHEMA)
    got = (
        REG["pack_bins_nextfit_portable"].fn(spark, str(tmp_path)).collect()
    )
    assert [(r.doc_id, r.bin) for r in got] == [(1, 1), (2, 2)]


def test_pack_nextfit_groups_are_independent(spark, tmp_path):
    # Bins restart per source: identical 300-token docs in two sources
    # each pack from bin 1.
    rows = [
        _doc(1, " ".join(["w"] * 300), source="s1"),
        _doc(2, " ".join(["w"] * 300), source="s2"),
    ]
    _write(spark, tmp_path, "documents", rows, DOC_SCHEMA)
    got = (
        REG["pack_bins_nextfit_portable"].fn(spark, str(tmp_path)).collect()
    )
    assert [(r.source, r.doc_id, r.bin) for r in got] == [
        ("s1", 1, 1),
        ("s2", 2, 1),
    ]


# --------------------------------------------------------------------
# text_bytes_portable
# --------------------------------------------------------------------


def test_text_bytes_unicode_and_null(spark, tmp_path):
    # "héllo" = 6 utf-8 bytes over 5 code points; NULL text -> zeros.
    rows = [_doc(1, "héllo"), (2, None, "en", "s1", 0), _doc(3, "")]
    _write(spark, tmp_path, "documents", rows, DOC_SCHEMA)
    got = {
        r.doc_id: (r.raw_bytes, r.n_chars, r.bytes_per_char)
        for r in REG["text_bytes_portable"].fn(spark, str(tmp_path)).collect()
    }
    assert got[1] == (6, 5, 1.2)
    assert got[2] == (0, 0, 0.0)
    assert got[3] == (0, 0, 0.0)


# --------------------------------------------------------------------
# embed_cov_trace_portable
# --------------------------------------------------------------------


def test_embed_cov_trace_matches_numpy(spark, tmp_path):
    # 5 planted 64-dim vectors; the per-dim population variances must
    # equal numpy's var(axis=0) to the twin's 6-decimal rounding.
    rng = np.random.RandomState(7)
    M = rng.randn(5, 64).astype(np.float32)
    rows = [(i, M[i].tolist(), 0) for i in range(5)]
    _write(spark, tmp_path, "embeddings", rows, EMB_SCHEMA)
    got = REG["embed_cov_trace_portable"].fn(spark, str(tmp_path)).collect()
    expect = M.astype(np.float64).var(axis=0)
    assert len(got) == 64
    for r in got:
        assert abs(r.var_pop - round(float(expect[r.dim - 1]), 6)) < 1e-9


def test_embed_cov_trace_constant_dim_positive_zero(spark, tmp_path):
    # A constant dimension must read exactly +0.0 (not the -0.0 that
    # the G/n - mean^2 cancellation noise can round to).
    rows = [(i, [3.0] + [float(i + j) for j in range(63)], 0) for i in range(4)]
    _write(spark, tmp_path, "embeddings", rows, EMB_SCHEMA)
    got = {r.dim: r.var_pop for r in REG["embed_cov_trace_portable"].fn(spark, str(tmp_path)).collect()}
    import math
    assert got[1] == 0.0 and math.copysign(1.0, got[1]) == 1.0
