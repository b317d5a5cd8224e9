"""Planted-semantics tests for the round-6 warehouse13 batch
(prep pipeline v2, dataset card).

Hand-computed tiny fixtures — the oracle gate can't catch a semantic
flaw mirrored into the SQL twin, these can.
"""

from __future__ import annotations

from rc_scanner_spark.queries import build_registry

from tests.conftest import write_fixture

REG = build_registry()
_write = write_fixture


def test_llm_prep_pipeline_v2_planted(spark, tmp_path):
    long_a = "a" * 150
    long_b = "b" * 150
    rows = [
        (1, "tiny", "en", "s", 4),        # fails length
        (2, long_a, "zz", "s", 150),      # fails lang
        (3, long_a, "en", "s", 150),      # pass (first survivor of a)
        (4, long_a, "en", "s", 150),      # dup of 3 among survivors
        (5, long_b, "en", "t", 150),      # pass
    ]
    _write(
        spark, tmp_path, "documents", rows,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    out = {
        r.stage: r.n_docs
        for r in REG["llm_prep_pipeline_v2"].fn(spark, str(tmp_path)).collect()
    }
    # survivors after dedup: docs 3 and 5 -> both sampled (K=200);
    # shards: 150 bytes per source -> one shard each
    assert out == {
        "1_raw": 5,
        "2_length_pass": 4,
        "3_lang_pass": 3,
        "4_dedup_pass": 2,
        "5_sampled": 2,
        "6_shards": 2,
    }


def test_profile_dataset_card_planted(spark, tmp_path):
    rows = [
        (1, "one two three", "en", "s", 13),
        (2, "one two three", "en", "s", 13),   # exact dup
        (3, "four", "de", "t", 4),
        (4, "five six", "en", "t", 8),
    ]
    _write(
        spark, tmp_path, "documents", rows,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    [r] = REG["profile_dataset_card"].fn(spark, str(tmp_path)).collect()
    assert (r.n_docs, r.n_sources, r.n_langs) == (4, 2, 2)
    assert (r.total_chars, r.total_tokens) == (38, 3 + 3 + 1 + 2)
    # dup rate: 1 of 4 docs is a repeat -> 250000 ppm
    assert r.dup_rate_ppm == 250000
    # lengths sorted [4, 8, 13, 13]: p50 interpolates 8..13 -> 10.5
    assert r.p50_chars_milli == 10500
    assert r.mean_chars_milli == (38 * 1000) // 4
