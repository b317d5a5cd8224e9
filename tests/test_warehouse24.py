"""Planted-semantics tests for round-7 batch 32."""

from __future__ import annotations

import datetime
import math

from rc_scanner_spark.queries import build_registry

from tests.conftest import write_fixture

REG = build_registry()
_write = write_fixture

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"
EV_SCHEMA = (
    "event_id long, user_id long, ts timestamp, value double, event_type string"
)

# "the and of to a": quality 0.44 (>= 0.35 gate); "zz yy xx": 0.024
_PASS = "the and of to a"
_FAIL = "zz yy xx"


def test_agg_bayes_shrunken_rates_planted(spark, tmp_path):
    rows = (
        [(i, _PASS, "en", "A", 15) for i in range(3)]          # 3/3 pass
        + [(10 + i, _PASS, "en", "B", 15) for i in range(5)]   # 5/10 pass
        + [(20 + i, _FAIL, "en", "B", 8) for i in range(5)]
    )
    _write(spark, tmp_path, "documents", rows, DOC_SCHEMA)
    out = {
        r.source: (r.n_docs, r.n_pass, r.raw_ppm, r.eb_ppm)
        for r in REG["agg_bayes_shrunken_rates"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    pbar = 8 / 13
    eb_a = math.floor((3 + 50 * pbar) / (3 + 50) * 1e6)
    eb_b = math.floor((5 + 50 * pbar) / (10 + 50) * 1e6)
    assert out == {
        "A": (3, 3, 1000000, eb_a),
        "B": (10, 5, 500000, eb_b),
    }
    # shrinkage property: the tiny perfect source lands near the prior,
    # strictly below its raw rate
    assert eb_a < 1000000 and abs(eb_a / 1e6 - pbar) < 0.05


def test_events_anomaly_seasonal_adjusted_planted(spark, tmp_path):
    d = datetime.datetime
    rows = []
    eid = 0
    # clicks: three Mondays at 10/10/10, three Tuesdays at 2/2/30 —
    # the 30-count Tuesday is the seasonal outlier; Mondays are level.
    days = [
        (d(2026, 8, 3), 10), (d(2026, 8, 10), 10), (d(2026, 8, 17), 10),
        (d(2026, 8, 4), 2), (d(2026, 8, 11), 2), (d(2026, 8, 18), 30),
    ]
    for day, n in days:
        for _ in range(n):
            eid += 1
            rows.append((eid, 1, day, 1.0, "click"))
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    out = [
        (r.event_type, r.day, r.n)
        for r in REG["events_anomaly_seasonal_adjusted"]
        .fn(spark, str(tmp_path))
        .collect()
    ]
    # residuals: Mondays 0,0,0; Tuesdays vs mean 11.33: -9.33,-9.33,
    # +18.67; median resid 0, MAD = median(|r|) = median(0,0,0,9.33,
    # 9.33,18.67) = 4.67 -> 3*MAD = 14 -> only the +18.67 day flags
    assert out == [("click", "2026-08-18", 30)]


def test_text_tokenizer_fertility_planted(spark, tmp_path):
    rows = [
        (1, "abcd efgh", "en", "A", 9),   # 9 chars, 2 bpe tokens
        (2, "你好", "zh", "A", 2),         # 2 chars, 2 bpe tokens (symbols)
    ]
    _write(spark, tmp_path, "documents", rows, DOC_SCHEMA)
    out = {
        r.lang: (r.n_docs, r.n_chars, r.n_bpe_tokens, r.chars_per_token_ppm)
        for r in REG["text_tokenizer_fertility"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert out == {
        "en": (1, 9, 2, 4500000),
        "zh": (1, 2, 2, 1000000),
    }


def test_embed_dup_consistency_planted(spark, tmp_path):
    def vec(i, v):
        out = [0.0] * 64
        out[i] = v
        return out

    docs = [
        (1, "same text", "en", "A", 9),
        (2, "same text", "en", "A", 9),   # dup of 1: identical vectors
        (3, "same text", "en", "A", 9),   # dup of 2: orthogonal vector
        (4, "unique", "en", "A", 6),
    ]
    _write(spark, tmp_path, "documents", docs, DOC_SCHEMA)
    vecs = [
        (1, vec(0, 1.0), 0),
        (2, vec(0, 1.0), 0),
        (3, vec(1, 1.0), 0),
        (4, vec(2, 1.0), 0),
    ]
    _write(
        spark, tmp_path, "embeddings", vecs,
        "vec_id long, embedding array<float>, label long",
    )
    [r] = REG["embed_dup_consistency"].fn(spark, str(tmp_path)).collect()
    # consecutive pairs in the dup group: (1,2) cos 1.0 and (2,3) cos 0
    assert (r.n_pairs, r.n_high, r.n_low, r.min_s4, r.max_s4) == (
        2, 1, 1, 0, 10000
    )


def test_embed_dup_consistency_zero_norm_null_both_engines(spark, tmp_path):
    # review r7: a zero-vector member of a dup pair must yield a NULL
    # cosine (not NaN / not a DuckDB cast error) on BOTH engines.
    import duckdb

    docs = [(1, "same", "en", "A", 4), (2, "same", "en", "A", 4)]
    _write(spark, tmp_path, "documents", docs, DOC_SCHEMA)
    vecs = [(1, [0.0] * 64, 0), (2, [1.0] + [0.0] * 63, 0)]
    _write(
        spark, tmp_path, "embeddings", vecs,
        "vec_id long, embedding array<float>, label long",
    )
    [r] = REG["embed_dup_consistency"].fn(spark, str(tmp_path)).collect()
    assert (r.n_pairs, r.n_high, r.n_low, r.min_s4, r.max_s4) == (
        1, 0, 0, None, None
    )
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{tmp_path}/{t}.parquet/*.parquet')"
        )
    o = con.execute(REG["embed_dup_consistency"].sql).df()
    con.close()
    assert int(o["n_pairs"][0]) == 1 and o["min_s4"].isna().all()


def test_embed_dup_consistency_no_dups_one_zero_row(spark, tmp_path):
    docs = [(1, "aa", "en", "A", 2), (2, "bb", "en", "A", 2)]
    _write(spark, tmp_path, "documents", docs, DOC_SCHEMA)
    vecs = [(1, [0.0] * 64, 0), (2, [0.0] * 64, 0)]
    _write(
        spark, tmp_path, "embeddings", vecs,
        "vec_id long, embedding array<float>, label long",
    )
    [r] = REG["embed_dup_consistency"].fn(spark, str(tmp_path)).collect()
    assert (r.n_pairs, r.n_high, r.n_low, r.min_s4, r.max_s4) == (
        0, 0, 0, None, None
    )
