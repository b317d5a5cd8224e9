"""Planted-semantics tests for round-10 batch 40 (hand-computed
fixtures — the oracle gate can't catch a flaw mirrored into the SQL
twin)."""

from __future__ import annotations

from rc_scanner_spark.queries import build_registry

from tests.conftest import write_fixture

REG = build_registry()
_write = write_fixture

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"
EMB_SCHEMA = "vec_id long, embedding array<float>, label int"


# --------------------------------------------------------------------
# duplicate-prefix detection
# --------------------------------------------------------------------


def test_dedup_prefix_hash_planted(spark, tmp_path):
    base16 = " ".join(f"w{i}" for i in range(16))          # exactly 16 words
    base15 = " ".join(f"w{i}" for i in range(15))
    rows = [
        (1, base16 + " tail one two", "en", "web", 0),
        (2, base16 + " a different ending entirely", "en", "web", 0),
        (3, base15 + " changed sixteenth word here", "en", "web", 0),
        (4, "short text", "en", "web", 0),
        (5, "short text", "en", "web", 0),                  # exact short dup
        (6, "short text extra", "en", "web", 0),            # 3 words: differs
    ]
    _write(spark, tmp_path, "documents", rows, DOC_SCHEMA)
    out = {
        r.keep_id: r.n_copies
        for r in REG["dedup_prefix_hash"].fn(spark, str(tmp_path)).collect()
    }
    # docs 1+2 share all 16 prefix words despite different tails; doc 3
    # differs at word 16; docs 4+5 (sub-16-word) group on their full
    # text, doc 6's extra word splits it off.
    assert out == {1: 2, 4: 2}


# --------------------------------------------------------------------
# preference pairs
# --------------------------------------------------------------------


def test_llm_preference_pairs_planted(spark, tmp_path):
    # quality = min(nw/50,1)*.4 + stop_ratio*.4 + min(punct_ratio*5,1)*.2
    hi = "the a of and to " * 10      # 50 words, all en stop markers -> 0.8
    lo = "zzz"                        # 1 word -> round(0.008, 4) -> qm 8
    rows = [
        (1, hi, "en", "web", 0),
        (2, lo, "en", "web", 0),
        (3, lo, "en", "web", 0),      # tie on the rejected side -> min id
        # block with a sub-threshold gap (identical docs): filtered
        (10, hi, "en", "books", 0),
        (11, hi, "en", "books", 0),
        # single-doc block: filtered
        (20, hi, "de", "web", 0),
    ]
    _write(spark, tmp_path, "documents", rows, DOC_SCHEMA)
    out = [
        (r.lang, r.source, r.chosen_id, r.rejected_id, r.gap_milli)
        for r in REG["llm_preference_pairs"].fn(spark, str(tmp_path)).collect()
    ]
    assert out == [("en", "web", 1, 2, 792)]


# --------------------------------------------------------------------
# epoch mix
# --------------------------------------------------------------------


def test_select_epoch_mix_planted(spark, tmp_path):
    # source A: 100 tokens, B: 900.  budget = 2*1000; share = 1000
    # each.  A: epochs = min(4e6, 1000*1e6 DIV 100) = 4e6 -> planned
    # 100*4e6 DIV 1e6 = 400.  B: 1000*1e6 DIV 900 = 1111111 ppm ->
    # planned 900*1111111 DIV 1e6 = 999 (~its 1000-token share).
    rows = [
        (1, " ".join(f"a{i}" for i in range(100)), "en", "A", 0),
        (2, " ".join(f"b{i}" for i in range(900)), "en", "B", 0),
    ]
    _write(spark, tmp_path, "documents", rows, DOC_SCHEMA)
    out = {
        r.source: (r.tokens, r.share_tokens, r.epochs_ppm, r.planned_tokens)
        for r in REG["select_epoch_mix"].fn(spark, str(tmp_path)).collect()
    }
    assert out == {
        "A": (100, 1000, 4000000, 400),
        "B": (900, 1000, 1111111, 999),
    }


# --------------------------------------------------------------------
# sign-bit Hamming ANN
# --------------------------------------------------------------------


def test_embed_sign_hamming_ann_planted(spark, tmp_path):
    pos = [1.0] * 64
    three_neg = [-1.0] * 3 + [1.0] * 61
    neg = [-1.0] * 64
    rows = [
        (0, pos, 0),        # query (0 % 25 == 0)
        (1, pos, 0),        # hamming 0 (tie with self -> id order)
        (2, three_neg, 0),  # hamming 3
        (3, neg, 0),        # hamming 64
    ]
    _write(spark, tmp_path, "embeddings", rows, EMB_SCHEMA)
    out = [
        (r.query_id, r.vec_id, r.hamming, r.rank)
        for r in sorted(
            REG["embed_sign_hamming_ann"].fn(spark, str(tmp_path)).collect(),
            key=lambda r: r.rank,
        )
    ]
    assert out == [
        (0, 0, 0, 1),
        (0, 1, 0, 2),
        (0, 2, 3, 3),
        (0, 3, 64, 4),
    ]


def test_embed_sign_hamming_matches_python_popcount(spark, tmp_path):
    # random-ish deterministic signs: bit i of vec v negative iff
    # (v*31 + i*7) % 3 == 0 — the packed signature and all pairwise
    # Hamming distances must match a pure-Python replay.
    vecs = []
    for v in range(4):
        emb = [(-1.0 if (v * 31 + i * 7) % 3 == 0 else 1.0) for i in range(64)]
        vecs.append((v * 25, emb, 0))  # all query ids -> all pairs ranked
    _write(spark, tmp_path, "embeddings", vecs, EMB_SCHEMA)

    def sig(emb):
        return sum((1 << i) for i, x in enumerate(emb) if x >= 0)

    sigs = {v_id: sig(e) for v_id, e, _ in vecs}
    expect = {
        (a, b): bin(sigs[a] ^ sigs[b]).count("1")
        for a in sigs
        for b in sigs
    }
    got = {
        (r.query_id, r.vec_id): r.hamming
        for r in REG["embed_sign_hamming_ann"].fn(spark, str(tmp_path)).collect()
    }
    assert got == expect  # 4 vectors -> all 16 pairs are within top-5


# --------------------------------------------------------------------
# aspect bucket plan
# --------------------------------------------------------------------


def test_multimodal_aspect_bucket_plan_planted(spark, tmp_path):
    # ids 0,4,8,12,16 pass the %4 gate; dims (id%7*40+64, id%5*40+64):
    #  0: 64x64   -> 1:1   (idx 0)
    #  4: 224x224 -> 1:1   (idx 0)
    #  8: 104x184 -> 9:16  (idx 4; err 2717 ppm beats 3:4's 184782)
    # 12: 264x144 -> 16:9  (idx 3)
    # 16: 144x104 -> 4:3   (idx 1)
    rows = [(i, "t", "en", "web", 0) for i in range(17)]
    _write(spark, tmp_path, "documents", rows, DOC_SCHEMA)
    out = {
        r.bucket_idx: (r.n_images, r.n_batches)
        for r in REG["multimodal_aspect_bucket_plan"].fn(spark, str(tmp_path)).collect()
    }
    assert out == {0: (2, 1), 1: (1, 1), 3: (1, 1), 4: (1, 1)}


def test_embed_sign_recall_eval_planted(spark, tmp_path):
    # 3 queries (ids 0, 25, 50) in a 4-vector corpus: with distinct
    # non-antipodal sign patterns the Hamming and cosine orders agree,
    # so recall@5 is perfect (top-5 of 4 vectors = everything).
    rows = [
        (0, [1.0] * 64, 0),
        (25, [-1.0] * 3 + [1.0] * 61, 0),
        (50, [-1.0] * 32 + [1.0] * 32, 0),
        (1, [1.0] * 63 + [-1.0], 0),
    ]
    _write(spark, tmp_path, "embeddings", rows, EMB_SCHEMA)
    [r] = REG["embed_sign_recall_eval"].fn(spark, str(tmp_path)).collect()
    assert (r.n_queries, r.n_matched, r.recall_ppm) == (3, 12, 800000)
    # 12/15 = 0.8: each query's top-5 holds only 4 candidates, so 3
    # of the 15 possible matches are structurally absent.


def test_select_epoch_mix_zero_token_source_null_both_engines(spark, tmp_path):
    # an all-whitespace source has 0 tokens: NULL epochs/planned on
    # BOTH engines (review r10: Spark DIV 0 throws; DuckDB // 0 gives
    # NULL which least() then IGNORES, yielding a spurious 4e6 cap)
    import duckdb
    import pandas as pd

    rows = [
        (1, " ".join(f"a{i}" for i in range(10)), "en", "A", 0),
        (2, "   \t  ", "en", "EMPTY", 0),
    ]
    _write(spark, tmp_path, "documents", rows, DOC_SCHEMA)
    out = {
        r.source: (r.tokens, r.epochs_ppm, r.planned_tokens)
        for r in REG["select_epoch_mix"].fn(spark, str(tmp_path)).collect()
    }
    assert out["EMPTY"] == (0, None, None)
    # k=2 sources -> share = 20 DIV 2 = 10 -> exactly 1 epoch of A
    assert out["A"] == (10, 1000000, 10)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    o = con.execute(REG["select_epoch_mix"].sql).df()
    con.close()
    row = o[o.source == "EMPTY"].iloc[0]
    assert pd.isna(row.epochs_ppm) and pd.isna(row.planned_tokens)


def test_embed_sign_recall_eval_no_queries_null_both_engines(spark, tmp_path):
    # no vec_id divisible by 25 -> 0 queries: NULL recall on BOTH
    # engines (review r10)
    import duckdb
    import pandas as pd

    rows = [(1, [1.0] * 64, 0), (2, [-1.0] * 64, 0)]
    _write(spark, tmp_path, "embeddings", rows, EMB_SCHEMA)
    [r] = REG["embed_sign_recall_eval"].fn(spark, str(tmp_path)).collect()
    assert (r.n_queries, r.n_matched, r.recall_ppm) == (0, 0, None)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{tmp_path}/embeddings.parquet/*.parquet')"
    )
    o = con.execute(REG["embed_sign_recall_eval"].sql).df()
    con.close()
    assert int(o.n_queries[0]) == 0 and pd.isna(o.recall_ppm[0])


# --------------------------------------------------------------------
# hard-negative triplet mining (batch 44)
# --------------------------------------------------------------------


def test_embed_hard_negatives_planted(spark, tmp_path):
    # anchor 0 (label 0) against hand-computed cosines: same-label
    # candidates score {1: 10000, 3: 0, 7: 0} -> hardest positive is
    # the MIN, tie between 3 and 7 breaks to the smaller id; cross-
    # label candidates score {5: 10000, 6: 10000, 4: 6000} -> hardest
    # negative is the MAX, tie breaks to id 5.  Anchor 50's label is
    # unique, so its positive arm is empty and it drops.
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),   # anchor
        (1, [1.0, 0.0, 0.0, 0.0], 0),   # cos 1.0, same label
        (3, [0.0, 1.0, 0.0, 0.0], 0),   # cos 0.0 -> hardest positive
        (7, [0.0, 1.0, 0.0, 0.0], 0),   # cos 0.0, tie loser (id 7 > 3)
        (5, [1.0, 0.0, 0.0, 0.0], 1),   # cos 1.0 -> hardest negative
        (6, [1.0, 0.0, 0.0, 0.0], 1),   # cos 1.0, tie loser (id 6 > 5)
        (4, [0.6, 0.8, 0.0, 0.0], 1),   # cos 0.6
        (50, [0.0, 0.0, 1.0, 0.0], 9),  # anchor, unique label -> drops
        # zero-norm vector: excluded by the upstream norm filter on
        # both engines (same label as the anchor — would otherwise
        # poison the positive argmin with a NULL score)
        (2, [0.0, 0.0, 0.0, 0.0], 0),
    ]
    _write(spark, tmp_path, "embeddings", rows, EMB_SCHEMA)
    out = [
        (r.anchor_id, r.pos_id, r.pos_sim_tenk, r.neg_id, r.neg_sim_tenk,
         r.margin_tenk)
        for r in REG["embed_hard_negatives"].fn(spark, str(tmp_path)).collect()
    ]
    assert out == [(0, 3, 0, 5, 10000, -10000)]
    # the DuckDB twin must replay BOTH tie-breaks on the same fixture
    # (the sf oracle data has no score ties, so only this planted run
    # exercises the twin's packed tie arithmetic)
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{tmp_path}/embeddings.parquet/*.parquet')"
    )
    o = con.execute(REG["embed_hard_negatives"].sql).fetchall()
    con.close()
    assert [tuple(int(x) for x in r) for r in o] == [(0, 3, 0, 5, 10000, -10000)]


def test_embed_hard_negatives_single_label_zero_rows_both_engines(
    spark, tmp_path
):
    # an all-one-label corpus has no negative arm anywhere: zero rows
    # on BOTH engines (the final both-arms filter, not an engine error)
    import duckdb

    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.0, 1.0], 0),
        (2, [1.0, 1.0], 0),
    ]
    _write(spark, tmp_path, "embeddings", rows, EMB_SCHEMA)
    assert REG["embed_hard_negatives"].fn(spark, str(tmp_path)).count() == 0
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{tmp_path}/embeddings.parquet/*.parquet')"
    )
    o = con.execute(REG["embed_hard_negatives"].sql).df()
    con.close()
    assert len(o) == 0


def test_embed_hard_negatives_random_matches_python(spark, tmp_path):
    """Randomized replay against a plain-Python implementation: dot /
    (|a||b|) folded left-to-right over the float32-faithful values
    (numpy emulates the parquet round-trip), the same floor
    quantization, then brute-force argmin/argmax with the smaller-id
    tie-break.  Exact equality on every output column, every draw."""
    import math
    import random

    import numpy as np

    rng = random.Random(443)
    for trial in range(3):
        rows = []
        for i in range(30):
            vec = [rng.uniform(-1, 1) for _ in range(8)]
            label = rng.randint(0, 2)
            rows.append((i, vec, label))
        rows.append((30, [0.0] * 8, 0))   # zero-norm: excluded
        rows.append((31, [1.0] * 8, None))  # NULL label: no arms
        _write(spark, tmp_path, "embeddings", rows, EMB_SCHEMA)
        got = sorted(
            (r.anchor_id, r.pos_id, r.pos_sim_tenk, r.neg_id,
             r.neg_sim_tenk, r.margin_tenk)
            for r in REG["embed_hard_negatives"].fn(spark, str(tmp_path)).collect()
        )
        # Python replica on float32-faithful doubles
        vecs = {
            d: [float(np.float32(x)) for x in v]
            for d, v, _ in rows if v is not None
        }
        labels = {d: lb for d, _, lb in rows}

        def norm(v):
            acc = 0.0
            for x in v:
                acc += x * x
            return math.sqrt(acc)

        def sim_tenk(a, b):
            acc = 0.0
            for x, y in zip(vecs[a], vecs[b]):
                acc += x * y
            return int(math.floor(acc / (norm(vecs[a]) * norm(vecs[b]))
                                  * 10000 + 0.5))

        live = [d for d in vecs if norm(vecs[d]) > 0]
        expect = []
        for a in live:
            if a % 25 != 0 or labels[a] is None:
                continue
            pos = [(sim_tenk(a, c), c) for c in live
                   if c != a and labels[c] is not None and labels[c] == labels[a]]
            neg = [(sim_tenk(a, c), c) for c in live
                   if c != a and labels[c] is not None and labels[c] != labels[a]]
            if not pos or not neg:
                continue
            ps, pid = min(pos)
            nbest = max(neg, key=lambda t: (t[0], -t[1]))
            expect.append((a, pid, ps, nbest[1], nbest[0], ps - nbest[0]))
        assert got == sorted(expect)
        assert expect, "draw should produce at least one triplet"
