"""Semantic ground-truth tests for the round-5 LLM-pipeline
additions (llm2.py): int8 quantization fidelity, PQ ANN duplicate
ranking, Bloom no-false-negative invariant, cluster-representative
selection, containment asymmetry, bigram-LM ordering.  (Value-level
correctness vs DuckDB is covered by the oracle twins; these tests pin
the semantic claims the oracles can't express.)
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rc_scanner_spark.queries.llm2 import (
    q_ann_pq_topk,
    q_dedup_containment,
    q_dedup_keep_best,
    q_embed_quantize_int8,
    q_select_dsir,
    q_sketch_bloom_membership,
    q_text_bigram_logprob,
)

from tests.conftest import SF_SMOKE


def _write_docs(spark, path, rows):
    spark.createDataFrame(
        [
            (r[0], r[1], "en", r[2] if len(r) > 2 else "src0", len(r[1]))
            for r in rows
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def test_quantize_reconstruction_fidelity(spark):
    out = q_embed_quantize_int8(spark, SF_SMOKE)
    bad = out.filter(F.col("recon_cos") < 0.99).count()
    assert bad == 0, "int8 (255-level) reconstruction should keep cosine >= 0.99"


def test_pq_exact_duplicate_ranks_first(spark, tmp_path):
    import numpy as np

    rng = np.random.default_rng(7)
    vecs = {i: rng.normal(size=64).astype("float32") for i in range(40)}
    vecs[30] = vecs[25].copy()  # plant an exact duplicate of query 25
    spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in vecs.items()],
        "vec_id long, embedding array<float>, label int",
    ).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")

    out = q_ann_pq_topk(spark, str(tmp_path))
    top1 = {
        r["qid"]: r["vec_id"]
        for r in out.filter(F.col("rnk") == 1).collect()
    }
    # An exact duplicate shares all PQ codes with the query, so its ADC
    # distance is the per-subspace minimum -> rank 1.
    assert top1[25] == 30


def test_bloom_membership_invariants(spark):
    rows = q_sketch_bloom_membership(spark, SF_SMOKE).collect()
    n_out = sum(1 for r in rows if not r["in_corpus"])
    false_neg = [r for r in rows if r["in_corpus"] and not r["bloom_hit"]]
    false_pos = [r for r in rows if not r["in_corpus"] and r["bloom_hit"]]
    assert not false_neg, "Bloom filters never produce false negatives"
    # m=4096 bits / ~250 keys * 3 hashes -> fill ~17%, FP ~ 0.17^3.
    assert len(false_pos) <= max(2, 0.1 * n_out)


def test_keep_best_picks_longest_per_cluster(spark):
    out = q_dedup_keep_best(spark, SF_SMOKE)
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "n_chars"
    )
    j = out.join(docs, "doc_id")
    per_comp = j.groupBy("component").agg(
        F.max("n_chars").alias("mx"),
        F.sum(F.col("kept").cast("int")).alias("n_kept"),
        F.max(F.when(F.col("kept"), F.col("n_chars"))).alias("kept_chars"),
    )
    bad = per_comp.filter(
        (F.col("n_kept") != 1) | (F.col("kept_chars") != F.col("mx"))
    ).count()
    assert bad == 0


def test_containment_is_asymmetric(spark, tmp_path):
    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    extended = base + (
        " kilo lima mike november oscar papa quebec romeo sierra tango"
    )
    other = "zulu yankee xray whiskey victor uniform tree stone river quartz"
    _write_docs(spark, tmp_path, [(1, base), (2, extended), (3, other)])

    got = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in q_dedup_containment(spark, str(tmp_path)).collect()
    }
    # Every shingle of the base doc appears in the extended doc...
    assert got.get((1, 2)) == pytest.approx(1.0)
    # ...but the extended doc is NOT contained in the base (8/18 < 0.8),
    # and the unrelated doc matches nothing.
    assert (2, 1) not in got
    assert all(3 not in pair for pair in got)


def test_bigram_lm_prefers_predictable_text(spark, tmp_path):
    # In a corpus-self-trained bigram LM the discriminating signal is
    # the branching factor of each prefix: a deterministic chain
    # (every w1 has ONE successor -> p(w2|w1) = 1) must out-score a
    # high-branching doc (prefix 'x' splits over 4 successors ->
    # p(w2|x) = 1/4), regardless of raw counts.
    chain = " ".join(["alpha bravo charlie delta echo"] * 20)
    branchy = " ".join(["x papa", "x quebec", "x romeo", "x sierra"] * 5)
    _write_docs(spark, tmp_path, [(1, chain), (2, branchy)])

    scores = {
        r["doc_id"]: r["avg_neg_logprob"]
        for r in q_text_bigram_logprob(spark, str(tmp_path)).collect()
    }
    assert scores[1] < scores[2]


def test_dsir_scores_target_like_docs_higher(spark, tmp_path):
    # Target domain (sources src0-src4) speaks the alpha/bravo
    # vocabulary; an off-domain doc that shares it should importance-
    # score above an off-domain doc that doesn't.
    tgt = "alpha bravo charlie delta alpha bravo charlie delta echo foxtrot"
    _write_docs(
        spark,
        tmp_path,
        [
            (1, tgt, "src0"),
            (2, tgt + " golf hotel", "src1"),
            (10, "alpha bravo charlie delta echo", "src10"),
            (11, "zinc yarrow walnut vermilion umber", "src10"),
        ],
    )
    scores = {
        r["doc_id"]: r["log_w"]
        for r in q_select_dsir(spark, str(tmp_path)).collect()
    }
    assert scores[10] > scores[11]


def test_ivfpq_routes_cells_and_finds_near_dups(spark, tmp_path):
    import numpy as np

    from rc_scanner_spark.queries.llm2 import q_ann_ivfpq_topk

    rng = np.random.default_rng(3)
    centers = rng.normal(size=(8, 64)) * 5.0
    vecs = {
        i: (centers[i % 8] + rng.normal(size=64) * 0.5).astype("float32")
        for i in range(400)
    }
    # Plant a near-duplicate of query 25 (perturbation << cluster spread).
    vecs[30] = np.array(vecs[25]) + rng.normal(size=64).astype("float32") * 0.01
    lab = {i: (i % 8 if i != 30 else 25 % 8) for i in vecs}
    spark.createDataFrame(
        [(i, [float(x) for x in v], lab[i]) for i, v in vecs.items()],
        "vec_id long, embedding array<float>, label int",
    ).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")

    by_q = {}
    for r in q_ann_ivfpq_topk(spark, str(tmp_path)).collect():
        by_q.setdefault(r["qid"], []).append((r["rnk"], r["vec_id"]))
    # IVF routing: every returned neighbor lives in the query's cluster.
    same = sum(
        1 for q, rs in by_q.items() for _, v in rs if lab[v] == lab[q]
    )
    tot = sum(len(rs) for rs in by_q.values())
    assert same / tot >= 0.9
    # PQ: the planted near-duplicate beats every true-cluster sibling.
    assert min(by_q[25])[1] == 30


def test_temperature_mix_boosts_small_sources(spark, tmp_path):
    from rc_scanner_spark.queries.llm2 import q_sample_temperature_mix

    rows = [(i, f"doc {i} words here", "src0") for i in range(90)]
    rows += [(100 + i, f"rare {i} words here", "src19") for i in range(10)]
    _write_docs(spark, tmp_path, rows)

    out = {
        r["source"]: r
        for r in q_sample_temperature_mix(spark, str(tmp_path)).collect()
    }
    # alpha < 1 compresses the size ratio: small sources gain share,
    # large sources lose it, and shares still sum to 1.
    assert out["src19"]["boost"] > 1.0 > out["src0"]["boost"]
    assert out["src19"]["temp_share"] > out["src19"]["raw_share"]
    total = sum(r["temp_share"] for r in out.values())
    assert abs(total - 1.0) < 1e-4


def test_events_gap_fill_is_dense_with_zero_rows(spark, tmp_path):
    from datetime import datetime

    from rc_scanner_spark.queries.llm2 import q_events_gap_fill

    rows = [
        (1, datetime(2026, 8, 1, 0, 30), 10, "click", 1.0, "{}"),
        (2, datetime(2026, 8, 1, 3, 10), 11, "click", 2.0, "{}"),
        (3, datetime(2026, 8, 1, 1, 5), 12, "view", 5.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")

    out = q_events_gap_fill(spark, str(tmp_path)).collect()
    clicks = sorted(
        (r for r in out if r["event_type"] == "click"), key=lambda r: r["h"]
    )
    # Dense spine 00:00..03:00 with explicit zero rows for the gap.
    assert [r["h"].hour for r in clicks] == [0, 1, 2, 3]
    assert [r["n"] for r in clicks] == [1, 0, 0, 1]
    assert [r["sum_value"] for r in clicks] == [1.0, 0.0, 0.0, 2.0]
