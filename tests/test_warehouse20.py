"""Planted-semantics tests for round-7 batch 28 (the oracle gate can't
catch a flaw mirrored into the SQL twin; hand-computed fixtures can)."""

from __future__ import annotations

import math

from rc_scanner_spark.queries import build_registry

from tests.conftest import write_fixture

REG = build_registry()
_write = write_fixture

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def test_text_lang_confusion_planted(spark, tmp_path):
    rows = [
        (1, "the cat and the dog", "en", "A", 19),   # en -> en
        (2, "the quick of and to", "en", "A", 19),   # en -> en
        (3, "the cat and the dog", "de", "A", 19),   # de declared, en text
        (4, "der hund und die katze", "de", "A", 22),  # de -> de
        (5, "totally markerless words", "fr", "A", 24),  # fr -> und
        (6, "你好 world", "en", "A", 8),               # CJK fast path -> zh
    ]
    _write(spark, tmp_path, "documents", rows, DOC_SCHEMA)
    out = {
        (r.lang_declared, r.lang_pred): (r.n_docs, r.row_share_ppm)
        for r in REG["text_lang_confusion"].fn(spark, str(tmp_path)).collect()
    }
    assert out == {
        ("en", "en"): (2, 666666),
        ("en", "zh"): (1, 333333),
        ("de", "en"): (1, 500000),
        ("de", "de"): (1, 500000),
        ("fr", "und"): (1, 1000000),
    }


def test_embed_centroid_drift_planted(spark, tmp_path):
    def vec(i, v):
        out = [0.0] * 64
        out[i] = v
        return out

    rows = [
        # label 0: even members on axis 0, odd members on axis 1
        (0, vec(0, 1.0), 0),
        (2, vec(0, 1.0), 0),
        (1, vec(1, 1.0), 0),
        # label 1: halves identical -> drift cosine 1.0
        (4, vec(2, 1.0), 1),
        (5, vec(2, 1.0), 1),
        # label 2: only even members -> no drift row (inner join)
        (6, vec(3, 1.0), 2),
    ]
    _write(
        spark, tmp_path, "embeddings", rows,
        "vec_id long, embedding array<float>, label long",
    )
    out = {
        r.label: (r.n_even, r.n_odd, r.drift_cos_ppm)
        for r in REG["embed_centroid_drift"].fn(spark, str(tmp_path)).collect()
    }
    assert out == {0: (2, 1, 0), 1: (1, 1, 1000000)}


def test_embed_centroid_drift_zero_norm_null_both_engines(spark, tmp_path):
    # ADVICE r8: a label whose odd-half centroid is all-zero must yield
    # a NULL drift_cos_ppm on BOTH engines (Spark cosine() guards the
    # 0 denominator; the twin needs the list_dot_product CASE — DuckDB
    # list_cosine_similarity alone returns -1.0 for a zero vector).
    import duckdb

    def vec(i, v):
        out = [0.0] * 64
        out[i] = v
        return out

    rows = [
        (0, vec(0, 1.0), 0),        # even half: axis-0 unit vector
        (1, [0.0] * 64, 0),         # odd half: zero vector
        (2, vec(1, 1.0), 1),        # control label: identical halves
        (3, vec(1, 1.0), 1),
    ]
    _write(
        spark, tmp_path, "embeddings", rows,
        "vec_id long, embedding array<float>, label long",
    )
    out = {
        r.label: (r.n_even, r.n_odd, r.drift_cos_ppm)
        for r in REG["embed_centroid_drift"].fn(spark, str(tmp_path)).collect()
    }
    assert out == {0: (1, 1, None), 1: (1, 1, 1000000)}
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{tmp_path}/embeddings.parquet/*.parquet')"
    )
    o = con.execute(REG["embed_centroid_drift"].sql).df()
    con.close()
    by_label = {int(r.label): r for r in o.itertuples()}
    import pandas as pd

    assert pd.isna(by_label[0].drift_cos_ppm)
    assert int(by_label[1].drift_cos_ppm) == 1000000


def test_graph_clustering_coefficient_planted(spark, tmp_path):
    # triangle {1,2,3} plus pendant edge 3-4 (each pair in 2 orders for
    # support): deg(1)=deg(2)=2 coeff 1.0; deg(3)=3 coeff 2/(3*2)=1/3;
    # deg(4)=1 excluded
    rows = []
    ok = 0
    for a, b in [(1, 2), (1, 3), (2, 3), (3, 4)]:
        for _ in range(2):
            ok += 1
            rows += [(ok, a), (ok, b)]
    _write(
        spark, tmp_path, "lineitem", rows,
        "l_orderkey long, l_partkey long",
    )
    out = {
        r.degree: (r.n_nodes, r.avg_coeff_ppm)
        for r in REG["graph_clustering_coefficient"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert out == {2: (2, 1000000), 3: (1, 333333)}


def test_agg_theil_index_planted(spark, tmp_path):
    orows = [
        (1, 1, "O", 100.0, "1995-01-01", "1-URGENT"),
        (2, 2, "O", 300.0, "1995-01-02", "1-URGENT"),
        (3, 3, "O", 50.0, "1995-01-03", "1-URGENT"),
    ]
    _write(
        spark, tmp_path, "orders", orows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, o_orderpriority string",
    )
    crows = [
        (1, "c1", 0, 0.0, "AUTO"),
        (2, "c2", 0, 0.0, "AUTO"),
        (3, "c3", 0, 0.0, "BUILD"),  # single customer -> Theil 0
    ]
    _write(
        spark, tmp_path, "customer", crows,
        "c_custkey long, c_name string, c_nationkey long, "
        "c_acctbal double, c_mktsegment string",
    )
    out = {
        r.segment: (r.n_customers, r.theil_ppb)
        for r in REG["agg_theil_index"].fn(spark, str(tmp_path)).collect()
    }
    # AUTO: cents 10000/30000, mu=20000; terms 0.5*ln0.5, 1.5*ln1.5
    t1 = math.floor(0.5 * math.log(0.5) * 1e9 + 0.5)
    t2 = math.floor(1.5 * math.log(1.5) * 1e9 + 0.5)
    expect_auto = int((t1 + t2) / 2) if (t1 + t2) >= 0 else -((-(t1 + t2)) // 2)
    n, theil = out["AUTO"]
    assert n == 2
    # +-2 ppb slack: JVM vs libm ln may differ in the last ulp
    assert abs(theil - expect_auto) <= 2
    # single-customer segment: x == mu -> ln(1) == 0 exactly
    assert out["BUILD"] == (1, 0)


def _oracle_docs_df(tmp_path, sql):
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    try:
        return con.execute(sql).df()
    finally:
        con.close()


def test_agg_theil_index_zero_spend_excluded(spark, tmp_path):
    # review r7: a zero-cents customer made Spark's F.log(0) NULL
    # (term dropped, n still counted — wrong Theil) while DuckDB's
    # ln(0) threw.  Zero spenders are excluded on both sides.
    orows = [
        (1, 1, "O", 100.0, "1995-01-01", "1-URGENT"),
        (2, 2, "O", 0.0, "1995-01-02", "1-URGENT"),
    ]
    _write(
        spark, tmp_path, "orders", orows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, o_orderpriority string",
    )
    crows = [
        (1, "c1", 0, 0.0, "AUTO"),
        (2, "c2", 0, 0.0, "AUTO"),
    ]
    _write(
        spark, tmp_path, "customer", crows,
        "c_custkey long, c_name string, c_nationkey long, "
        "c_acctbal double, c_mktsegment string",
    )
    out = {
        r.segment: (r.n_customers, r.theil_ppb)
        for r in REG["agg_theil_index"].fn(spark, str(tmp_path)).collect()
    }
    # only the positive spender remains -> single-customer Theil == 0
    assert out == {"AUTO": (1, 0)}


def test_select_mix_planner_vertical_tab_parity(spark, tmp_path):
    # review r7: the twin tokenized with RE2 '\\S+', which unlike Java
    # \\s+ does NOT split on vertical tab (U+000B) — token counts
    # diverged on any corpus containing \x0B.  Both sides must agree.
    rows = [(1, "alpha\x0bbeta gamma", "en", "A", 16)]
    _write(spark, tmp_path, "documents", rows, DOC_SCHEMA)
    spark_rows = (
        REG["select_mix_planner"].fn(spark, str(tmp_path)).collect()
    )
    assert spark_rows[0].tokens_available == 3
    odf = _oracle_docs_df(tmp_path, REG["select_mix_planner"].sql)
    assert int(odf["tokens_available"][0]) == 3


def test_select_mix_planner_planted(spark, tmp_path):
    rows = [
        (1, " ".join(["w"] * 10), "en", "A", 20),      # 10 tokens
        (2, " ".join(["w"] * 40000), "en", "B", 80000),  # 40000 tokens
        (3, " ".join(["w"] * 60000), "en", "C", 120000),  # 60000 tokens
        (4, "", "en", "D", 0),                          # 0 tokens: excluded
    ]
    _write(spark, tmp_path, "documents", rows, DOC_SCHEMA)
    out = {
        r.source: (r.tokens_available, r.alloc_tokens, r.rate_ppm, r.epochs)
        for r in REG["select_mix_planner"].fn(spark, str(tmp_path)).collect()
    }
    # budget 100000 over 3 sources -> alloc 33333
    assert out == {
        "A": (10, 33333, 1000000, 3334),        # (33333+9)//10
        "B": (40000, 33333, 833325, 1),         # floor(33333e6/40000)
        "C": (60000, 33333, 555550, 1),
    }
