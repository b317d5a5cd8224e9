"""Sequence packing + sliding-window chunking: planted ground truth
(boundary spans, empty docs, exact-fit and off-by-one chunk sizes).
"""

from __future__ import annotations


def _docs(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    sf = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    return sf


def test_pack_sequences_spans_and_offsets(spark, tmp_path):
    rows = [
        (1, " ".join(["w"] * 500), "en", "srcA", 0),   # fills most of seq 0
        (2, " ".join(["w"] * 100), "en", "srcA", 0),   # spans seq 0 -> 1
        (3, "", "en", "srcA", 0),                       # zero tokens
        (4, " ".join(["w"] * 10), "en", "srcB", 0),    # independent stream
    ]
    sf = _docs(spark, tmp_path, rows)
    from rc_scanner_spark.queries.llm import q_pack_sequences

    got = {
        r["doc_id"]: (
            r["n_tokens"], r["start_offset"], r["first_seq"], r["last_seq"], r["n_seqs"]
        )
        for r in q_pack_sequences(spark, sf).collect()
    }
    assert got[1] == (500, 0, 0, 0, 1)
    # doc2: tokens 500..599 -> crosses the 512 boundary
    assert got[2] == (100, 500, 0, 1, 2)
    # empty doc sits at offset 600, spans nothing beyond its first_seq
    assert got[3] == (0, 600, 1, 1, 1)
    # per-source streams are independent: srcB restarts at offset 0
    assert got[4] == (10, 0, 0, 0, 1)


def test_chunk_overlap_boundaries(spark, tmp_path):
    rows = [
        (1, " ".join(f"a{i}" for i in range(64)), "en", "s", 0),   # exact fit
        (2, " ".join(f"b{i}" for i in range(65)), "en", "s", 0),   # one extra
        (3, "", "en", "s", 0),                                      # empty -> no rows
        (4, "solo", "en", "s", 0),                                  # tiny -> 1 chunk
    ]
    sf = _docs(spark, tmp_path, rows)
    from rc_scanner_spark.queries.llm import q_text_chunk_overlap

    rows_out = q_text_chunk_overlap(spark, sf).collect()
    by_doc: dict[int, list] = {}
    for r in rows_out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert {r["chunk_idx"] for r in by_doc[1]} == {0}
    assert by_doc[1][0]["chunk_words"] == 64
    # 65 words, stride 48: chunks [0..63] and [48..64]
    two = {r["chunk_idx"]: r["chunk_words"] for r in by_doc[2]}
    assert two == {0: 64, 1: 17}
    assert 3 not in by_doc
    assert [(r["chunk_idx"], r["chunk_words"]) for r in by_doc[4]] == [(0, 1)]


def test_zorder_interleave_known_values(spark):
    """Morton interleave against hand-computed values: x=3 (11b),
    y=5 (101b) -> z = 39; plus the identity rows."""
    from pyspark.sql import functions as F

    from rc_scanner_spark.queries.relational5 import _interleave_bits

    df = spark.createDataFrame(
        [(3, 5), (1, 0), (0, 1), (0, 0)], "x bigint, y bigint"
    )
    out = df.select(
        "x", "y", _interleave_bits(F.col("x"), F.col("y")).alias("z")
    ).collect()
    got = {(r["x"], r["y"]): r["z"] for r in out}
    assert got == {(3, 5): 39, (1, 0): 1, (0, 1): 2, (0, 0): 0}


def test_zorder_sort_tightens_file_stats(spark, tmp_path):
    """Writing z-ordered data produces per-file (x, y) min/max ranges
    with far smaller area than an id-ordered layout — the parquet
    row-group stats that make 2-D predicate file-skipping work."""
    import pyarrow.parquet as pq
    import os

    from pyspark.sql import functions as F

    from rc_scanner_spark.queries.relational5 import _interleave_bits

    n, files = 4096, 16
    base = (
        spark.range(n)
        .select(
            F.col("id"),
            (F.col("id") % 64).alias("x"),
            F.floor(F.col("id") / 64).alias("y"),
        )
        .withColumn("z", _interleave_bits(F.col("x"), F.col("y")))
    )

    def bbox_area_sum(path):
        total = 0
        for f in os.listdir(path):
            if not f.endswith(".parquet"):
                continue
            md = pq.read_metadata(os.path.join(path, f))
            xs, ys = [], []
            for rg in range(md.num_row_groups):
                row = md.row_group(rg)
                cols = {row.column(i).path_in_schema: row.column(i).statistics
                        for i in range(row.num_columns)}
                xs += [cols["x"].min, cols["x"].max]
                ys += [cols["y"].min, cols["y"].max]
            total += (max(xs) - min(xs) + 1) * (max(ys) - min(ys) + 1)
        return total

    flat = str(tmp_path / "flat")
    base.repartition(files, "id").write.mode("overwrite").parquet(flat)
    zsorted = str(tmp_path / "zsorted")
    base.repartitionByRange(files, "z").sortWithinPartitions("z").write.mode(
        "overwrite"
    ).parquet(zsorted)

    # hash-partitioned files each span ~the whole 64x64 grid; z-ranged
    # files cover compact tiles — require at least a 4x total shrink
    assert bbox_area_sum(zsorted) * 4 <= bbox_area_sum(flat)


def test_gopher_rules_planted_failures(spark, tmp_path):
    """Each rule must fire on a document built to violate exactly it."""
    from pyspark.sql import functions as F

    good = "the quick brown fox jumps over and over with that same energy"
    rows = [
        (1, good, "en", "s", 0),                                  # passes all
        (2, "too short", "en", "s", 0),                           # word count
        (3, "the " + "hippopotomonstrous " * 30, "en", "s", 0),   # mean word len
        (4, "the " + "### ... ### " * 20 + "of it", "en", "s", 0),# symbol ratio
        (5, "the " + "123 456 789 " * 20 + "and", "en", "s", 0),  # alpha frac
        (6, "lorem ipsum dolor sit amet something entirely else here now", "en", "s", 0),  # stopwords
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    sf = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    from rc_scanner_spark.queries.llm import q_text_gopher_rules

    out = {r["doc_id"]: r.asDict() for r in q_text_gopher_rules(spark, sf).collect()}
    assert out[1]["pass_all"]
    assert not out[2]["pass_word_count"]
    assert not out[3]["pass_mean_word_len"]
    assert not out[4]["pass_symbol_ratio"]
    assert not out[5]["pass_alpha_frac"]
    assert not out[6]["pass_stopwords"]
    for i in (2, 3, 4, 5, 6):
        assert not out[i]["pass_all"]


def _bfd_reference(items, budget):
    """Pure-Python BFD: (tokens desc, id) order, fullest-fitting bin."""
    fills, out = [], {}
    for t, i in sorted(((t, i) for i, t in items), key=lambda p: (-p[0], p[1])):
        best, best_fill = -1, -1
        for b, f in enumerate(fills):
            if f + t <= budget and f > best_fill:
                best, best_fill = b, f
        if best < 0:
            fills.append(0)
            best = len(fills) - 1
        fills[best] += t
        out[i] = (best, fills[best])
    return out


def test_pack_bins_bfd_matches_python_reference(spark):
    from rc_scanner_spark.operators.relational import pack_bins_bfd

    rows = [("s1", i, t) for i, t in enumerate([300, 300, 300, 200, 200, 100, 700, 50])]
    rows += [("s2", 100 + i, t) for i, t in enumerate([512, 512, 1, 600])]
    df = spark.createDataFrame(rows, "source string, doc_id bigint, n_tokens bigint")
    got = {
        r["doc_id"]: (r["bin_id"], round(r["bin_fill_after"] * 512))
        for r in pack_bins_bfd(df, budget=512).collect()
    }
    for grp in ("s1", "s2"):
        items = [(i, t) for s, i, t in rows if s == grp]
        ref = _bfd_reference(items, 512)
        for i, (b, fill) in ref.items():
            assert got[i] == (b, fill), (grp, i)
    # invariant: no bin over budget unless it holds a single oversized doc
    by_bin = {}
    for s, i, t in rows:
        b, _ = got[i]
        by_bin.setdefault((s, b), []).append(t)
    for (s, b), ts in by_bin.items():
        assert sum(ts) <= 512 or (len(ts) == 1 and ts[0] > 512), (s, b, ts)
