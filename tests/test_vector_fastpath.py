"""The SQL fast-path vector math (functions/vectors.py r14) must be
BIT-identical to the interpreted fold forms: same seed, same
left-to-right association, fold fallback for non-FAST_DIMS lengths.
A single ulp of drift would flip rounded similarity values and break
the driver's exact hash, so equality here is bytewise on the double.
"""

from __future__ import annotations

import random
import struct

from pyspark.sql import functions as F

from rc_scanner_spark.functions.vectors import (
    FAST_DIMS,
    cosine,
    cosine_sim_sql,
    dot,
    dot_sql,
    norm,
    norm_sql,
)


def _bits(x):
    return None if x is None else struct.pack("<d", x)


def test_fastpath_bitwise_matches_fold(spark):
    random.seed(20260817)
    rows = []
    for n in range(300):
        dims = FAST_DIMS if n < 200 else random.choice(
            [0, 1, 3, FAST_DIMS - 1, FAST_DIMS, FAST_DIMS + 1, 128]
        )
        a = [
            random.uniform(-3, 3) if random.random() > 0.15 else 0.0
            for _ in range(dims)
        ]
        b = [
            random.uniform(-3, 3) if random.random() > 0.15 else 0.0
            for _ in range(dims)
        ]
        rows.append((n, a, b))
    # degenerate rows: zero vectors, negative zeros
    rows.append((9001, [0.0] * FAST_DIMS, [1.0] * FAST_DIMS))
    rows.append((9002, [-0.0] * FAST_DIMS, [0.0] * FAST_DIMS))
    rows.append((9003, [], []))
    df = spark.createDataFrame(rows, "id long, a array<double>, b array<double>")
    got = df.select(
        "id",
        F.expr(dot_sql("a", "b")).alias("fast_dot"),
        dot(F.col("a"), F.col("b")).alias("fold_dot"),
        F.expr(norm_sql("a")).alias("fast_norm"),
        norm(F.col("a")).alias("fold_norm"),
        F.expr(cosine_sim_sql("a", "b")).alias("fast_cos"),
        cosine(F.col("a"), F.col("b")).alias("fold_cos"),
    ).collect()
    for r in got:
        assert _bits(r.fast_dot) == _bits(r.fold_dot), (r.id, r.fast_dot, r.fold_dot)
        assert _bits(r.fast_norm) == _bits(r.fold_norm), (
            r.id,
            r.fast_norm,
            r.fold_norm,
        )
        assert _bits(r.fast_cos) == _bits(r.fold_cos), (r.id, r.fast_cos, r.fold_cos)


def test_fastpath_precomputed_norms_match(spark):
    random.seed(99)
    rows = [
        (
            n,
            [random.uniform(-1, 1) for _ in range(FAST_DIMS)],
            [random.uniform(-1, 1) for _ in range(FAST_DIMS)],
        )
        for n in range(50)
    ]
    df = (
        spark.createDataFrame(rows, "id long, a array<double>, b array<double>")
        .withColumn("an", F.expr(norm_sql("a")))
        .withColumn("bn", F.expr(norm_sql("b")))
    )
    got = df.select(
        F.expr(cosine_sim_sql("a", "b")).alias("inline"),
        F.expr(cosine_sim_sql("a", "b", a_norm="an", b_norm="bn")).alias("pre"),
    ).collect()
    for r in got:
        assert _bits(r.inline) == _bits(r.pre)
