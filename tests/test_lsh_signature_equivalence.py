"""Pin the LSH SQL-string signatures to their Column-API canon
(ADVICE r14): the batch-7 rewrite inlined ``hyperplane_signature`` /
``_portable_sign_bit`` into SQL expression strings for driver-latency
reasons, leaving the Column forms as the readable spec.  Nothing else
ties the two together — they could silently drift, which is exactly
the oracle-parity bug class this repo guards against (the float
``lsh_ann_pairs`` is rows-only at the driver, so the oracle would not
catch a drifted bucket set).  These tests evaluate BOTH forms over the
fixture embeddings and require bit-equal signatures for every table
the operators use.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rc_scanner_spark.operators.similarity import (
    _portable_sig_sql,
    _portable_sign_bit,
    _sig_sql,
    hyperplane_signature,
)
from rc_scanner_spark.tables import load_table

from .conftest import SF_SMOKE

NUM_PLANES = 12


def _base(spark):
    return (
        load_table(spark, SF_SMOKE, "embeddings")
        .select(
            F.col("vec_id").alias("id"),
            F.col("embedding").alias("v"),
        )
    )


def test_float_xxhash_sig_sql_matches_column_canon(spark):
    df = _base(spark)
    for t in range(4):  # lsh_ann_pairs uses num_tables=4
        both = df.select(
            "id",
            hyperplane_signature(F.col("v"), NUM_PLANES, t).alias("canon"),
            F.expr(_sig_sql(t, NUM_PLANES)).alias("sqlsig"),
        )
        diverged = both.filter(
            ~F.col("canon").eqNullSafe(F.col("sqlsig"))
        ).count()
        assert diverged == 0, f"table {t}: SQL signature drifted from canon"


def test_portable_md5_sig_sql_matches_column_canon(spark):
    scale = 1_000_000
    df = _base(spark).withColumn(
        "fx",
        F.transform(
            F.col("v").cast("array<double>"),
            lambda x: F.round(x * scale).cast("long"),
        ),
    )

    def canon_sig(t: int):
        sig = F.lit(0).cast("long")
        for p in range(NUM_PLANES):
            prods = F.zip_with(
                F.col("fx"),
                F.sequence(F.lit(0), F.size("fx") - 1),
                lambda x, d: F.when(
                    _portable_sign_bit(t, p, d) == 1, x
                ).otherwise(-x),
            )
            dot = F.aggregate(
                prods, F.lit(0).cast("long"), lambda a, x: a + x
            )
            sig = sig + F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0))
        return sig

    for t in range(2):  # lsh_ann_pairs_portable uses num_tables=2
        both = df.select(
            "id",
            canon_sig(t).alias("canon"),
            F.expr(f"CAST({_portable_sig_sql(t, NUM_PLANES)} AS BIGINT)").alias(
                "sqlsig"
            ),
        )
        diverged = both.filter(
            ~F.col("canon").eqNullSafe(F.col("sqlsig"))
        ).count()
        assert diverged == 0, f"table {t}: portable SQL signature drifted"
