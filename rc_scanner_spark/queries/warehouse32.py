"""Round-12 batch 48: eigen-selection evidence for the PCA family.

* ``embed_power_iter_portable`` — the dominant eigenvalue of the
  embedding covariance matrix (and its explained-variance share) via
  a FIXED 96-step power iteration from a deterministic start vector.
  This is the hash-checkable twin of ``embed_pca_variance``'s eigen
  readout (r11 brief #6): the cov-trace twin covers the gram
  pipeline, this one covers the eigenvector *selection* step — the
  part ``numpy.linalg.eigh`` performs — with an algorithm both
  engines can express.  The DuckDB twin runs the identical iteration
  as a recursive CTE over the d^2-row covariance relation.

Engine-parity: the iteration is self-correcting (it converges toward
the dominant eigenvector regardless of per-step rounding), so the
engines' different SUM accumulation orders (numpy pairwise vs DuckDB
sequential) wash out to ~1e-12 relative — far inside the 1e-6 output
grid.  The explained share is computed from the already-snapped grid
values so both engines divide bit-identical doubles.

Reference scope note: the reference engine (scanner.py:120-175) has
no analytics surface; extends SURVEY.md §2.B's UDF/embedding rows.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import QuerySpec, load_tuned

_t = load_tuned

_PI_DIM = 64  # embeddings.parquet column width (TESTDATA.md)
_PI_ITERS = 96
_PI_V0 = 0.125  # 1/sqrt(64), exact in binary on both engines


def q_embed_power_iter_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top covariance eigenvalue by 96 power-iteration steps.

    Scale shape: the full d x d gram matrix is reduced exactly like
    embed_cov_trace_portable (warehouse29) — Arrow map-side partials,
    one 32-bucket merge, then a BOUNDED <= 32-row collect of d^2-sized
    partials (O(dim^2), not O(rows)) — and the iteration itself is
    O(iters * d^2) driver-side arithmetic on the 64x64 matrix.  At any
    corpus size the distributed work is one pass over the vectors.
    """
    d = _PI_DIM
    emb = _t(spark, sf_dir, "embeddings").select("embedding")

    def gram_partial(batches):
        G = np.zeros((d, d))
        s = np.zeros(d)
        n = 0
        for pdf in batches:
            M = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            G += M.T @ M
            s += M.sum(axis=0)
            n += M.shape[0]
        if n:
            yield pd.DataFrame(
                {"g": [G.reshape(-1).tolist()], "s": [s.tolist()], "n": [n]}
            )

    partial_schema = "g array<double>, s array<double>, n long"

    def gram_merge(pdf: pd.DataFrame) -> pd.DataFrame:
        Gm = np.zeros(d * d)
        sm = np.zeros(d)
        nm = 0
        for g_arr, s_arr, cnt in zip(pdf["g"], pdf["s"], pdf["n"]):
            Gm += np.asarray(g_arr, dtype=np.float64)
            sm += np.asarray(s_arr, dtype=np.float64)
            nm += int(cnt)
        return pd.DataFrame({"g": [Gm.tolist()], "s": [sm.tolist()], "n": [nm]})

    parts = (
        emb.mapInPandas(gram_partial, partial_schema)
        .groupBy(F.pmod(F.spark_partition_id(), F.lit(32)).alias("b"))
        .applyInPandas(gram_merge, partial_schema)
        .collect()  # bounded: <= 32 merged partials at ANY partition count
    )
    G = np.zeros((d, d))
    s = np.zeros(d)
    n = 0
    for row in parts:
        G += np.asarray(row["g"], dtype=np.float64).reshape(d, d)
        s += np.asarray(row["s"], dtype=np.float64)
        n += int(row["n"])
    mean = s / n
    # same formula as the twin's avg(xi*xj) - avg(xi)*avg(xj)
    C = G / n - np.outer(mean, mean)

    v = np.full(d, _PI_V0)
    for _ in range(_PI_ITERS):
        w = C @ v
        v = w / math.sqrt(float(w @ w))
    lam = float(v @ (C @ v))
    trace = float(C.diagonal().sum())

    eig_g = math.floor(lam * 1e6 + 0.5) / 1e6
    tr_g = math.floor(trace * 1e6 + 0.5) / 1e6
    # ratio of the SNAPPED values: both engines divide identical doubles
    explained_ppm = math.floor(eig_g / tr_g * 1e6 + 0.5)
    return spark.createDataFrame(
        [(eig_g, tr_g, explained_ppm)],
        "top_eig double, cov_trace double, explained_ppm long",
    )


SQL_EMBED_POWER_ITER_PORTABLE = f"""
WITH RECURSIVE el AS (
  SELECT vec_id,
         unnest(range(1, {_PI_DIM + 1})) AS i,
         unnest(embedding::DOUBLE[]) AS x
  FROM embeddings
),
cov AS (
  SELECT a.i AS i, b.i AS j,
         sum(a.x * b.x) / count(*)
           - (sum(a.x) / count(*)) * (sum(b.x) / count(*)) AS c
  FROM el a JOIN el b USING (vec_id)
  GROUP BY 1, 2
),
pit(t, vec) AS (
  -- CAST: a bare {_PI_V0!r} literal is DECIMAL(4,3) and the recursive
  -- union would quantize EVERY iterate to 3 decimals (PARITY trap)
  SELECT 0, list_transform(range({_PI_DIM}),
                           x -> CAST({_PI_V0!r} AS DOUBLE))
  UNION ALL
  SELECT t + 1,
         (WITH w AS (
            SELECT c.i AS i, sum(c.c * vec[c.j]) AS wi
            FROM cov c GROUP BY c.i)
          SELECT list(wi / sqrt((SELECT sum(wi * wi) FROM w)) ORDER BY i)
          FROM w)
  FROM pit WHERE t < {_PI_ITERS}
),
fin AS (SELECT vec FROM pit WHERE t = {_PI_ITERS}),
lam AS (
  SELECT sum(c.c * f.vec[c.i] * f.vec[c.j]) AS l FROM cov c, fin f
),
tr AS (SELECT sum(c) AS tv FROM cov WHERE i = j)
SELECT floor(l * 1e6 + 0.5) / 1e6 AS top_eig,
       floor(tv * 1e6 + 0.5) / 1e6 AS cov_trace,
       CAST(floor((floor(l * 1e6 + 0.5) / 1e6)
                  / (floor(tv * 1e6 + 0.5) / 1e6) * 1e6 + 0.5) AS BIGINT)
           AS explained_ppm
FROM lam, tr
"""


QUERIES: dict[str, QuerySpec] = {
    "embed_power_iter_portable": QuerySpec(
        q_embed_power_iter_portable, SQL_EMBED_POWER_ITER_PORTABLE
    ),
}
