"""Vector math over ``array<float>`` embedding columns — pure Catalyst.

Similarity search at 100 TB must stay JVM-side: no Python, no UDF
serde.  All math is done in DOUBLE so results are stable across
engines (the parquet column is float32; cast first).

Two tiers (r14):

- ``dot``/``norm``/``cosine`` — generic Column forms over the
  interpreted ``aggregate``/``zip_with`` fold.  Composable anywhere
  (including inside higher-order-function lambdas), any vector length.
- ``dot_sql``/``norm_sql``/``cosine_sim_sql`` — SQL-string builders
  for *named columns* in the flat, per-pair hot paths (the ANN
  scoring projections).  They emit a size-guarded UNROLLED sum for the
  fixture dimensionality with the fold as the per-row fallback, built
  as ONE ``F.expr`` string.

Why the split, measured at r14 on 2M 64-dim pairs (warm, noop sink):
fold 4.16 s, bare unrolled 4.69 s (one giant codegen method — HotSpot
refuses to JIT it), size-guarded unrolled + fold fallback **0.57 s**
(the CASE splits the generated code into JIT-able methods).  Building
the guarded tree out of ~400 Column calls, however, costs ~0.3-0.5 s
of py4j round-trips per call site per plan — so the fast form is an
expression STRING (one py4j call), usable only where the operands are
plain column names.  The unrolled chain reproduces the fold's float
semantics exactly: same ``0.0 +`` seed, same left-to-right
association — bit-identical results (pinned by
tests/test_vector_fastpath.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Dimensionality the unrolled fast path is generated for (the
#: embeddings fixture and every registry query use 64-dim vectors;
#: other lengths take the fold fallback branch, same results).
FAST_DIMS = 64


def as_double_array(v: Column) -> Column:
    return v.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Left-to-right summed dot product (deterministic fold order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL-safe-ish (0-norm vectors yield NULL,
    matching SQL division semantics so the DuckDB oracle agrees)."""
    a = as_double_array(a)
    b = as_double_array(b)
    denom = norm(a) * norm(b)
    return F.when(denom != 0, dot(a, b) / denom)


# ---------------------------------------------------------------------
# SQL-string fast path (named columns, flat projections)
# ---------------------------------------------------------------------


def _fold_dot_sql(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y),"
        " 0.0D, (acc, x) -> acc + x)"
    )


def _fold_norm_sq_sql(a: str) -> str:
    return f"aggregate({a}, 0.0D, (acc, x) -> acc + x * x)"


def dot_sql(a: str, b: str, dims: int = FAST_DIMS) -> str:
    """Size-guarded unrolled dot product over two named array<double>
    columns — bit-identical to ``dot`` (same seed + association)."""
    terms = " + ".join(f"get({a}, {i}) * get({b}, {i})" for i in range(dims))
    return (
        f"(CASE WHEN size({a}) = {dims} AND size({b}) = {dims}"
        f" THEN (0.0D + {terms})"
        f" ELSE {_fold_dot_sql(a, b)} END)"
    )


def norm_sql(a: str, dims: int = FAST_DIMS) -> str:
    """Size-guarded unrolled L2 norm — bit-identical to ``norm``."""
    terms = " + ".join(f"get({a}, {i}) * get({a}, {i})" for i in range(dims))
    return (
        f"sqrt(CASE WHEN size({a}) = {dims} THEN (0.0D + {terms})"
        f" ELSE {_fold_norm_sq_sql(a)} END)"
    )


def cosine_sim_sql(
    a: str,
    b: str,
    *,
    a_norm: str | None = None,
    b_norm: str | None = None,
    dims: int = FAST_DIMS,
) -> str:
    """``cosine(a, b)`` as a SQL string over named array<double>
    columns; pass ``a_norm``/``b_norm`` column names to reuse
    precomputed per-row norms (same value as computing them in place,
    so results are unchanged — just fewer evaluations)."""
    na = a_norm if a_norm is not None else norm_sql(a, dims)
    nb = b_norm if b_norm is not None else norm_sql(b, dims)
    denom = f"({na} * {nb})"
    return (
        f"(CASE WHEN {denom} != 0.0D"
        f" THEN {dot_sql(a, b, dims)} / {denom} END)"
    )
