"""Vector math over ``array<float>`` embedding columns — pure Catalyst.

Similarity search at 100 TB must stay JVM-side: ``zip_with`` +
``aggregate`` compile to codegen'd loops over the array, no Python, no
UDF serde.  All math is done in DOUBLE so results are stable across
engines (the parquet column is float32; cast first).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


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
