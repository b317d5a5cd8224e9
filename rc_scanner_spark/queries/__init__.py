"""The query registry: every operator from SURVEY.md §2 as a named
(PySpark builder, DuckDB oracle SQL) pair.

``QUERIES[name] = QuerySpec(fn, sql)`` where ``fn(spark, sf_dir) ->
DataFrame`` and ``sql`` is the ANSI-SQL twin DuckDB runs on the same
parquet tables (views: region nation customer supplier part orders
lineitem events documents embeddings).  ``sql=None`` marks genuinely
non-SQL-expressible ops (hash-function-dependent LSH internals) — the
driver then records a weaker rows-only check.

Alias discipline: every computed column is aliased identically on both
sides (the driver sorts columns by name before hashing values).
Doubles are rounded on both sides; counts are BIGINT on both sides.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    sql: Optional[str]


def build_registry() -> dict[str, QuerySpec]:
    from . import (
        llm,
        relational,
        relational2,
        relational3,
        relational4,
        relational5,
        scanner_queries,
        sketches,
        sql_api,
    )

    out: dict[str, QuerySpec] = {}
    for mod in (
        relational,
        relational2,
        relational3,
        relational4,
        relational5,
        sql_api,
        scanner_queries,
        llm,
        sketches,
    ):
        for name, spec in mod.QUERIES.items():
            if name in out:
                raise ValueError(f"duplicate query name {name}")
            out[name] = spec
    return out
