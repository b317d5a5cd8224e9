"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query (the full scanner pipeline,
  reference eval_change scanner.py:120-175 re-expressed as one
  Catalyst plan) on sf0.001.
- ``queries()``: every implemented operator from SURVEY.md §2 as a
  named (spark, sf_dir) -> DataFrame builder.
- ``oracle_sql()``: the DuckDB twin for each SQL-expressible query;
  hash-function-dependent ops (MinHash/SimHash/hyperplane LSH) are
  omitted -> rows-only check (their ground-truth tests live in
  tests/test_dedup.py and tests/test_similarity.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from rc_scanner_spark.queries import build_registry

_REGISTRY = build_registry()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _REGISTRY["scan_pipeline_full"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return {name: spec.sql for name, spec in _REGISTRY.items() if spec.sql is not None}
