"""Declarative data contracts: validate a frame against column rules
and split it into (clean, violations) — ingest-time enforcement so bad
rows are quarantined with a reason instead of poisoning downstream
aggregates.

Rules compile to ONE Catalyst expression block (map-side, no shuffle);
the violation report explodes only failing rows, so at 100 TB the
quarantine side is sized by the error rate, not the corpus.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """One contract rule: ``name`` labels the violation; ``check`` is a
    boolean Column that is True when the row PASSES."""

    name: str
    check: Column


def not_null(col: str) -> Rule:
    return Rule(f"{col}_not_null", F.col(col).isNotNull())


def in_range(col: str, lo, hi) -> Rule:
    """NULL passes (pair with not_null to forbid)."""
    c = F.col(col)
    return Rule(f"{col}_in_range", c.isNull() | ((c >= lo) & (c <= hi)))


def in_set(col: str, values: Sequence) -> Rule:
    c = F.col(col)
    return Rule(f"{col}_in_set", c.isNull() | c.isin(list(values)))


def matches(col: str, pattern: str) -> Rule:
    c = F.col(col)
    return Rule(f"{col}_matches", c.isNull() | c.rlike(pattern))


def validate(df: DataFrame, rules: Sequence[Rule]) -> tuple[DataFrame, DataFrame]:
    """Returns (clean, violations).

    ``clean``: rows passing every rule, original schema.
    ``violations``: one row per (failing row, failed rule) with the
    rule name — exploded from a compact array built map-side.
    """
    # NULL-evaluating checks count as FAILURES: the contract says
    # "check is True when the row PASSES", so anything not-True —
    # including a NULL from un-guarded user rules — quarantines the
    # row instead of silently passing it into clean.
    failed = F.array_compact(
        F.array(
            *[
                F.when(~F.coalesce(r.check, F.lit(False)), F.lit(r.name))
                for r in rules
            ]
        )
    )
    tagged = df.withColumn("_failed", failed)
    clean = tagged.filter(F.size("_failed") == 0).drop("_failed")
    violations = (
        tagged.filter(F.size("_failed") > 0)
        .withColumn("violated_rule", F.explode("_failed"))
        .drop("_failed")
    )
    return clean, violations
