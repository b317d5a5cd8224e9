"""Declarative filter specs compiled to Catalyst predicates.

``FilterSpec`` is the Spark-first form of the reference's ``Filter``
class (filter_.py:17-112).  Where the reference delegates predicate
evaluation to a row-at-a-time iterator (filter_.py:107), a FilterSpec
compiles to a single ``pyspark.sql.Column`` tree, so Catalyst gets to
push it into the parquet scan / stream source.

Semantics pinned to the reference:

- ``streamfilter``: attribute -> scalar (equality) or iterable
  (membership), exactly like EventStreams.register_filter kwargs
  (filter_.py:32,43-47).
- ``sites``: injected ``server_name IN sites`` predicate
  (filter_.py:58).
- ``max_edits``: NULL disables the predicate, and the comparison is
  **inclusive** (``editcount <= max_edits``) — filter_.py:88 uses
  ``<=`` even though the skip message at scanner.py:133-134 prints
  ``>``.
- ``skip_repeats`` defaults from the log level (filter_.py:36) and the
  invalid combination skip_repeats=True with log_level < 2 raises
  ConfigError (filter_.py:53-55, utils.py:46-47).
"""

from __future__ import annotations

import re
from collections.abc import Iterable
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window
from pyspark.sql import functions as F

from .functions.regex import regex_hits, translate_pattern


class ConfigError(ValueError):
    """Invalid filter/config combination (utils.py:46-47)."""


def _membership(col: Column, value: Any) -> Column:
    if isinstance(value, str) or not isinstance(value, Iterable):
        return col == F.lit(value)
    vals = list(value)
    if not vals:
        return F.lit(False)
    return col.isin(*vals)


@dataclass
class FilterSpec:
    """Mirror of reference ``Filter.__init__`` (filter_.py:28-63)."""

    name: str
    streamfilter: dict[str, Any] = field(default_factory=dict)
    streams: tuple[str, ...] = ("recentchange",)
    sites: tuple[str, ...] = ()
    max_edits: int | None = None
    regexes: tuple[str | re.Pattern[str], ...] = ()
    skip_repeats: bool | None = None
    log_level: int = 2

    def __post_init__(self) -> None:
        if not 0 <= self.log_level <= 3:
            # scanner.py:70-71 validates LOG_LEVEL in 0..3
            raise ConfigError(f"log_level {self.log_level} not in 0..3")
        if self.skip_repeats is None:
            # default: dedup active iff the flag log exists
            # (filter_.py:36)
            self.skip_repeats = self.log_level >= 2
        if self.skip_repeats and self.log_level < 2:
            # filter_.py:53-55
            raise ConfigError(
                "skip_repeats requires log_level >= 2 (no flag log to "
                "dedup against below that)"
            )
        # Compile-time regex validation, like the eager re.compile at
        # import time in examples/filterlist.py:31-32.
        for p in self.regexes:
            translate_pattern(p)

    # --- predicate builders -------------------------------------------------

    def attribute_predicate(self) -> Column:
        """F1: conjunction of membership/equality predicates plus the
        injected sites predicate (filter_.py:58,107)."""
        pred = F.lit(True)
        for key, value in self.streamfilter.items():
            pred = pred & _membership(F.col(key), value)
        if self.sites:
            pred = pred & F.col("server_name").isin(*self.sites)
        return pred

    def editcount_predicate(self, editcount: Column) -> Column:
        """F2: NULL-disables threshold, inclusive (filter_.py:88)."""
        mx = F.lit(self.max_edits)
        return mx.isNull() | (editcount <= mx)

    def hits(self, text: Column) -> Column:
        """F4: array of matching pattern strings (filter_.py:110-112)."""
        return regex_hits(text, list(self.regexes))

    # --- application helpers ------------------------------------------------

    def apply_attribute_filter(self, df: DataFrame) -> DataFrame:
        return df.filter(self.attribute_predicate())

    def apply_dedup(
        self,
        df: DataFrame,
        flagged_titles: DataFrame | None,
        order_cols: tuple[str, ...] | None = None,
    ) -> DataFrame:
        """F3: drop rows whose title was already flagged, AND keep only
        the first occurrence of each title within the batch itself.

        Reference semantics (filter_.py:90-102): the flag log is
        consulted per event and appended per match, so a title flagged
        earlier IN THE SAME RUN suppresses later repeats — the batch
        twin therefore needs both the anti-join against the
        pre-existing set and a within-batch keep-first.  ``order_cols``
        pins the deterministic survivor (stream order = event time);
        without it duplicates collapse via dropDuplicates (exact when
        titles are unique, arbitrary-survivor otherwise).

        NOTE: in the full scan pipeline the within-batch keep-first
        must run over *matched* rows only (the reference's flag log
        holds matches); ``scan()`` therefore uses the split helpers
        ``apply_flagged_anti_join`` + ``apply_match_keep_first``
        instead of this all-rows form, which remains the standalone
        dedup operator (exact when every row is a match candidate)."""
        if not self.skip_repeats:
            return df
        df = self.apply_flagged_anti_join(df, flagged_titles)
        if order_cols:
            w = Window.partitionBy("title").orderBy(*order_cols)
            df = (
                df.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )
        else:
            df = df.dropDuplicates(["title"])
        return df

    def apply_flagged_anti_join(
        self, df: DataFrame, flagged_titles: DataFrame | None
    ) -> DataFrame:
        """F3a: drop titles already present in the flag log
        (filter_.py:90-102, page_is_repeat).  Cheap, so it runs before
        the expensive text join.

        No forced broadcast on the flagged set: it grows with run
        length, so AQE's size gate decides (a hint would OOM at the
        100 TB flag-log scale)."""
        if not self.skip_repeats or flagged_titles is None:
            return df
        return df.join(
            flagged_titles.select("title").distinct(),
            on="title",
            how="left_anti",
        )

    def apply_match_keep_first(
        self,
        df: DataFrame,
        matched: Column,
        order_cols: tuple[str, ...],
    ) -> DataFrame:
        """F3b: within-batch suppression of repeat *matches* per title.

        The reference's flag log records matches only (filter_.py:102
        appends after the regex hit), so a non-matching event of a
        title must NOT suppress a later genuine match — mirror of the
        streaming twin's dedup-after-match (streaming/pipeline.py).
        Conversely, once a title HAS matched, the reference's
        page_is_repeat (filter_.py:90-102) suppresses EVERY later
        event of that title — matching or not, verbose or not
        (scanner.py:136-139 returns before the verbose print).  Both
        directions fall out of one rule: keep a row iff its title has
        no match STRICTLY BEFORE it in stream order.

        Scale: one window shuffle on title — same key cardinality as
        the dedup itself; no driver state."""
        if not self.skip_repeats:
            return df
        w = (
            Window.partitionBy("title")
            .orderBy(*order_cols)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        prior = F.sum(matched.cast("int")).over(w)
        return (
            df.withColumn("__prior_matches", F.coalesce(prior, F.lit(0)))
            .filter(F.col("__prior_matches") == 0)
            .drop("__prior_matches")
        )
