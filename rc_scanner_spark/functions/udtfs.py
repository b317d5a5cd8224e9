"""Python UDTFs (Spark 4 table functions) — the remaining §2.B UDF
surface row alongside pandas UDFs / mapInPandas / stateful processors.

A UDTF is row-at-a-time Python: correct tool ONLY where each input row
expands into a variable number of typed rows AND the logic needs
Python (external parsers, tokenizers with state).  For anything
expressible as sequence/explode/transform, the Catalyst form wins by
10-100x — this module exists to cover the API surface honestly, with
the sentence splitter also having a pure-Catalyst twin
(`sentences_catalyst`) the tests compare against.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

_SENT_RE = re.compile(r"[^.!?]+[.!?]*")


@udtf(returnType="sent_idx: int, sentence: string, n_words: int")
class SplitSentences:
    """Expand a document into (sentence index, trimmed sentence, word
    count) rows.  Registered as the SQL table function
    ``split_sentences`` for LATERAL use."""

    def eval(self, text: str):  # noqa: D102 - UDTF contract
        if not text:
            return
        idx = 0
        for m in _SENT_RE.finditer(text):
            s = m.group(0).strip()
            if s:
                yield idx, s, len(s.split())
                idx += 1


def register_udtfs(spark) -> None:
    spark.udtf.register("split_sentences", SplitSentences)


def sentences_catalyst(text: Column) -> Column:
    """The Catalyst twin: same sentence split as an array column (the
    form hot paths should use)."""
    return F.filter(
        F.transform(
            F.regexp_extract_all(text, F.lit(r"[^.!?]+[.!?]*"), 0),
            # full-whitespace strip to match the UDTF's str.strip():
            # F.trim's default trims ONLY the space character, so
            # newlines/tabs between sentences would diverge the twins
            lambda s: F.regexp_replace(s, r"^\s+|\s+$", ""),
        ),
        lambda s: s != "",
    )


def split_sentences_lateral(spark, docs: DataFrame) -> DataFrame:
    """LATERAL-join the UDTF against a documents frame."""
    import uuid

    register_udtfs(spark)
    # unique view name: a fixed one is clobbered by concurrent callers
    view = f"_udtf_docs_{uuid.uuid4().hex[:8]}"
    docs.createOrReplaceTempView(view)
    # NOTE: the comma-LATERAL is an INNER join — docs whose text
    # yields no sentences (NULL/empty) drop out of the output.
    try:
        return spark.sql(
            f"SELECT d.doc_id, s.sent_idx, s.sentence, s.n_words "
            f"FROM {view} d, LATERAL split_sentences(d.text) s"
        )
    finally:
        # the analyzed plan holds its own reference to the view's
        # child plan, so dropping the catalog entry immediately is
        # safe — and prevents unbounded catalog growth in a
        # long-lived session (one leak per call otherwise)
        spark.catalog.dropTempView(view)
