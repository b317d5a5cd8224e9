"""Streaming incremental corpus builder: continuously ingest document
batches, drop anything already in the corpus (or duplicated within the
batch), and append only novel documents — the streaming form of
``queries/llm.py``'s batch ``dedup_incremental``.

Exactly-once without a table format: each micro-batch writes to its
own ``batch_id=N`` partition directory with ``overwrite`` mode, so a
retried batch replaces its own output instead of double-appending —
the Structured Streaming idempotent-foreachBatch recipe.  The
dedup-read side scans only the ``fp`` column of the existing corpus
(16-byte fingerprints; parquet column pruning makes this cheap even
when payloads dominate).

Scale notes (100 TB): the anti-join key is the 64-bit fingerprint —
the corpus side of the join carries fingerprints only, never text.  On
a real deployment the fingerprint set lives in a bucketed table (or a
bloom filter for a pre-filter) so the per-batch cost is bounded by the
batch, not the corpus.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.text import fingerprint

CORPUS_COLS = ["doc_id", "text", "lang", "source", "fp"]


def _with_fp(df: DataFrame) -> DataFrame:
    return df.withColumn("fp", fingerprint(F.col("text")))


def merge_batch(batch_df: DataFrame, batch_id: int, corpus_dir: str) -> None:
    """foreachBatch handler: dedup within the batch (min doc_id wins),
    anti-join against the existing corpus fingerprints, write the
    survivors to this batch's own overwrite-safe partition."""
    spark = batch_df.sparkSession
    new = _with_fp(batch_df)
    # within-batch dedup: deterministic survivor = smallest doc_id
    new = (
        new.withColumn(
            "_rn", F.row_number().over(Window.partitionBy("fp").orderBy("doc_id"))
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    if os.path.isdir(corpus_dir) and any(
        e.startswith("batch_id=") for e in os.listdir(corpus_dir)
    ):
        # exclude this batch's OWN partition from the seen set: on a
        # retry the previous attempt's output is already there, and
        # anti-joining against it would empty the rewrite (partition
        # pruning makes the filter free)
        seen = (
            spark.read.parquet(corpus_dir)
            .filter(F.col("batch_id") != batch_id)
            .select("fp")
        )
        new = new.join(seen, "fp", "left_anti")
    out = new.select(*CORPUS_COLS)
    out.write.mode("overwrite").parquet(f"{corpus_dir}/batch_id={batch_id}")


def build_corpus_stream(
    doc_stream: DataFrame,
    corpus_dir: str,
    checkpoint_dir: str,
    prep=None,
):
    """Wire a document stream into the dedup-merge sink.  Returns the
    (not yet started) ``DataStreamWriter``.

    ``prep`` (optional): a DataFrame -> DataFrame transform applied to
    each micro-batch BEFORE dedup — the hook for quality gates and PII
    scrubbing so filtered/redacted docs never enter the corpus (see
    ``quality_scrub_prep`` for the standard composition).  It must
    preserve the document schema.
    """

    def handle(df: DataFrame, bid: int) -> None:
        if prep is not None:
            df = prep(df)
        merge_batch(df, bid, corpus_dir)

    return (
        doc_stream.writeStream.foreachBatch(handle)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
    )


def quality_scrub_prep(min_tokens: int = 5) -> "callable":
    """The standard prep hook: drop docs under ``min_tokens``
    whitespace tokens, then redact PII in the text column — both pure
    Catalyst, applied per micro-batch before dedup so redaction
    happens BEFORE fingerprints are taken (two near-identical docs
    differing only in their PII dedup to one)."""
    from ..operators.text import pii_scrub, token_count

    def prep(df: DataFrame) -> DataFrame:
        gated = df.filter(token_count(F.col("text")) >= min_tokens)
        cols = pii_scrub(F.col("text"))
        return gated.withColumn("text", cols["scrubbed"])

    return prep


def read_corpus(spark, corpus_dir: str) -> DataFrame:
    """The merged corpus (all batch partitions)."""
    return spark.read.parquet(corpus_dir)
