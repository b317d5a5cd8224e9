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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.text import fingerprint


def _has_partitions(spark: SparkSession, path: str) -> bool:
    """True iff ``path`` exists and holds at least one batch_id=N
    partition — probed through the Hadoop FileSystem API so it works
    on ANY scheme (s3a://, hdfs://, file://), not just the driver's
    local disk (an os.path check silently disables dedup on remote
    storage)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        return False
    for st in fs.listStatus(hpath):
        if st.getPath().getName().startswith("batch_id="):
            return True
    return False


def _exact_dedup_against_corpus(
    batch_df: DataFrame, batch_id: int, corpus_dir: str
) -> DataFrame:
    """Shared exact-dedup front half of both merge handlers: fp
    column, within-batch keep-smallest-doc_id, anti-join against every
    OTHER batch partition of the existing corpus (this batch's own
    partition is excluded so a retry doesn't empty its own rewrite)."""
    spark = batch_df.sparkSession
    new = _with_fp(batch_df)
    new = (
        new.withColumn(
            "_rn",
            F.row_number().over(Window.partitionBy("fp").orderBy("doc_id")),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    if _has_partitions(spark, corpus_dir):
        seen = (
            spark.read.parquet(corpus_dir)
            .filter(F.col("batch_id") != batch_id)
            .select("fp")
        )
        new = new.join(seen, "fp", "left_anti")
    return new

CORPUS_COLS = ["doc_id", "text", "lang", "source", "fp"]


def _with_fp(df: DataFrame) -> DataFrame:
    return df.withColumn("fp", fingerprint(F.col("text")))


def merge_batch(batch_df: DataFrame, batch_id: int, corpus_dir: str) -> None:
    """foreachBatch handler: dedup within the batch (min doc_id wins),
    anti-join against the existing corpus fingerprints, write the
    survivors to this batch's own overwrite-safe partition."""
    new = _exact_dedup_against_corpus(batch_df, batch_id, corpus_dir)
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


#: Streaming near-dup parameters: 32 hashes x 8 bands of 4 rows keeps
#: the sidecar narrow while banding still catches Jaccard >= ~0.6
#: pairs with high probability; the signature-agreement estimate then
#: confirms before dropping.
NEAR_NUM_HASHES = 32
NEAR_BANDS = 8
NEAR_THRESHOLD = 0.6


def merge_batch_neardup(
    batch_df: DataFrame,
    batch_id: int,
    corpus_dir: str,
    sig_dir: str,
    threshold: float = NEAR_THRESHOLD,
) -> None:
    """foreachBatch handler with NEAR-duplicate suppression: exact
    fp-dedup as in ``merge_batch``, then MinHash-LSH against the
    accumulated signature sidecar — an incoming doc whose estimated
    Jaccard with ANY already-kept doc reaches ``threshold`` is dropped
    before it enters the corpus.

    The sidecar (``sig_dir``, one ``batch_id=N`` partition per batch,
    same overwrite-idempotent recipe as the corpus itself) stores
    (id, n_sh, h0..h31) per kept doc: 33 longs, no text — so the
    cross-batch near-dup check joins the new batch's band buckets
    against signatures only, never re-reading corpus text.  Candidate
    generation is the banded equi-join (never all-pairs); confirmation
    is the MinHash agreement fraction (unbiased Jaccard estimator) on
    the 32 components.  Within-batch near-dups are NOT suppressed here
    (only cross-batch) — run the batch ``minhash_lsh_pairs`` operator
    over a finished corpus for that.
    """
    from ..operators.dedup import (
        minhash_band_buckets,
        minhash_signature_frame,
        signature_match_fraction,
    )

    spark = batch_df.sparkSession
    new = _exact_dedup_against_corpus(batch_df, batch_id, corpus_dir)

    sig_new = minhash_signature_frame(new, num_hashes=NEAR_NUM_HASHES)
    if _has_partitions(spark, sig_dir):
        sig_old = spark.read.parquet(sig_dir).filter(
            F.col("batch_id") != batch_id
        )
        b_new = minhash_band_buckets(sig_new, NEAR_NUM_HASHES, NEAR_BANDS)
        b_old = minhash_band_buckets(sig_old, NEAR_NUM_HASHES, NEAR_BANDS)
        cand = (
            b_new.join(
                b_old.withColumnRenamed("id", "old_id"), ["band", "bucket"]
            )
            .select("id", "old_id")
            .dropDuplicates(["id", "old_id"])
        )
        est = (
            cand.join(sig_new.alias("n"), cand.id == F.col("n.id"))
            .join(sig_old.alias("o"), cand.old_id == F.col("o.id"))
            .select(
                cand.id.alias("dup_id"),
                signature_match_fraction(NEAR_NUM_HASHES).alias("est_j"),
            )
        )
        dups = (
            est.filter(F.col("est_j") >= threshold)
            .select(F.col("dup_id").alias("doc_id"))
            .distinct()
        )
        new = new.join(dups, "doc_id", "left_anti")
        sig_new = sig_new.join(
            dups.withColumnRenamed("doc_id", "id"), "id", "left_anti"
        )

    # Both writes are actions on overlapping lineage (sig_new derives
    # from new): persist across them so the dedup + LSH DAG runs once
    # per batch, not once per sink.
    new = new.persist()
    sig_new = sig_new.persist()
    try:
        new.select(*CORPUS_COLS).write.mode("overwrite").parquet(
            f"{corpus_dir}/batch_id={batch_id}"
        )
        sig_new.write.mode("overwrite").parquet(
            f"{sig_dir}/batch_id={batch_id}"
        )
    finally:
        new.unpersist(blocking=False)
        sig_new.unpersist(blocking=False)


def build_corpus_stream_neardup(
    doc_stream: DataFrame,
    corpus_dir: str,
    sig_dir: str,
    checkpoint_dir: str,
    prep=None,
):
    """``build_corpus_stream`` with cross-batch near-dup suppression."""

    def handle(df: DataFrame, bid: int) -> None:
        if prep is not None:
            df = prep(df)
        merge_batch_neardup(df, bid, corpus_dir, sig_dir)

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
