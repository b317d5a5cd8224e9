"""End-to-end training-corpus preparation: the composition a pipeline
engineer actually runs, built from the registry's operators.

Stages (each a pure DataFrame transform; nothing collects):
  1. quality gate      — Gopher-style rule battery (queries/llm.py)
  2. exact dedup       — fingerprint groupBy, min-id survivor
  3. near-dedup        — MinHash+LSH pair detection -> connected
                         components -> keep cluster canonicals
  4. decontamination   — drop docs sharing an 8-gram with the bench set
  5. split + pack      — deterministic hash train/val split, then
                         per-source concat-then-chunk sequence ids
  6. shard write       — parquet partitioned by (split, shard)

Scale: every stage is one of the audited registry plans (no new
shuffle shapes); the writer partitions by (split, shard) so a 1000-
executor run produces bounded file counts per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators.dedup import minhash_lsh_pairs
from .operators.graph import connected_components
from .operators.text import fingerprint, token_count, words


def prepare_corpus(
    spark: SparkSession,
    docs: DataFrame,
    bench_docs: DataFrame | None = None,
    pack_budget: int = 512,
    n_shards: int = 8,
    val_permille: int = 100,
    jaccard_threshold: float = 0.5,
    keep: str = "first",
) -> DataFrame:
    """Run the full prep pipeline; returns the packed, split corpus
    with one row per surviving doc:
    (doc_id, source, split, shard, n_tokens, first_seq, last_seq).

    ``keep`` selects the near-dup cluster survivor: ``"first"`` keeps
    the smallest doc_id (the component label — cheapest, an anti-join),
    ``"best"`` keeps the longest document per cluster (one window
    partitioned by component — what a production prep run usually
    wants, per queries/llm2.q_dedup_keep_best).
    """
    if keep not in ("first", "best"):
        raise ValueError(f"keep must be 'first' or 'best', got {keep!r}")
    # 1. quality gate (inline minimal battery: length + stopword floor
    #    — the full auditable battery is queries/llm.q_text_gopher_rules)
    toks = token_count(F.col("text"))
    n_letters = F.size(words(F.col("text")))
    gated = docs.filter((toks >= 5) & (n_letters > 0))

    # 2. exact dedup: min doc_id survives per fingerprint
    fp = gated.withColumn("fp", fingerprint(F.col("text")))
    w_fp = Window.partitionBy("fp").orderBy("doc_id")
    exact = fp.withColumn("_rn", F.row_number().over(w_fp)).filter(
        F.col("_rn") == 1
    ).drop("_rn", "fp")

    # 3. near-dedup: LSH pairs -> CC -> one survivor per cluster
    pairs = minhash_lsh_pairs(exact, verify_threshold=jaccard_threshold)
    comp = connected_components(
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )
    if keep == "first":
        dropped = comp.filter(F.col("id") != F.col("component")).select(
            F.col("id").alias("doc_id")
        )
        kept = exact.join(dropped, "doc_id", "left_anti")
    else:
        labeled = exact.join(
            comp, exact["doc_id"] == comp["id"], "left"
        ).withColumn(
            "_component", F.coalesce(F.col("component"), F.col("doc_id"))
        )
        w_best = Window.partitionBy("_component").orderBy(
            toks.desc(), F.col("doc_id")
        )
        kept = (
            labeled.withColumn("_rn", F.row_number().over(w_best))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "_component", "id", "component")
        )

    # 4. decontamination against the bench set (word 8-grams)
    if bench_docs is not None:
        # same hash basis as the dedup family (concat_ws over a slice
        # equals array_join — identical strings, identical hashes)
        from .operators.dedup import hashed_word_shingles

        k = 8
        bench_sh = (
            bench_docs.select(
                F.explode(hashed_word_shingles(F.col("text"), k)).alias("sh")
            )
            .distinct()
        )
        doc_sh = kept.select(
            "doc_id",
            F.explode(hashed_word_shingles(F.col("text"), k)).alias("sh"),
        )
        contaminated = (
            doc_sh.join(F.broadcast(bench_sh), "sh")
            .select("doc_id")
            .distinct()
        )
        kept = kept.join(contaminated, "doc_id", "left_anti")

    # 5. deterministic split + per-source sequence packing
    from .functions.hashing import md5_long

    bucket = (
        md5_long(
            F.concat(F.lit("split:"), F.col("doc_id").cast("string")), n_hex=5
        )
        % 1000
    )
    split_col = F.when(bucket < val_permille, F.lit("val")).otherwise(F.lit("train"))
    t = kept.withColumn("split", split_col).withColumn("n_tokens", toks)
    w_pack = (
        Window.partitionBy("split", "source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = t.withColumn("end_offset", F.sum("n_tokens").over(w_pack))
    t = t.withColumn("start_offset", F.col("end_offset") - F.col("n_tokens"))
    first_seq = F.floor(F.col("start_offset") / pack_budget)
    last_seq = F.when(
        F.col("n_tokens") > 0, F.floor((F.col("end_offset") - 1) / pack_budget)
    ).otherwise(first_seq)
    shard = F.crc32(F.col("doc_id").cast("string")) % n_shards
    return t.select(
        "doc_id",
        "source",
        "split",
        shard.cast("bigint").alias("shard"),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        first_seq.cast("bigint").alias("first_seq"),
        last_seq.cast("bigint").alias("last_seq"),
    )


def write_shards(corpus: DataFrame, out_dir: str) -> None:
    """Stage 6: shard write, partitioned so each (split, shard) is an
    independent reader unit."""
    corpus.write.mode("overwrite").partitionBy("split", "shard").parquet(out_dir)
