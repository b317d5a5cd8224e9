"""Round-7 batch 31: paired-modality integrity audit.

Why this belongs in a 100 TB training-data engine: multimodal corpora
are PAIRED tables (text + embedding, image + caption), and the
first-line contract check before any training run is referential
integrity of the pairing — every document has exactly one embedding,
no orphan embeddings, no degenerate vectors.  Complements
``contract_violations`` (single-table rules) with the cross-table
audit.

Engine-parity notes: pure integer counts from two key joins; the
orphan side (unpairable embeddings) cannot be attributed to a source,
so it reports as one ``__orphan_embeddings__`` row whose
``n_missing_pair`` column counts the unpairable rows on the embedding
side (per-source rows count the unpairable DOCUMENT side).

Reference scope note: the reference engine (scanner.py:120-175) has no
analytics surface; extends SURVEY.md §2.B's multimodal category.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import QuerySpec, load_tuned

_t = load_tuned

_EMB_DIM = 64


def q_multimodal_pair_integrity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Referential-integrity audit of the documents<->embeddings
    pairing, per source: document count, paired count, documents
    missing their embedding, and paired embeddings with the wrong
    dimensionality; plus one ``__orphan_embeddings__`` row counting
    embeddings with no document.

    Scale: two key equi-joins (doc_id = vec_id — co-partitioned at
    scale when both sides bucket on id) and two hash aggregates; no
    windows, no cartesians."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "source")
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.size("embedding").alias("dim")
    )
    paired = d.join(e, d.doc_id == e.vec_id, "left")
    per_src = paired.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count("vec_id").alias("n_paired"),
        F.sum(
            F.when(F.col("vec_id").isNotNull() & (F.col("dim") != _EMB_DIM), 1)
            .otherwise(0)
        ).alias("n_bad_dim"),
    )
    src_rows = per_src.select(
        "source",
        "n_docs",
        "n_paired",
        (F.col("n_docs") - F.col("n_paired")).alias("n_missing_pair"),
        F.col("n_bad_dim").cast("bigint").alias("n_bad_dim"),
    )
    orphans = (
        e.join(d, d.doc_id == e.vec_id, "left_anti")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.lit("__orphan_embeddings__").alias("source"),
            F.lit(0).cast("bigint").alias("n_docs"),
            F.lit(0).cast("bigint").alias("n_paired"),
            F.col("n").alias("n_missing_pair"),
            F.lit(0).cast("bigint").alias("n_bad_dim"),
        )
    )
    return src_rows.unionAll(orphans).orderBy("source")


SQL_MULTIMODAL_PAIR_INTEGRITY = f"""
WITH paired AS (
  SELECT d.source, d.doc_id, e.vec_id, len(e.embedding) AS dim
  FROM documents d LEFT JOIN embeddings e ON d.doc_id = e.vec_id
),
per_src AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(count(vec_id) AS BIGINT) AS n_paired,
         CAST(sum(CASE WHEN vec_id IS NOT NULL AND dim != {_EMB_DIM}
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_dim
  FROM paired GROUP BY 1
),
orph AS (
  SELECT CAST(count(*) AS BIGINT) AS n
  FROM embeddings e
  WHERE NOT EXISTS (SELECT 1 FROM documents d WHERE d.doc_id = e.vec_id)
)
SELECT source, n_docs, n_paired,
       n_docs - n_paired AS n_missing_pair, n_bad_dim
FROM per_src
UNION ALL
SELECT '__orphan_embeddings__', CAST(0 AS BIGINT), CAST(0 AS BIGINT),
       n, CAST(0 AS BIGINT)
FROM orph
ORDER BY source
"""


QUERIES: dict[str, QuerySpec] = {
    "multimodal_pair_integrity": QuerySpec(
        q_multimodal_pair_integrity, SQL_MULTIMODAL_PAIR_INTEGRITY
    ),
}
