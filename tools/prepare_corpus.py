"""End-to-end corpus preparation CLI.

Usage:
    python tools/prepare_corpus.py [sf_dir] [out_dir] [--bench-mod 17]

Runs quality gate -> exact dedup -> MinHash near-dedup + connected
components -> decontamination -> hash split -> sequence packing, and
writes (split, shard)-partitioned parquet.  `--bench-mod N` treats
doc_id % N == 0 as the held-out benchmark set (mirrors the
decontaminate query's convention).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.001")
    ap.add_argument("out_dir", nargs="?", default="/tmp/prepared_corpus")
    ap.add_argument("--bench-mod", type=int, default=17)
    ap.add_argument(
        "--keep",
        choices=("first", "best"),
        default="first",
        help="near-dup cluster survivor: smallest id (first) or "
        "longest document (best)",
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from rc_scanner_spark.pipelines import prepare_corpus, write_shards
    from rc_scanner_spark.session import get_spark
    from rc_scanner_spark.tables import load_table

    spark = get_spark("prepare-corpus")
    docs = load_table(spark, args.sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % args.bench_mod == 0)
    train = docs.filter(F.col("doc_id") % args.bench_mod != 0)
    corpus = prepare_corpus(spark, train, bench_docs=bench, keep=args.keep)
    write_shards(corpus, args.out_dir)
    stats = (
        corpus.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_tokens").alias("tokens"),
            F.count_distinct("shard").alias("shards"),
        )
        .orderBy("split")
        .collect()
    )
    for r in stats:
        print(f"{r['split']}: {r['docs']} docs, {r['tokens']} tokens, {r['shards']} shards")
    print(f"written: {args.out_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
