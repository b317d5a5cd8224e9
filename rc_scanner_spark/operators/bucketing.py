"""Bucketed (co-located) joins — the zero-shuffle scale path.

At 100 TB the dominant cost of a fact-fact join is shuffling both
sides on the join key.  Writing each table bucketed (hash-partitioned
into N files per partition) and sorted by that key lets Spark plan a
sort-merge join with NO exchange and NO sort: each task zips bucket i
of both tables.  The shuffle is paid once at write time and amortized
over every subsequent join/aggregation on the key.

Rules for the plan to stay exchange-free:
- both tables bucketed on the join key with the SAME bucket count
  (or multiples, with spark.sql.bucketing.coalesceBucketsInJoin);
- read via the catalog (``spark.table``) — bucket metadata lives in
  the table, plain ``read.parquet`` of the files forgets it;
- grouping by the bucket key likewise skips the aggregate exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_key: str,
    num_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a managed bucketed table (overwrite)."""
    w = df.write.mode("overwrite").bucketBy(num_buckets, bucket_key)
    if sort:
        w = w.sortBy(bucket_key)
    w.saveAsTable(table_name)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key.

    With matching bucket specs this plans as an exchange-free
    sort-merge join (verified in tests/test_bucketing.py by asserting
    no Exchange node in the executed plan).
    """
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
