"""Partition pruning on a date-partitioned lake layout: a date filter
must prune at planning time (PartitionFilters), not scan-and-discard —
at 100 TB this is the difference between reading one day and reading
three years."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rc_scanner_spark.tables import load_table

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def dated_lake(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("lake") / "events_by_date")
    ev = load_table(spark, SF_SMOKE, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    ev.write.mode("overwrite").partitionBy("event_date").parquet(path)
    return path


def test_date_filter_becomes_partition_filter(spark, dated_lake):
    df = spark.read.parquet(dated_lake).filter(
        F.col("event_date") == "2024-01-15"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    # the partition predicate must be in PartitionFilters, not a
    # post-scan Filter node
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "event_date" in pf, plan


def test_pruned_scan_matches_full_filter(spark, dated_lake):
    pruned = (
        spark.read.parquet(dated_lake)
        .filter(F.col("event_date") == "2024-01-15")
        .count()
    )
    full = (
        load_table(spark, SF_SMOKE, "events")
        .filter(F.to_date("ts") == "2024-01-15")
        .count()
    )
    assert pruned == full
    assert pruned > 0
