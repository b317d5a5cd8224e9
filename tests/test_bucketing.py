"""Bucketed co-located join: the plan must be exchange-free and the
result identical to the plain shuffled join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rc_scanner_spark.operators.bucketing import colocated_join, write_bucketed
from rc_scanner_spark.tables import load_table

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed(spark):
    o = load_table(spark, SF_SMOKE, "orders")
    l = load_table(spark, SF_SMOKE, "lineitem")
    write_bucketed(o, "b_orders", "o_orderkey", num_buckets=4)
    write_bucketed(
        l.withColumnRenamed("l_orderkey", "o_orderkey"), "b_lineitem", "o_orderkey",
        num_buckets=4,
    )
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_colocated_join_has_no_exchange(spark, bucketed):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(spark, "b_lineitem", "b_orders", on="o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        # correctness vs the plain join
        o = load_table(spark, SF_SMOKE, "orders")
        l = load_table(spark, SF_SMOKE, "lineitem").withColumnRenamed(
            "l_orderkey", "o_orderkey"
        )
        assert joined.count() == l.join(o, "o_orderkey").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_groupby_skips_exchange(spark, bucketed):
    agg = (
        spark.table("b_lineitem")
        .groupBy("o_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
