"""tune() contract: runtime confs apply, but a caller-chosen shuffle
partition count is never stomped (review r8 round 3 — the docstring
promise 'override via conf' must stay true for driver sessions)."""

from __future__ import annotations

from rc_scanner_spark.session import tune

_KEY = "spark.sql.shuffle.partitions"


def test_tune_respects_caller_set_shuffle_partitions(spark):
    before = spark.conf.get(_KEY)
    try:
        spark.conf.set(_KEY, "777")
        tune(spark)
        assert spark.conf.get(_KEY) == "777"
    finally:
        spark.conf.set(_KEY, before)


def test_tune_replaces_untouched_default(spark):
    before = spark.conf.get(_KEY)
    try:
        spark.conf.set(_KEY, "200")  # the untouched Spark default
        tune(spark)
        par = spark.sparkContext.defaultParallelism
        assert spark.conf.get(_KEY) == str(max(16, par))
    finally:
        spark.conf.set(_KEY, before)
