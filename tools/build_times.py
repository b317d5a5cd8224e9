"""Driver-side plan-construction radar: time spec.fn() for every
registry query WITHOUT executing it (no action).  Surfaces the
py4j-latency outliers that the SQL-expression-string pattern fixes
(OPTIMIZATION_r14.md batches 4/7) — construction cost recurs on every
bench sample and every driver run, and is paid serially on the
driver.

Usage: python tools/build_times.py [sf_dir] > /tmp/build.tsv
Prints: name<TAB>seconds, one line per query.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from rc_scanner_spark.operators.dedup import release_caches
    from rc_scanner_spark.queries import build_registry
    from rc_scanner_spark.session import get_spark

    spark = get_spark("build-times")
    registry = build_registry()
    registry["scan_verb"].fn(spark, sf_dir).count()  # warm the session

    for name, spec in registry.items():
        spark.catalog.clearCache()
        release_caches()
        t0 = time.perf_counter()
        spec.fn(spark, sf_dir)
        print(f"{name}\t{time.perf_counter() - t0:.3f}", flush=True)


if __name__ == "__main__":
    main()
