"""Matched A/B timer: noop-sink wall time for a list of registry
queries (sweep_times.py protocol — clearCache + release_caches per
rep, min kept).  Run alternately from two checkouts of the tree in
the same host window; compare mins (OPTIMIZATION_r14.md host-noise
discipline).

Usage: python tools/ab_time.py <sf_dir> <reps> <query> [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1]
    reps = int(sys.argv[2])
    names = sys.argv[3:]

    from rc_scanner_spark.operators.dedup import release_caches
    from rc_scanner_spark.queries import build_registry
    from rc_scanner_spark.session import get_spark

    spark = get_spark("ab-time")
    registry = build_registry()
    registry["scan_verb"].fn(spark, sf_dir).count()
    spark.sql("SELECT lower('MÜller straße 你好 Ω'), upper('ñoño')").collect()

    for name in names:
        ts = []
        for _ in range(reps):
            spark.catalog.clearCache()
            release_caches()
            t0 = time.perf_counter()
            registry[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            ts.append(time.perf_counter() - t0)
        row = "\t".join(f"{t:.3f}" for t in ts)
        print(f"{name}\t{row}\tmin={min(ts):.3f}", flush=True)


if __name__ == "__main__":
    main()
