"""Time every registry query once or twice (noop sink) at a given SF.

Usage: python tools/sweep_times.py [sf_dir] [reps] > /tmp/sweep.tsv
Prints: name<TAB>rep1<TAB>rep2...<TAB>min — the coarse whole-registry
radar used to find outliers worth per-stage profiling (guide §1.2:
find the slowest thing first).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from rc_scanner_spark.operators.dedup import release_caches
    from rc_scanner_spark.queries import build_registry
    from rc_scanner_spark.session import get_spark

    spark = get_spark("sweep-times")
    registry = build_registry()
    registry["scan_verb"].fn(spark, sf_dir).count()
    spark.sql("SELECT lower('MÜller straße 你好 Ω'), upper('ñoño')").collect()

    for name, spec in registry.items():
        ts = []
        for _ in range(reps):
            spark.catalog.clearCache()
            release_caches()
            t0 = time.perf_counter()
            try:
                spec.fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception as e:  # pragma: no cover - radar tool
                print(f"{name}\tERROR\t{e}", flush=True)
                break
            ts.append(time.perf_counter() - t0)
        if ts:
            row = "\t".join(f"{t:.3f}" for t in ts)
            print(f"{name}\t{row}\t{min(ts):.3f}", flush=True)


if __name__ == "__main__":
    main()
