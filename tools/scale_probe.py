"""N-x replication scale probe.

Replicates the test tables N times with disjoint key ranges and a
per-copy perturbation (documents gain a copy-suffix token, so
cross-copy documents become near-dups — the dup structure gets RICHER,
not just bigger; fact keys shift consistently so referential integrity
holds), then measures warm wall time of the named queries at 1x and Nx.

The point: local[32] cannot run 100 TB, but it CAN answer "is growth
sub-quadratic?" — a query whose time grows ~Nx with Nx data survives a
scale-up; one that grows ~N^2 does not.  Results are recorded in
PLANS.md's growth tables.

Usage:
    python tools/scale_probe.py [sf_dir] [factor] name...
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

# key columns to shift per copy (copy i adds i * 10^9), so every copy's
# keys are disjoint but joins within a copy still line up
_SHIFT = {
    "documents": ["doc_id"],
    "events": ["event_id", "user_id"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "embeddings": ["vec_id"],
}
_OFF = 10**9


def build_replicated(spark, sf_dir: str, out_dir: str, factor: int, tables):
    from rc_scanner_spark.tables import load_table

    os.makedirs(out_dir, exist_ok=True)
    for t in tables:
        base = load_table(spark, sf_dir, t)
        copies = []
        for i in range(factor):
            c = base
            for k in _SHIFT.get(t, []):
                c = c.withColumn(k, F.col(k) + F.lit(i * _OFF))
            if t == "documents":
                # per-copy suffix token -> cross-copy near-dups
                c = c.withColumn(
                    "text", F.concat(F.col("text"), F.lit(f" copytoken{i}"))
                )
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        out.write.mode("overwrite").parquet(os.path.join(out_dir, f"{t}.parquet"))


def main() -> int:
    args = sys.argv[1:]
    if args and ("/" in args[0] or os.sep in args[0]) and not os.path.isdir(args[0]):
        print(f"sf_dir does not exist: {args[0]}", file=sys.stderr)
        return 2
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    rest = args[1:] if args and os.path.isdir(args[0]) else args
    factor = int(rest[0]) if rest and rest[0].isdigit() else 4
    names = rest[1:] if rest and rest[0].isdigit() else rest
    if not names:
        print("no query names given", file=sys.stderr)
        return 2

    from rc_scanner_spark.operators.dedup import release_caches
    from rc_scanner_spark.queries import build_registry
    from rc_scanner_spark.session import get_spark

    spark = get_spark("scale-probe")
    registry = build_registry()

    out_dir = f"/tmp/scale_probe_{factor}x"
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    # replicate every table the probe queries touch (superset is fine)
    build_replicated(
        spark, sf_dir, out_dir, factor,
        ["documents", "events", "orders", "lineitem", "part", "customer",
         "supplier", "embeddings"],
    )
    # tables the queries may load untouched (dims without key shifts)
    for t in ("region", "nation"):
        src = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(src):
            dst = os.path.join(out_dir, f"{t}.parquet")
            (shutil.copytree if os.path.isdir(src) else shutil.copyfile)(src, dst)

    def run(name: str, d: str) -> float:
        spark.catalog.clearCache()
        release_caches()
        fn = registry[name].fn
        fn(spark, d).write.format("noop").mode("overwrite").save()  # warm
        spark.catalog.clearCache()
        release_caches()
        t0 = time.perf_counter()
        fn(spark, d).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    print(f"| query | 1x | {factor}x | ratio |")
    print("|---|---|---|---|")
    for name in names:
        t1 = run(name, sf_dir)
        tn = run(name, out_dir)
        print(f"| {name} | {t1:.1f} s | {tn:.1f} s | {tn / t1:.1f}x |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
