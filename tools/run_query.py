"""Run any registry query from the shell and show its result + plan.

Usage:
    python tools/run_query.py QUERY_NAME [sf_dir] [--explain] [-n ROWS]
    python tools/run_query.py --list [pattern]

The user-facing entry point for ad-hoc use of the 137-query registry
(the library form is ``rc_scanner_spark.queries.build_registry``; the
driver contract is ``__spark_entry__``).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("name", nargs="?", help="registry query name")
    ap.add_argument(
        "sf_dir", nargs="?", default="/root/testdata/sf0.001", help="table dir"
    )
    ap.add_argument("--list", action="store_true", help="list query names")
    ap.add_argument("--explain", action="store_true", help="show formatted plan")
    ap.add_argument("-n", type=int, default=20, help="rows to show")
    args = ap.parse_args()

    from rc_scanner_spark.queries import build_registry

    registry = build_registry()
    if args.list or not args.name:
        pat = (args.name or "").lower()
        for name, spec in registry.items():
            if pat in name:
                tag = "oracle" if spec.sql else "rows-only"
                print(f"{name:32s} [{tag}]")
        return 0
    if args.name not in registry:
        near = [n for n in registry if args.name.lower() in n]
        hint = f"; close: {', '.join(near[:5])}" if near else ""
        print(f"unknown query {args.name!r}{hint}", file=sys.stderr)
        return 2

    from rc_scanner_spark.session import get_spark

    spark = get_spark(f"run-{args.name}")
    df = registry[args.name].fn(spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    df.show(args.n, truncate=40)
    print(f"({df.count()} rows)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
