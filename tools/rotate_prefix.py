"""Compute the next driver-rotation ordering for _VERIFICATION_PRIORITY.

The external driver oracle-checks a ~50-entry prefix of the registry
per round; tests/test_rotation_ledger.py fails the suite if the prefix
re-samples settled entries or contains rows-only (sql=None) queries.
This tool makes the per-round rotation mechanical: it reads every
git-committed CORRECTNESS_r*.json, classifies each registry query by
its NEWEST driver evidence, and prints the recommended ordering —
paste the prefix into queries/__init__.py at the top of the round.

Ordering policy (the r6-verdict rules):
 1. FAILED in the newest file (must re-run after the fix)
 2. oracle-backed, never driver-sampled (newest additions first-come)
 3. rows-only never-sampled (the prefix is all the driver ever
    checks, so these must spend one slot once to earn their weaker
    rows-only row; self-limiting — after one round they are sampled)
 4. stale oracle-backed, ascending by newest-evidence round
 5. everything else, ascending by newest-evidence round (freshest last)

Usage: python tools/rotate_prefix.py [--slots 50]
"""

from __future__ import annotations

import json
import re
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPO = Path(__file__).resolve().parent.parent


def correctness_files() -> list[Path]:
    tracked = subprocess.run(
        ["git", "ls-files", "CORRECTNESS_r*.json"],
        cwd=REPO,
        capture_output=True,
        text=True,
        check=True,
    ).stdout.split()
    return sorted(
        (REPO / f for f in tracked),
        key=lambda p: int(re.search(r"r(\d+)", p.stem).group(1)),
    )


def main() -> int:
    slots = 50
    if "--slots" in sys.argv:
        slots = int(sys.argv[sys.argv.index("--slots") + 1])

    from rc_scanner_spark.queries import build_registry

    reg = build_registry()
    newest_round: dict[str, int] = {}
    newest_status: dict[str, str] = {}  # green | rows_only | failed
    for path in correctness_files():
        rnd = int(re.search(r"r(\d+)", path.stem).group(1))
        for name, row in json.loads(path.read_text()).items():
            if name not in reg:
                continue  # renamed/removed query
            if row.get("hash_match") is True:
                status = "green"
            elif row.get("err") == "no_oracle" and row.get("spark_rows"):
                status = "rows_only"
            else:
                status = "failed"
            newest_round[name] = rnd
            newest_status[name] = status

    failed = [n for n in reg if newest_status.get(n) == "failed"]
    never_oracle = [
        n for n in reg if n not in newest_round and reg[n].sql is not None
    ]
    never_rows_only = [
        n for n in reg if n not in newest_round and reg[n].sql is None
    ]
    sampled = [n for n in reg if n in newest_round and n not in failed]
    stale_sorted = sorted(sampled, key=lambda n: (newest_round[n], n))

    # Never-sampled rows-only entries go right after the hash-checkable
    # never-sampled block: the prefix is all the driver ever checks, so
    # the only way they earn their (weaker, rows-only) driver row is by
    # spending a slot once — self-limiting, since after one round they
    # are sampled and test_rotation_ledger.py bars them from the prefix.
    order = failed + never_oracle + never_rows_only + stale_sorted

    print(f"# recommended rotation ({len(reg)} queries, {slots}-slot prefix)")
    print(f"# failed (re-run first): {len(failed)}")
    print(f"# never-sampled oracle-backed: {len(never_oracle)}")
    print(f"# never-sampled rows-only: {len(never_rows_only)}")
    print(f"# sampled (stale -> fresh): {len(stale_sorted)}")
    print()
    print("_VERIFICATION_PRIORITY: tuple[str, ...] = (")
    for i, n in enumerate(order):
        if i == slots:
            print(f"    # ---- entries below are outside the {slots}-slot prefix ----")
        rnd = newest_round.get(n)
        status = newest_status.get(n, "never")
        print(f'    "{n}",  # {status}' + (f" r{rnd}" if rnd else ""))
    print(")")
    prefix = order[:slots]
    bad = [n for n in prefix if reg[n].sql is None and n in newest_round]
    if bad:
        print(
            "\n# WARNING: already-sampled rows-only entries inside the "
            f"prefix: {bad}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
