"""Bench-tail regression guard (VERDICT r7 item 8): the cross-round
performance comparison only works if ``bench.py``'s HEADLINE list keeps
naming the same 19 queries the BENCH_r*.json history records — a
renamed or dropped query would otherwise silently vanish from the
BASELINE comparison instead of failing loudly."""

from __future__ import annotations

import json
import pathlib
import subprocess

REPO = pathlib.Path(__file__).resolve().parent.parent


def _committed_bench_files() -> list[pathlib.Path]:
    # Same convention as test_rotation_ledger: only git-committed
    # artifacts count (a freshly-written driver file mid-verification
    # must not flip the suite).
    tracked = subprocess.run(
        ["git", "ls-files", "BENCH_r*.json"],
        cwd=REPO,
        capture_output=True,
        text=True,
        check=True,
    ).stdout.split()
    return [REPO / p for p in tracked]


def test_headline_matches_bench_history():
    import bench

    files = _committed_bench_files()
    assert files, "no committed BENCH_r*.json found"
    checked = 0
    for path in sorted(files):
        parsed = json.loads(path.read_text())["parsed"]
        if parsed is None:  # r3's driver run failed to parse the tail
            continue
        checked += 1
        assert sorted(parsed["queries"]) == sorted(bench.HEADLINE), (
            f"{path.name} query set diverges from bench.HEADLINE — a "
            "renamed/dropped headline query breaks the cross-round "
            "comparison; keep the 19 names stable"
        )
    assert checked, "no parseable committed BENCH_r*.json found"


def test_headline_queries_exist_in_registry():
    import bench

    from rc_scanner_spark.queries import build_registry

    reg = build_registry()
    missing = [n for n in bench.HEADLINE if n not in reg]
    assert not missing, f"bench.HEADLINE names unknown queries: {missing}"
