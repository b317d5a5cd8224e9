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


# Adjudicated min-time regressions: (newest-bench-filename, query)
# pairs reviewed and accepted as deliberate trades (e.g. the r8
# count-first ngram fix traded local wall-time for bounded aggregation
# buffers).  Add the pair HERE with a justification comment — PLANS.md
# records the analysis, this set is what the guard actually consults.
_ADJUDICATED_MIN_REGRESSIONS: set[tuple[str, str]] = set()


def _min_regressions(
    prev: dict, curr: dict, threshold: float = 1.5
) -> list[tuple[str, float, float]]:
    """Queries whose low-noise floor (per-query *min* across bench
    samples) grew more than ``threshold``x between two parsed bench
    payloads.  Medians swing +-30% with host load; the min floor is
    stable, so a >50% min jump is a real plan regression, not noise."""
    pm, cm = prev.get("queries_min"), curr.get("queries_min")
    if not pm or not cm:  # pre-r6 single-sample files carry no mins
        return []
    return [
        (q, pm[q], cm[q]) for q in pm if q in cm and cm[q] > threshold * pm[q]
    ]


def test_bench_min_drift_guard():
    """Round-over-round drift guard (VERDICT r8 item 5): the newest
    committed BENCH must not show any headline query whose min grew
    >50% vs the round before it — the r8 ngram regression (2.06s ->
    3.92s) sat unflagged for two rounds because nothing diffed the
    artifacts."""
    named = [
        (f.name, p)
        for f, p in (
            (f, json.loads(f.read_text())["parsed"])
            for f in sorted(_committed_bench_files())
        )
        if p is not None and p.get("queries_min")
    ]
    assert len(named) >= 2, "need two committed min-bearing BENCH files"
    newest_name, curr = named[-1]
    bad = [
        row
        for row in _min_regressions(named[-2][1], curr)
        if (newest_name, row[0]) not in _ADJUDICATED_MIN_REGRESSIONS
    ]
    assert not bad, (
        "headline min-time regressions vs the previous committed bench "
        f"(query, prev_min, curr_min): {bad} — find the plan change, or "
        "record the analysis in PLANS.md and add "
        f"({newest_name!r}, <query>) to _ADJUDICATED_MIN_REGRESSIONS "
        "above if the trade is deliberate"
    )


def test_min_drift_guard_would_have_caught_r8_ngram():
    """The guard's own fixture: r7 -> r8 carried the ngram_jaccard
    count->filter->join-back regression (min 2.06s -> 3.92s, +90%);
    _min_regressions must flag it."""
    r7 = json.loads((REPO / "BENCH_r07.json").read_text())["parsed"]
    r8 = json.loads((REPO / "BENCH_r08.json").read_text())["parsed"]
    bad = _min_regressions(r7, r8)
    assert any(q == "dedup_ngram_jaccard" for q, _, _ in bad), bad


def test_headline_queries_exist_in_registry():
    import bench

    from rc_scanner_spark.queries import build_registry

    reg = build_registry()
    missing = [n for n in bench.HEADLINE if n not in reg]
    assert not missing, f"bench.HEADLINE names unknown queries: {missing}"
