"""Driver-rotation ledger guard (VERDICT r6 item 7).

The external driver oracle-checks a ~50-entry prefix of
``_VERIFICATION_PRIORITY`` per round.  Evidence only converges if each
round's prefix spends its hash-checkable slots on entries that still
NEED a driver row, so this test pins three invariants against the
newest ``CORRECTNESS_r*.json`` committed to the repo:

1. no prefix entry already has a green (or rows-only-ran) row in the
   newest correctness file — re-sampling fresh evidence wastes a slot
   (entries whose newest row FAILED are allowed: they must re-run);
2. no ``sql=None`` (rows-only) entry sits in the prefix — the driver
   can only print ``err: no_oracle`` for those, burning a hash slot —
   UNLESS the entry has never appeared in any committed correctness
   file: the prefix is all the driver ever checks, so a never-sampled
   rows-only query can only earn its one (weaker, rows-only) driver
   row by spending a slot once (r12 verdict: ``embed_pca_variance``
   was the last never-sampled registry entry);
3. the priority list is duplicate-free and covers the whole registry,
   so no query silently falls back to module iteration order.

After the driver lands a new CORRECTNESS file, this test FAILS until
the prefix is rotated — that is the point (the r6 verdict found the
never-sampled backlog growing because rotation was convention-only).
"""

from __future__ import annotations

import json
import re
import subprocess
from pathlib import Path

from rc_scanner_spark.queries import (
    _PREFIX_ROWS_ONLY_REVERIFY,
    _VERIFICATION_PRIORITY,
    build_registry,
)

REPO = Path(__file__).resolve().parent.parent
PREFIX_SLOTS = 50


def _newest_correctness() -> dict:
    # Only COMMITTED correctness files count: the driver writes the new
    # round's file to disk before it lands in git, and the rotation is
    # the NEXT round's first job — an untracked fresh file must not
    # redden the suite mid-verification.
    try:
        tracked = subprocess.run(
            ["git", "ls-files", "CORRECTNESS_r*.json"],
            cwd=REPO,
            capture_output=True,
            text=True,
            check=True,
        ).stdout.split()
    except (subprocess.CalledProcessError, FileNotFoundError):
        tracked = None  # not a git checkout: fall back to disk
    files = sorted(
        (REPO / f for f in tracked)
        if tracked is not None
        else REPO.glob("CORRECTNESS_r*.json"),
        key=lambda p: int(re.search(r"r(\d+)", p.stem).group(1)),
    )
    assert files, "no CORRECTNESS_r*.json committed"
    return json.loads(files[-1].read_text())


def test_priority_list_unique_and_complete():
    assert len(_VERIFICATION_PRIORITY) == len(set(_VERIFICATION_PRIORITY))
    reg = build_registry()
    assert sorted(_VERIFICATION_PRIORITY) == sorted(reg)


def test_prefix_is_oracle_backed():
    reg = build_registry()
    ever_sampled: set[str] = set()
    for f in subprocess.run(
        ["git", "ls-files", "CORRECTNESS_r*.json"],
        cwd=REPO,
        capture_output=True,
        text=True,
        check=True,
    ).stdout.split():
        ever_sampled.update(json.loads((REPO / f).read_text()))
    rows_only = [
        n
        for n in _VERIFICATION_PRIORITY[:PREFIX_SLOTS]
        if reg[n].sql is None
        and n in ever_sampled
        and n not in _PREFIX_ROWS_ONLY_REVERIFY
    ]
    assert not rows_only, (
        f"already-sampled rows-only entries in the driver prefix burn "
        f"hash-checked slots: {rows_only}"
    )
    # the re-admission escape hatch is itself audited: every declared
    # entry must be rows-only (sql=None) — a hash-checkable query never
    # needs it — and the declaration is tool-emitted per round for
    # entries whose implementation changed since their newest driver
    # row (see tools/rotate_prefix.py), so a stale copy that names a
    # now-hash-checkable query fails here.
    not_rows_only = [n for n in _PREFIX_ROWS_ONLY_REVERIFY if reg[n].sql is not None]
    assert not not_rows_only, (
        f"_PREFIX_ROWS_ONLY_REVERIFY entries must be sql=None: {not_rows_only}"
    )


def test_prefix_entries_still_need_driver_evidence():
    newest = _newest_correctness()
    # an entry is "settled" in the newest file if it hash-matched or was
    # a rows-only run that produced rows; failures stay eligible
    settled = {
        name
        for name, row in newest.items()
        if row.get("hash_match") is True
        or (row.get("err") == "no_oracle" and row.get("spark_rows"))
    }
    stale_picks = [
        n for n in _VERIFICATION_PRIORITY[:PREFIX_SLOTS] if n in settled
    ]
    assert not stale_picks, (
        "prefix re-samples entries with fresh driver evidence "
        f"(rotate them to the tail): {stale_picks}"
    )
