"""One-command round certification: the exact sequence PLANS.md
records each round, so the closing-tree evidence is reproducible
without re-deriving the recipe.

Runs, in order (each step must pass for the next to run):
  1. full DuckDB-oracle sweep at sf0.01 (the driver's grading scale)
  2. full sweep at sf0.001
  3. default test lane   (pytest tests/ -q; pytest.ini deselects slow)
  4. slow certification lane (pytest tests/ -q -m slow)
  5. bench at $SPARK_GRAFT_SF_DIR (default sf0.1)

Prints one summary line per step and exits non-zero on the first
failure.  Run on a SETTLED host: suite and bench wall times swing
±30-60% with host state (PLANS.md round-11 variance notes) — compare
mins across runs, not single readings.

Usage: python tools/certify.py [--skip-bench]
"""

from __future__ import annotations

import subprocess
import sys
import time

# sys.executable, not bare "python": the bare name can resolve to a
# different interpreter (venv vs system) than the one running
# certify.py, silently certifying against the wrong environment
# (ADVICE r11).
PY = sys.executable
STEPS = [
    ("oracle sf0.01", [PY, "tools/check_oracle.py", "/root/testdata/sf0.01"]),
    ("oracle sf0.001", [PY, "tools/check_oracle.py", "/root/testdata/sf0.001"]),
    ("default lane", [PY, "-m", "pytest", "tests/", "-q"]),
    ("slow lane", [PY, "-m", "pytest", "tests/", "-q", "-m", "slow"]),
    ("bench", [PY, "bench.py"]),
]


def main() -> int:
    skip_bench = "--skip-bench" in sys.argv
    for name, cmd in STEPS:
        if skip_bench and name == "bench":
            print(f"[certify] {name}: SKIPPED (--skip-bench)")
            continue
        t0 = time.perf_counter()
        proc = subprocess.run(cmd, capture_output=True, text=True)
        dt = time.perf_counter() - t0
        tail = (proc.stdout or proc.stderr).strip().splitlines()
        last = tail[-1] if tail else ""
        status = "ok" if proc.returncode == 0 else f"FAIL rc={proc.returncode}"
        print(f"[certify] {name}: {status} ({dt:.0f}s) — {last}")
        if proc.returncode != 0:
            print(proc.stdout[-4000:], file=sys.stderr)
            print(proc.stderr[-4000:], file=sys.stderr)
            return proc.returncode
    return 0


if __name__ == "__main__":
    sys.exit(main())
