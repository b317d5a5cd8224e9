"""Compute the next driver-rotation ordering for _VERIFICATION_PRIORITY.

The external driver oracle-checks a ~50-entry prefix of the registry
per round; tests/test_rotation_ledger.py fails the suite if the prefix
re-samples settled entries or contains rows-only (sql=None) queries.
This tool makes the per-round rotation mechanical: it reads every
git-committed CORRECTNESS_r*.json, classifies each registry query by
its NEWEST driver evidence, and prints the recommended ordering —
paste the prefix into queries/__init__.py at the top of the round.

Ordering policy (the r6-verdict rules, extended by the r14 verdict):
 1. FAILED in the newest file (must re-run after the fix)
 2. oracle-backed, never driver-sampled (newest additions first-come)
 3. rows-only never-sampled (the prefix is all the driver ever
    checks, so these must spend one slot once to earn their weaker
    rows-only row; self-limiting — after one round they are sampled)
 4. TOUCHED since their newest driver row (r14 verdict item 3): a
    query whose implementation — its query module or any
    rc_scanner_spark module that module transitively imports — has a
    git diff between the commit that landed its newest
    CORRECTNESS_r*.json evidence and HEAD.  The driver has never
    hash-checked the post-rewrite output of such a query, so it
    outranks mere staleness.  (Only oracle-backed entries: rows-only
    ones cannot earn a hash row regardless.)
 5. stale oracle-backed, ascending by newest-evidence round
 6. everything else, ascending by newest-evidence round (freshest last)

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


# Shared infrastructure every query flows through.  A change here is
# exercised by EVERY round's 50 samples regardless of which queries
# they are, so it carries no per-query rotation signal — recursing into
# it would flag all 400 queries whenever the loader/session is touched
# and drown the operator-rewrite signal the tier exists for.
_STOP_MODULES = {
    "rc_scanner_spark.session",
    "rc_scanner_spark.tables",
    "rc_scanner_spark.queries",  # the package __init__ (QuerySpec, load_tuned)
}


class _SymbolGraph:
    """Static symbol-level dependency graph over the rc_scanner_spark
    package (HEAD sources): for a top-level symbol, which other
    (module, symbol) pairs does its AST reference, following both
    ``from ..m import name`` bindings and ``import m as alias``
    attribute access.  No code is executed."""

    def __init__(self):
        import ast

        self._ast = ast
        self._mod: dict[str, dict] = {}  # qualname -> {defs, imports, modalias}
        self._reach: dict[tuple[str, str], set[tuple[str, str]]] = {}

    def _load(self, qualname: str) -> dict | None:
        if qualname in self._mod:
            return self._mod[qualname]
        parts = qualname.split(".")
        path = REPO / Path(*parts).with_suffix(".py")
        is_pkg = False
        if not path.exists():
            path = REPO / Path(*parts) / "__init__.py"
            is_pkg = True
            if not path.exists():
                self._mod[qualname] = None
                return None
        info = _parse_module(self._ast, path.read_text(), qualname, is_pkg)
        self._mod[qualname] = info
        return info

    def reachable(self, module: str, symbol: str) -> set[tuple[str, str]]:
        """All (module, symbol) pairs transitively referenced from
        ``module.symbol`` (inclusive), stopping at _STOP_MODULES."""
        key = (module, symbol)
        if key in self._reach:
            return self._reach[key]
        if module in _STOP_MODULES:
            # infrastructure symbols neither count as changed nor get
            # recursed into (see _STOP_MODULES)
            self._reach[key] = set()
            return set()
        self._reach[key] = {key}  # cycle guard
        out = {key}
        info = self._load(module)
        if info is None:
            return out
        node = info["defs"].get(symbol)
        if node is None:
            return out
        ast = self._ast
        # function-local `from ..operators.x import y` bindings (the
        # dominant style in the query modules) shadow/extend the
        # module-level ones for this symbol's body
        parts = module.split(".")
        pkg = parts if info["is_pkg"] else parts[:-1]
        local_imports = dict(info["imports"])
        local_modalias = dict(info["modalias"])
        for sub in ast.walk(node):
            if isinstance(sub, (ast.Import, ast.ImportFrom)):
                _bind_imports(ast, sub, pkg, local_imports, local_modalias)
        for sub in ast.walk(node):
            if isinstance(sub, ast.Name) and isinstance(sub.ctx, ast.Load):
                tgt = None
                if sub.id in local_imports:
                    tgt = local_imports[sub.id]
                elif sub.id in info["defs"] and sub.id != symbol:
                    tgt = (module, sub.id)
                if tgt and tgt[0].startswith("rc_scanner_spark"):
                    out |= self.reachable(*tgt)
            elif (
                isinstance(sub, ast.Attribute)
                and isinstance(sub.value, ast.Name)
                and sub.value.id in local_modalias
            ):
                modq = local_modalias[sub.value.id]
                if modq.startswith("rc_scanner_spark"):
                    out |= self.reachable(modq, sub.attr)
        self._reach[key] = out
        return out


def _bind_imports(ast, node, pkg: list[str], imports: dict, modalias: dict) -> None:
    """Record the name bindings one import statement creates."""
    if isinstance(node, ast.Import):
        for a in node.names:
            modalias[a.asname or a.name.split(".")[0]] = a.name
    elif isinstance(node, ast.ImportFrom):
        if node.level:
            base = pkg[: len(pkg) - (node.level - 1)]
            mod = ".".join(base + ([node.module] if node.module else []))
        else:
            mod = node.module or ""
        for a in node.names:
            bound = a.asname or a.name
            # `from ..operators import dedup as _dedup` binds a MODULE
            sub = f"{mod}.{a.name}"
            if (REPO / Path(*sub.split("."))).with_suffix(".py").exists() or (
                REPO / Path(*sub.split(".")) / "__init__.py"
            ).exists():
                modalias[bound] = sub
            else:
                imports[bound] = (mod, a.name)


def _parse_module(ast, src: str, qualname: str, is_pkg: bool) -> dict:
    """Top-level defs + import bindings of one module source."""
    defs: dict[str, object] = {}
    imports: dict[str, tuple[str, str]] = {}
    modalias: dict[str, str] = {}
    out = {"defs": defs, "imports": imports, "modalias": modalias, "is_pkg": is_pkg}
    try:
        tree = ast.parse(src)
    except SyntaxError:
        return out
    parts = qualname.split(".")
    pkg = parts if is_pkg else parts[:-1]
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            defs[node.name] = node
        elif isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name):
                    defs[t.id] = node
        elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
            defs[node.target.id] = node
        elif isinstance(node, (ast.Import, ast.ImportFrom)):
            _bind_imports(ast, node, pkg, imports, modalias)
    return out


def _changed_symbols(ast, old_src: str | None, new_src: str | None, qualname: str,
                     is_pkg: bool) -> set[str]:
    """Top-level symbols whose AST differs between two versions of a
    module (``ast.dump`` comparison: comment/formatting-only edits do
    not count)."""
    old = _parse_module(ast, old_src or "", qualname, is_pkg)["defs"]
    new = _parse_module(ast, new_src or "", qualname, is_pkg)["defs"]
    changed = set()
    for name in set(old) | set(new):
        a, b = old.get(name), new.get(name)
        if a is None or b is None or ast.dump(a) != ast.dump(b):
            changed.add(name)
    return changed


def _touched_since(reg, newest_round: dict[str, int]) -> set[str]:
    """Queries a top-level symbol of whose implementation changed after
    the commit that landed their newest driver-evidence CORRECTNESS
    file (r14 verdict item 3).  Symbol-level: only queries that
    transitively REFERENCE a changed function/class/constant are
    flagged, so a rewrite of one operator does not flag every query in
    the same file."""
    import ast

    # round -> commit that ADDED its correctness file
    add_commit: dict[int, str] = {}
    for path in correctness_files():
        rnd = int(re.search(r"r(\d+)", path.stem).group(1))
        out = subprocess.run(
            ["git", "log", "--diff-filter=A", "-1", "--format=%H", "--", path.name],
            cwd=REPO,
            capture_output=True,
            text=True,
        ).stdout.strip()
        if out:
            add_commit[rnd] = out

    graph = _SymbolGraph()

    def _git_show(sha: str, relpath: str) -> str | None:
        r = subprocess.run(
            ["git", "show", f"{sha}:{relpath}"],
            cwd=REPO,
            capture_output=True,
            text=True,
        )
        return r.stdout if r.returncode == 0 else None

    # per evidence round: set of (module, symbol) changed since then
    changed_cache: dict[int, set[tuple[str, str]]] = {}

    def changed_set(rnd: int) -> set[tuple[str, str]]:
        if rnd in changed_cache:
            return changed_cache[rnd]
        sha = add_commit[rnd]
        files = subprocess.run(
            ["git", "diff", "--name-only", f"{sha}..HEAD", "--", "rc_scanner_spark/"],
            cwd=REPO,
            capture_output=True,
            text=True,
        ).stdout.split()
        out: set[tuple[str, str]] = set()
        for f in files:
            if not f.endswith(".py"):
                continue
            is_pkg = f.endswith("__init__.py")
            mod_parts = f[: -len(".py")].split("/")
            if is_pkg:
                mod_parts = mod_parts[:-1]
            qual = ".".join(mod_parts)
            new_path = REPO / f
            new_src = new_path.read_text() if new_path.exists() else None
            for sym in _changed_symbols(ast, _git_show(sha, f), new_src, qual, is_pkg):
                out.add((qual, sym))
        changed_cache[rnd] = out
        return out

    touched: set[str] = set()
    recent: set[str] = set()
    # "recently touched" = a reachable symbol changed since the add
    # commit of the SECOND-newest correctness file, i.e. during the
    # last completed round — these are the fresh rewrites the newest
    # driver run could not have covered unless it sampled them, and
    # they outrank the older touch backlog inside the tier.
    rounds = sorted(add_commit)
    recent_rnd = rounds[-2] if len(rounds) > 1 else rounds[-1] if rounds else None
    for name, spec in reg.items():
        rnd = newest_round.get(name)
        if rnd is None or rnd not in add_commit:
            continue
        reach = graph.reachable(spec.fn.__module__, spec.fn.__name__)
        if reach & changed_set(rnd):
            touched.add(name)
            if recent_rnd is not None and reach & changed_set(recent_rnd):
                recent.add(name)
    return touched, recent


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
    touched, recent_touch = _touched_since(reg, newest_round)
    touched -= set(failed)
    # entries settled by the NEWEST correctness file are barred from the
    # prefix by test_prefix_entries_still_need_driver_evidence; their
    # driver row already post-dates the touch, so they are not "touched
    # since their newest driver row" in the sense that matters.
    newest_file_round = max(newest_round.values(), default=0)
    touched = {n for n in touched if newest_round[n] < newest_file_round}
    # last-round rewrites first (the driver has never seen their new
    # output), then the older touch backlog, each stalest-evidence first
    touched_sorted = sorted(
        touched, key=lambda n: (n not in recent_touch, newest_round[n], n)
    )
    sampled = [
        n for n in reg if n in newest_round and n not in failed and n not in touched
    ]
    # untouched already-sampled rows-only entries can never improve
    # their evidence (the driver would just re-record err:no_oracle) —
    # they sink to the very tail instead of drifting into the prefix
    # with the staleness drain.  TOUCHED rows-only entries stay in the
    # touched tier: a post-rewrite rows-only row is the only driver
    # evidence channel a sql=None query has (r15 policy; the ledger
    # test audits these against _PREFIX_ROWS_ONLY_REVERIFY).
    stale_sorted = sorted(
        (n for n in sampled if reg[n].sql is not None),
        key=lambda n: (newest_round[n], n),
    )
    rows_only_tail = sorted(
        (n for n in sampled if reg[n].sql is None),
        key=lambda n: (newest_round[n], n),
    )

    # Never-sampled rows-only entries go right after the hash-checkable
    # never-sampled block: the prefix is all the driver ever checks, so
    # the only way they earn their (weaker, rows-only) driver row is by
    # spending a slot once — self-limiting, since after one round they
    # are sampled and test_rotation_ledger.py bars them from the prefix.
    order = (
        failed
        + never_oracle
        + never_rows_only
        + touched_sorted
        + stale_sorted
        + rows_only_tail
    )

    print(f"# recommended rotation ({len(reg)} queries, {slots}-slot prefix)")
    print(f"# failed (re-run first): {len(failed)}")
    print(f"# never-sampled oracle-backed: {len(never_oracle)}")
    print(f"# never-sampled rows-only: {len(never_rows_only)}")
    print(f"# touched since newest driver row: {len(touched_sorted)}")
    print(f"# sampled (stale -> fresh): {len(stale_sorted)}")
    print(f"# rows-only tail (prefix-barred unless touched): {len(rows_only_tail)}")
    print()
    print("_VERIFICATION_PRIORITY: tuple[str, ...] = (")
    for i, n in enumerate(order):
        if i == slots:
            print(f"    # ---- entries below are outside the {slots}-slot prefix ----")
        rnd = newest_round.get(n)
        status = newest_status.get(n, "never")
        mark = ""
        if n in touched:
            mark = " TOUCHED-last-round, row" if n in recent_touch else " TOUCHED since"
        print(f'    "{n}",  # {status}{mark}' + (f" r{rnd}" if rnd else ""))
    print(")")
    prefix = order[:slots]
    reverify = [
        n for n in prefix if reg[n].sql is None and n in newest_round and n in touched
    ]
    print()
    print("# already-sampled rows-only entries re-admitted because touched")
    print("# (paste next to _VERIFICATION_PRIORITY; audited by the ledger test):")
    print("_PREFIX_ROWS_ONLY_REVERIFY: tuple[str, ...] = (")
    for n in reverify:
        print(f'    "{n}",  # touched since rows-only row r{newest_round[n]}')
    print(")")
    bad = [
        n
        for n in prefix
        if reg[n].sql is None and n in newest_round and n not in touched
    ]
    if bad:
        print(
            "\n# WARNING: already-sampled UNTOUCHED rows-only entries inside "
            f"the prefix: {bad}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
