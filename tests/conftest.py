from __future__ import annotations

import json
import os

import pytest

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("RC_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from rc_scanner_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark("rc-scanner-tests")
    yield spark


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    from rc_scanner_spark import TABLES

    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_ORACLE}/{t}.parquet')"
        )
    return con


def make_change(i: int, title: str, *, type_: str = "edit", user: str = "Alice",
                namespace: int = 2, bot: bool = False, dt: str = "2026-08-13T00:00:00Z"):
    """Synthetic Change event matching CHANGE_SCHEMA (FIXTURES.md §A.1)."""
    return {
        "id": i, "type": type_, "title": title, "namespace": namespace,
        "comment": "c", "user": user, "bot": bot, "minor": False,
        "patrolled": False, "wiki": "enwiki",
        "server_name": "en.wikipedia.org", "server_url": "u",
        "server_script_path": "/w", "timestamp": 1700000000 + i,
        "length": {"old": 1, "new": 2},
        "revision": {"old": i, "new": 1000 + i},
        "meta": {
            "domain": "d", "partition": 0, "uri": f"uri://{i}", "offset": i,
            "topic": "t", "request_id": "r", "schema_uri": "s",
            "dt": dt, "id": str(i),
        },
    }


def write_changes_jsonl(path: str, changes: list[dict]) -> None:
    with open(path, "w", encoding="utf-8") as f:
        for c in changes:
            f.write(json.dumps(c) + "\n")

_PA_TYPES = {
    "long": "int64",
    "bigint": "int64",
    "int": "int32",
    "integer": "int32",
    "double": "float64",
    "float": "float32",
    "string": "string",
    "boolean": "bool",
}


def _pa_type(t: str):
    import pyarrow as pa

    t = t.strip()
    if t.startswith("array<") and t.endswith(">"):
        return pa.list_(_pa_type(t[6:-1]))
    if t == "timestamp":
        # naive us -> parquet TIMESTAMP(US, isAdjustedToUTC=false):
        # Spark reads TIMESTAMP_NTZ (normalized by tables.load_table's
        # canary-tested path), DuckDB reads TIMESTAMP — same values
        # the Spark writer produced under the UTC session.
        return pa.timestamp("us")
    if t == "date":
        return pa.date32()
    if t in _PA_TYPES:
        return getattr(pa, _PA_TYPES[t])()
    raise ValueError(f"write_fixture: unmapped fixture type {t!r}")


def _split_top_level(schema: str) -> list[str]:
    """Split a DDL-ish schema string on TOP-LEVEL commas only, so
    comma-bearing nested types (``decimal(p,s)``, ``struct<a:int,
    b:int>``, ``map<k,v>``) reach _pa_type whole instead of failing
    with a confusing unpack error (ADVICE r11)."""
    parts, depth, cur = [], 0, []
    for ch in schema:
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return parts


def write_fixture(spark, tmp_path, name, rows, schema):
    """Shared planted-test fixture writer: one <name>.parquet per
    table, same layout convention as the sf dirs (a directory holding
    one part file, so both Spark's directory reads and the oracle
    helpers' ``<name>.parquet/*.parquet`` globs work).  Written with
    pyarrow directly — a Spark write job per fixture cost ~0.7 s
    across ~300 planted-test writes (round-11 suite trim); the read
    path stays Spark.  Invalidates the loader's schema cache for the
    path so a re-written fixture with a different schema is never
    served stale."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from rc_scanner_spark.tables import invalidate_schema_cache

    fields = []
    for part in _split_top_level(schema):
        col, typ = part.strip().split(" ", 1)
        fields.append((col, _pa_type(typ)))
    for i, row in enumerate(rows):
        # the old Spark createDataFrame path raised on arity mismatch;
        # zip(*rows) would silently truncate instead (review r11)
        if len(row) != len(fields):
            raise ValueError(
                f"write_fixture: row {i} has {len(row)} values for "
                f"{len(fields)} schema fields"
            )
    cols = list(zip(*rows)) if rows else [[] for _ in fields]
    arrays = [
        pa.array(list(vals), type=t) for vals, (_, t) in zip(cols, fields)
    ]
    table = pa.Table.from_arrays(arrays, names=[c for c, _ in fields])
    path = tmp_path / f"{name}.parquet"
    shutil.rmtree(path, ignore_errors=True)
    path.mkdir(parents=True)
    pq.write_table(table, str(path / "part-00000.parquet"))
    invalidate_schema_cache(str(path))
