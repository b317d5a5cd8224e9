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

def write_fixture(spark, tmp_path, name, rows, schema):
    """Shared planted-test fixture writer: one <name>.parquet per
    table, same layout convention as the sf dirs.  Invalidates the
    loader's schema cache for the path so a re-written fixture with a
    different schema is never served stale."""
    from rc_scanner_spark.tables import invalidate_schema_cache

    path = str(tmp_path / f"{name}.parquet")
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)
    invalidate_schema_cache(path)
