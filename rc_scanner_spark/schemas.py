"""Spark schemas for the reference's event model.

``CHANGE_SCHEMA`` mirrors the reference's ``Change`` TypedDict
(utils.py:18-36) with nested ``Meta`` (utils.py:5-15) — but as an
*enforced* StructType instead of a static-typing-only annotation (the
reference casts raw dicts, scanner.py:77).

``FLAG_LOG_SCHEMA`` mirrors ``FlagLogEntry`` (utils.py:39-43): the
flagged-changes log row = filter name + embedded change + log paths
(paths NULL at LOG_LEVEL 2, populated at 3; scanner.py:162-175).
"""

from __future__ import annotations

from pyspark.sql import types as T

META_SCHEMA = T.StructType(
    [
        T.StructField("domain", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("uri", T.StringType()),
        T.StructField("offset", T.LongType()),
        T.StructField("topic", T.StringType()),
        T.StructField("request_id", T.StringType()),
        T.StructField("schema_uri", T.StringType()),
        T.StructField("dt", T.StringType()),  # ISO-8601; date = dt[:10]
        T.StructField("id", T.StringType()),
    ]
)

_OLD_NEW = T.StructType(
    [T.StructField("old", T.LongType()), T.StructField("new", T.LongType())]
)

CHANGE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("type", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("namespace", T.IntegerType()),
        T.StructField("comment", T.StringType()),
        T.StructField("user", T.StringType()),
        T.StructField("bot", T.BooleanType()),
        T.StructField("minor", T.BooleanType()),
        T.StructField("patrolled", T.BooleanType()),
        T.StructField("wiki", T.StringType()),
        T.StructField("server_name", T.StringType()),
        T.StructField("server_url", T.StringType()),
        T.StructField("server_script_path", T.StringType()),
        T.StructField("timestamp", T.LongType()),  # epoch seconds
        T.StructField("length", _OLD_NEW),
        T.StructField("revision", _OLD_NEW),
        T.StructField("meta", META_SCHEMA),
    ]
)

LOG_PATHS_SCHEMA = T.StructType(
    [T.StructField("folder", T.StringType()), T.StructField("file", T.StringType())]
)

FLAG_LOG_SCHEMA = T.StructType(
    [
        T.StructField("filter", T.StringType()),
        T.StructField("change", CHANGE_SCHEMA),
        T.StructField("log", LOG_PATHS_SCHEMA),
    ]
)

# Enrichment dimensions (replace the reference's per-row HTTP lookups,
# scanner.py:178-218, with joinable tables; FIXTURES.md §A.2/§A.3).
USERS_SCHEMA = T.StructType(
    [
        T.StructField("user", T.StringType()),
        T.StructField("editcount", T.LongType()),
    ]
)

REVISIONS_SCHEMA = T.StructType(
    [
        T.StructField("revid", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)
