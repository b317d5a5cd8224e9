"""rc_scanner_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of TamzinHadasa/rc_scanner.

The reference (/root/reference/) is a single-threaded, row-at-a-time
Python scanner over the Wikimedia RecentChanges SSE stream
(scanner.py:75-81 in the reference).  This engine re-expresses the same
semantics Spark-first:

- declarative ``FilterSpec`` -> Catalyst ``Column`` predicates
  (reference Filter class, filter_.py:17-112);
- enrichment joins instead of per-row HTTP point lookups
  (scanner.py:178-218);
- anti-join / dropDuplicates dedup instead of a JSON-log membership
  scan (filter_.py:90-102);
- higher-order-function multi-regex search instead of a Python loop
  (filter_.py:110-112);
- Structured Streaming for the live path, plain DataFrames for the
  batch/correctness path.

Everything here is built on the public Apache Spark / PySpark 4 API.
"""

__version__ = "0.1.0"

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
