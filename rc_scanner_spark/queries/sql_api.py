"""SQL-interface queries: the engine's second front door.

Each query here is executed as ``spark.sql(<ANSI SQL>)`` over
registered temp views, and the SAME SQL string is the DuckDB oracle —
proving the SQL surface (not just the DataFrame API) produces
identical results in the dialect intersection.  Catalyst plans SQL and
DataFrame identically (same logical plan), so the scale properties of
the DataFrame twins carry over unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..session import tune
from ..tables import register_views
from . import QuerySpec

# Dialect-intersection SQL: runs unmodified on Spark SQL and DuckDB.
SQL_API_REVENUE = """
SELECT l_returnflag,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY l_returnflag
"""

SQL_API_TOP_CUSTOMERS = """
SELECT c_custkey, c_name, round(sum(o_totalprice), 2) AS total_spend
FROM customer
JOIN orders ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
ORDER BY total_spend DESC, c_custkey
LIMIT 15
"""

SQL_API_WINDOW = """
SELECT o_custkey, o_orderkey,
       CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
            AS INTEGER) AS order_seq
FROM orders
WHERE o_orderdate >= TIMESTAMP '2001-01-01'
"""


def _sql_query(sql: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        tune(spark)
        register_views(spark, sf_dir)
        return spark.sql(sql)

    return run


QUERIES: dict[str, QuerySpec] = {
    "sql_api_revenue": QuerySpec(_sql_query(SQL_API_REVENUE), SQL_API_REVENUE),
    "sql_api_top_customers": QuerySpec(
        _sql_query(SQL_API_TOP_CUSTOMERS), SQL_API_TOP_CUSTOMERS
    ),
    "sql_api_window": QuerySpec(_sql_query(SQL_API_WINDOW), SQL_API_WINDOW),
}
