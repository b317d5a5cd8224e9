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


# Recursive CTE (Spark 4 + DuckDB both speak WITH RECURSIVE): month
# calendar spine from min to max order date — the standard gap-filling
# shape (months with zero orders still appear).  The max bound rides
# along in the recursion so the recursive step needs no subquery.
SQL_API_RECURSIVE_CTE = """
WITH RECURSIVE months(m, mx) AS (
  SELECT date_trunc('month', min(o_orderdate)),
         date_trunc('month', max(o_orderdate))
  FROM orders
  UNION ALL
  SELECT m + INTERVAL 1 MONTH, mx FROM months WHERE m < mx
),
per AS (
  SELECT date_trunc('month', o_orderdate) AS m, count(*) AS n
  FROM orders GROUP BY 1
)
SELECT months.m AS month_start, CAST(COALESCE(per.n, 0) AS BIGINT) AS n_orders
FROM months LEFT JOIN per ON per.m = months.m
"""

# Correlated EXISTS / NOT EXISTS (planned as semi/anti joins).
SQL_API_EXISTS = """
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
"""

# LATERAL correlated subquery: per-customer top-2 orders — the lateral
# form of the window top-k (Catalyst rewrites it to a lateral join).
SQL_API_LATERAL = """
SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
FROM customer c
JOIN LATERAL (
  SELECT o_orderkey, o_totalprice
  FROM orders
  WHERE o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey
  LIMIT 2
) t ON true
"""


SQL_API_GROUP_BY_ALL = """
SELECT n_name, r_name,
       count(*) AS n_suppliers,
       round(sum(s_acctbal), 2) AS total_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ALL
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
    "sql_api_recursive_cte": QuerySpec(
        _sql_query(SQL_API_RECURSIVE_CTE), SQL_API_RECURSIVE_CTE
    ),
    "sql_api_exists": QuerySpec(_sql_query(SQL_API_EXISTS), SQL_API_EXISTS),
    "sql_api_lateral": QuerySpec(_sql_query(SQL_API_LATERAL), SQL_API_LATERAL),
    "sql_api_group_by_all": QuerySpec(
        _sql_query(SQL_API_GROUP_BY_ALL), SQL_API_GROUP_BY_ALL
    ),
}
