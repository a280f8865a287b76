"""SQL-surface queries (SURVEY.md §2.1 S10): the catalog/view path.

The reference's dashboard runs raw SQL strings against DuckDB
(``portfolio_app/app.py:63-70``). The engine's equivalent surface is
``register_views`` + ``spark.sql`` — and because the views carry the
same names as the DuckDB oracle's, one ANSI SQL string can drive BOTH
engines, which is exactly what this query does (the string below *is*
its own oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..io import register_views
from ..registry import register

_NATION_ACTIVITY_SQL = """
    SELECT n.n_name AS nation,
           COUNT(DISTINCT c.c_custkey) AS n_customers,
           COUNT(o.o_orderkey) AS n_orders,
           COUNT(DISTINCT o.o_orderpriority) AS n_priorities
    FROM nation n
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY n.n_name
"""


@register("s10_sql_catalog_query", oracle=_NATION_ACTIVITY_SQL)
def s10_sql_catalog_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10: one dialect-neutral SQL text, executed by Catalyst here and
    verbatim by DuckDB as its own oracle. Exact (count-only) aggregates
    keep the comparison type-stable; Catalyst broadcasts nation and
    customer under the fact-side LEFT JOIN exactly as the DataFrame API
    plans would."""
    register_views(spark, sf_dir)
    return spark.sql(_NATION_ACTIVITY_SQL)
