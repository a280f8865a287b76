"""Scalar-function and set-operation coverage (SURVEY.md §2.7/§2.8).

The reference's scalar surface is small (round/case/coalesce/date/JSON,
§2.8); these queries extend the checked surface to the regex, date
arithmetic, and INTERSECT/EXCEPT families so the engine's everyday SQL
vocabulary is oracle-verified too. Regex patterns stick to the syntax
subset where Java regex (Spark) and RE2 (DuckDB) agree exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register


@register(
    "set02_intersect_except",
    oracle="""
    SELECT c_custkey, 'both' AS src FROM (
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      INTERSECT
      SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    UNION ALL
    SELECT c_custkey, 'building_only' AS src FROM (
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      EXCEPT
      SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    """,
)
def set02_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT (distinct set semantics, hash-based).

    Both compile to aggregate + semi/anti joins — no sort, distinct
    applied per ANSI set-op semantics.
    """
    building = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    urgent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    both = building.intersect(urgent).withColumn("src", F.lit("both"))
    only = building.exceptAll(urgent).distinct().withColumn(
        "src", F.lit("building_only")
    )
    return both.unionByName(only)


@register(
    "p12_regex_functions",
    oracle=r"""
    SELECT p_partkey,
           regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
           CAST(regexp_matches(p_type, '^PROMO') AS INT) AS is_promo,
           len(regexp_split_to_array(p_name, ' +')) AS n_words
    FROM part
    """,
)
def p12_regex_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex family: extract, global replace, match test, split.

    All JVM-side (codegen) — regex never needs a UDF. DuckDB's
    ``regexp_replace(..., 'g')`` equals Spark's always-global
    ``regexp_replace``.
    """
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", r"([a-z]+)$", 1).alias("last_word"),
        F.regexp_replace("p_name", r"[aeiou]", "_").alias("devoweled"),
        F.col("p_type").rlike("^PROMO").cast("int").alias("is_promo"),
        F.size(F.split("p_name", r" +")).alias("n_words"),
    )


@register(
    "dt01_date_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS yr,
           CAST(month(CAST(o_orderdate AS DATE)) AS INT) AS mo,
           CAST(quarter(CAST(o_orderdate AS DATE)) AS INT) AS qtr,
           CAST(dayofweek(CAST(o_orderdate AS DATE)) AS INT) AS dow_sun0,
           strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d')
             AS plus_30d,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d')
             AS month_end,
           datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
             AS days_since_95
    FROM orders
    """,
)
def dt01_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic family: parts, intervals, month ends, diffs.

    DuckDB ``dayofweek`` is 0=Sunday; Spark ``dayofweek`` is 1=Sunday —
    normalized to the DuckDB convention. All expressions are
    constant-folded date math inside codegen.
    """
    o = load_table(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("yr"),
        F.month(d).alias("mo"),
        F.quarter(d).alias("qtr"),
        (F.dayofweek(d) - 1).alias("dow_sun0"),
        F.date_format(F.date_add(d, 30), "yyyy-MM-dd").alias("plus_30d"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).alias("days_since_95"),
    )
