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

from ..functions.rounding import duck_round
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


@register(
    "p13_string_functions",
    oracle="""
    SELECT s_suppkey,
           upper(s_name) AS name_upper,
           lower(s_name) AS name_lower,
           CAST(length(s_name) AS INT) AS name_len,
           trim(concat('  ', s_name, '  ')) AS trimmed,
           lpad(CAST(s_suppkey AS VARCHAR), 8, '0') AS padded_key,
           substring(s_name, 1, 4) AS prefix,
           replace(s_name, '#', '-') AS dehashed,
           concat_ws('|', s_name, CAST(s_nationkey AS VARCHAR)) AS joined,
           CAST(strpos(s_name, '#') AS INT) AS hash_pos,
           reverse(s_name) AS reversed
    FROM supplier
    """,
)
def p13_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function family: case, length, trim, pad, substring,
    replace, concat, position, reverse.

    Completes §2.8's scalar families (math/conditional/date/JSON/regex
    already covered) — every function here is whole-stage-codegen
    JVM-side with agreed cross-engine semantics (1-based substring and
    strpos/instr, space-trim only).
    """
    s = load_table(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        F.upper("s_name").alias("name_upper"),
        F.lower("s_name").alias("name_lower"),
        F.length("s_name").alias("name_len"),
        F.trim(F.concat(F.lit("  "), F.col("s_name"), F.lit("  "))).alias(
            "trimmed"
        ),
        F.lpad(F.col("s_suppkey").cast("string"), 8, "0").alias("padded_key"),
        F.substring("s_name", 1, 4).alias("prefix"),
        F.replace(F.col("s_name"), F.lit("#"), F.lit("-")).alias("dehashed"),
        F.concat_ws(
            "|", F.col("s_name"), F.col("s_nationkey").cast("string")
        ).alias("joined"),
        F.instr("s_name", "#").alias("hash_pos"),
        F.reverse("s_name").alias("reversed"),
    )


@register(
    "p14_unpivot_measures",
    oracle="""
    SELECT l_orderkey, l_linenumber, measure, ROUND(val, 2) AS val
    FROM (
      SELECT l_orderkey, l_linenumber,
             l_quantity, l_extendedprice, l_discount
      FROM lineitem WHERE l_orderkey % 100 = 0
    ) UNPIVOT (val FOR measure IN (l_quantity, l_extendedprice, l_discount))
    """,
)
def p14_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): wide measure columns to (measure, value) rows.

    The inverse of a15's pivot — the standard reshape before generic
    per-measure aggregation or plotting. Spark's ``unpivot`` expands
    rows map-side (an Expand node, like grouping sets): no shuffle, no
    UDF, output = rows x measures.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % 100 == 0
    )
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "measure",
        "__v",
    ).select(
        "l_orderkey",
        "l_linenumber",
        "measure",
        duck_round("__v", 2).alias("val"),
    )


@register(
    "set03_multiset_ops",
    oracle="""
    WITH a AS (SELECT l_partkey AS k FROM lineitem WHERE l_returnflag = 'R'),
         b AS (SELECT l_partkey AS k FROM lineitem WHERE l_linestatus = 'F')
    SELECT 'except_all' AS op, k, COUNT(*) AS n FROM (
      SELECT k FROM a EXCEPT ALL SELECT k FROM b
    ) GROUP BY k
    UNION ALL
    SELECT 'intersect_all' AS op, k, COUNT(*) AS n FROM (
      SELECT k FROM a INTERSECT ALL SELECT k FROM b
    ) GROUP BY k
    """,
)
def set03_multiset_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset set operations: EXCEPT ALL / INTERSECT ALL.

    Bag semantics (per-row multiplicity arithmetic) vs set02's distinct
    semantics. Spark plans both as aggregate-on-counts — one shuffle on
    the key, never a sort — identical to the SQL standard's
    multiplicity rules; the grouped output keeps the comparison
    order-free.
    """
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_partkey").alias("k")
    )
    b = li.filter(F.col("l_linestatus") == "F").select(
        F.col("l_partkey").alias("k")
    )
    ex = (
        a.exceptAll(b)
        .groupBy("k")
        .agg(F.count("*").alias("n"))
        .select(F.lit("except_all").alias("op"), "k", "n")
    )
    ia = (
        a.intersectAll(b)
        .groupBy("k")
        .agg(F.count("*").alias("n"))
        .select(F.lit("intersect_all").alias("op"), "k", "n")
    )
    return ex.unionAll(ia)


@register(
    "p15_posexplode_tokens",
    oracle="""
    SELECT doc_id,
           CAST(generate_subscripts(t, 1) - 1 AS INT) AS pos,
           unnest(t) AS tok
    FROM (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
      FROM documents WHERE doc_id % 50 = 0
    )
    """,
)
def p15_posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordinal explode: token stream with positions (LATERAL VIEW
    posexplode).

    Positions survive the flatten, which windowed NLP features
    (skip-grams, positional encodings) require — a plain explode loses
    them. Map-side row generation; no shuffle.
    """
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 50 == 0
    )
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    return docs.select(
        "doc_id", F.posexplode(toks).alias("pos", "tok")
    )


@register(
    "p16_array_map_functions",
    oracle="""
    SELECT doc_id,
           array_to_string(list_sort(t[1:5]), ' ') AS first_sorted,
           CAST(len(t) AS INT) AS n_toks,
           t[1] AS first_tok,
           t[len(t)] AS last_tok,
           array_to_string(t[1:3], '-') AS joined2,
           CAST(list_contains(t, 'spark') AS INT) AS has_spark,
           array_to_string(list_sort(list_distinct(t[1:6])), ' ')
             AS first_distinct
    FROM (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
      FROM documents WHERE doc_id % 50 = 0
    )
    """,
)
def p16_array_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function family: slice, sort, size, element_at (head/tail),
    join, contains, distinct.

    All higher-order/array ops are JVM-side expressions — the engine's
    nested-data surface never needs Python. Array-valued results are
    serialized to strings for the oracle hash (the compare layer is
    scalar-typed), with the distinct list canonically sorted first
    because DuckDB's list_distinct does not preserve first-seen order.
    """
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 50 == 0
    )
    t = F.filter(F.split("text", " "), lambda x: x != "")
    return docs.select(
        "doc_id",
        F.array_join(F.sort_array(F.slice(t, 1, 5)), " ").alias(
            "first_sorted"
        ),
        F.size(t).alias("n_toks"),
        F.element_at(t, 1).alias("first_tok"),
        F.element_at(t, -1).alias("last_tok"),
        F.array_join(F.slice(t, 1, 3), "-").alias("joined2"),
        F.array_contains(t, "spark").cast("int").alias("has_spark"),
        F.array_join(
            F.sort_array(F.array_distinct(F.slice(t, 1, 6))), " "
        ).alias("first_distinct"),
    )
