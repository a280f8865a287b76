"""Extended TPC-H query shapes (Q4/Q6/Q7/Q10/Q12/Q14/Q16/Q18/Q19/Q22).

The reference's analytic surface (``portfolio_app/app.py:81-439``) is
star-schema joins + grouped aggregates; these add the remaining classic
OLAP shapes a user would expect from a warehouse engine — EXISTS /
IN-subquery decorrelation, scalar subqueries, disjunctive join
predicates, conditional aggregation — each declared with the DataFrame
API so Catalyst decorrelates / reorders / broadcasts them.

The testdata schema is slimmed TPC-H (no partsupp, l_shipmode,
l_commitdate/receiptdate, c_phone), so the affected queries keep their
*operator shape* with predicates adapted to existing columns; the
docstring of each notes the adaptation.

Scale notes are per-query; the common theme: dimension sides broadcast,
the lineitem scan never shuffles except to its grouped aggregate, and
semi/anti joins stay semi/anti (never materialized then filtered).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import (
    det_sum,
    duck_round,
    sql_det_sum,
)
from ..io import broadcast_or_shuffle_hash, load_table
from ..registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# Size-aware build hint for every SF-proportional build side in this
# module: broadcast while the honest base relation fits the session
# threshold, shuffle-hash (or SMJ past the per-task budget) when it
# does not. A hard F.broadcast is reserved for relations bounded by
# CONSTRUCTION (nation/region, one-row scalar aggregates) — a forced
# hint on anything that grows with the data is a driver OOM at the
# 100 TB design point, because a hint can never be demoted by AQE.
_bosh = broadcast_or_shuffle_hash


_DEC = "decimal(27,10)"


@register(
    "tpch_q6_forecast_revenue",
    oracle=f"""
    SELECT {sql_det_sum("l_extendedprice * l_discount")} AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
      AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
      AND l_discount BETWEEN 0.04 AND 0.06
      AND l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure filter → global aggregate, zero joins.

    The litmus test for predicate pushdown: all three predicates reach
    the parquet scan (min/max row-group pruning on shipdate at scale),
    and the aggregate is a single partial-sum tree — the only exchange
    moves one partial row per partition.
    """
    li = _t(spark, sf_dir, "lineitem")
    sd = F.col("l_shipdate").cast("date")
    return (
        li.filter(
            (sd >= F.lit("1996-01-01").cast("date"))
            & (sd < F.lit("1997-01-01").cast("date"))
            & (F.col("l_discount").between(0.04, 0.06))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            det_sum(F.col("l_extendedprice") * F.col("l_discount")).alias(
                "revenue"
            ),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "tpch_q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
      AND CAST(o_orderdate AS DATE) < DATE '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_returnflag = 'R')
    GROUP BY o_orderpriority
    """,
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS subquery → left-semi join → priority counts.

    Adapted (no l_commitdate/l_receiptdate in the slimmed schema): the
    EXISTS predicate is "has a returned line" instead of "late line";
    the decorrelation shape is identical. The semi join never duplicates
    orders rows (an inner join + distinct would), and the returnflag
    filter pushes to the lineitem scan so only matching keys shuffle.
    """
    od = F.col("o_orderdate").cast("date")
    o = _t(spark, sf_dir, "orders").filter(
        (od >= F.lit("1996-01-01").cast("date"))
        & (od < F.lit("1996-04-01").cast("date"))
    )
    returned = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        o.join(returned, o.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "tpch_q7_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(CAST(l.l_shipdate AS DATE)) AS BIGINT) AS l_year,
           {sql_det_sum("l.l_extendedprice * (1 - l.l_discount)")} AS revenue
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
    WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
       OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
    GROUP BY n1.n_name, n2.n_name, year(CAST(l.l_shipdate AS DATE))
    """,
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: 6-table join with a disjunctive cross-dim filter.

    Supplier-side and customer-side nation lookups broadcast (25-row
    dimension); the enriched supplier/customer/order builds are
    SF-proportional, so they take size-aware hints
    (``io.broadcast_or_shuffle_hash``) — broadcast at bench SF,
    shuffle-hash joins co-partitioned on the fact keys at 100 TB. The
    nation-pair disjunction can only be applied once both sides are
    joined, but each side's IN-(two nations) implication is pushed to
    its dimension so lineitem meets orders already half-filtered.
    """
    two = ["NATION_3", "NATION_7"]
    n1 = _t(spark, sf_dir, "nation").filter(F.col("n_name").isin(two))
    n2 = _t(spark, sf_dir, "nation").filter(F.col("n_name").isin(two))
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    supp = s.join(F.broadcast(n1), s.s_nationkey == n1.n_nationkey).select(
        "s_suppkey", F.col("n_name").alias("supp_nation")
    )
    cust = c.join(F.broadcast(n2), c.c_nationkey == n2.n_nationkey).select(
        "c_custkey", F.col("n_name").alias("cust_nation")
    )
    ord_cust = o.join(_bosh(cust, c), o.o_custkey == cust.c_custkey).select(
        "o_orderkey", "cust_nation"
    )
    joined = (
        li.join(_bosh(supp, s), li.l_suppkey == supp.s_suppkey)
        .join(_bosh(ord_cust, o), li.l_orderkey == ord_cust.o_orderkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        joined.groupBy(
            "supp_nation",
            "cust_nation",
            F.year(F.col("l_shipdate").cast("date"))
            .cast("long")
            .alias("l_year"),
        )
        .agg(
            det_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
    )


@register(
    "tpch_q10_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, n.n_name AS nation,
           ROUND(c.c_acctbal, 2) AS acctbal,
           {sql_det_sum("l.l_extendedprice * (1 - l.l_discount)")} AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND CAST(o.o_orderdate AS DATE) >= DATE '1996-01-01'
      AND CAST(o.o_orderdate AS DATE) < DATE '1996-04-01'
    GROUP BY c.c_custkey, c.c_name, n.n_name, ROUND(c.c_acctbal, 2)
    """,
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: returned-item revenue per customer (wide group key).

    The group key carries the customer attributes (classic "group by PK,
    decorate with attrs") — at scale the cheaper plan is group by
    c_custkey alone then re-join the decoration, but Spark's partial
    aggregation makes the wide key equivalent here since custkey
    determines the rest.
    """
    od = F.col("o_orderdate").cast("date")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders").filter(
        (od >= F.lit("1996-01-01").cast("date"))
        & (od < F.lit("1996-04-01").cast("date"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    cust = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        "c_custkey", "c_name", F.col("n_name").alias("nation"), "c_acctbal"
    )
    return (
        li.join(_bosh(o, o), li.l_orderkey == o.o_orderkey)
        .join(_bosh(cust, c), o.o_custkey == cust.c_custkey)
        .groupBy(
            "c_custkey",
            "c_name",
            "nation",
            duck_round(F.col("c_acctbal"), 2).alias("acctbal"),
        )
        .agg(
            det_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
    )


@register(
    "tpch_q12_priority_by_linestatus",
    oracle="""
    SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE CAST(l.l_shipdate AS DATE) >= DATE '1997-01-01'
      AND CAST(l.l_shipdate AS DATE) < DATE '1998-01-01'
    GROUP BY l.l_linestatus
    """,
)
def tpch_q12_priority_by_linestatus(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q12 shape: join + conditional aggregation (CASE inside SUM).

    Adapted (no l_shipmode): groups by l_linestatus instead. The CASE
    counts compile to a single pass — two conditional partial sums per
    partition, no second scan; DuckDB's HUGEINT sum is cast back to
    BIGINT in the oracle to match Spark's long.
    """
    sd = F.col("l_shipdate").cast("date")
    li = _t(spark, sf_dir, "lineitem").filter(
        (sd >= F.lit("1997-01-01").cast("date"))
        & (sd < F.lit("1998-01-01").cast("date"))
    )
    o = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "tpch_q14_promo_revenue",
    oracle="""
    SELECT ROUND(
             100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                  THEN CAST(l.l_extendedprice * (1 - l.l_discount)
                            AS DECIMAL(27,10)) ELSE 0 END) AS DOUBLE)
             / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                             AS DECIMAL(27,10))) AS DOUBLE), 4)
           AS promo_revenue_pct
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE CAST(l.l_shipdate AS DATE) >= DATE '1996-09-01'
      AND CAST(l.l_shipdate AS DATE) < DATE '1996-10-01'
    """,
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo revenue share — ratio of two conditional sums.

    Both numerator and denominator accumulate in one aggregate over the
    same joined scan (decimal partials for order-independence); part
    broadcasts. The month filter prunes lineitem before the join.
    """
    sd = F.col("l_shipdate").cast("date")
    li = _t(spark, sf_dir, "lineitem").filter(
        (sd >= F.lit("1996-09-01").cast("date"))
        & (sd < F.lit("1996-10-01").cast("date"))
    )
    p = _t(spark, sf_dir, "part")
    disc = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC)
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(
        F.lit(0).cast(_DEC)
    )
    agg = li.join(_bosh(p, p), li.l_partkey == p.p_partkey).agg(
        F.sum(promo).cast("double").alias("_num"),
        F.sum(disc).cast("double").alias("_den"),
    )
    return agg.select(
        duck_round(100.0 * F.col("_num") / F.col("_den"), 4).alias(
            "promo_revenue_pct"
        )
    )


@register(
    "tpch_q16_supplier_part_counts",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM part p
    JOIN lineitem l ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#45'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                              WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def tpch_q16_supplier_part_counts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q16 shape: NOT-IN exclusion + exact COUNT(DISTINCT).

    Adapted (no partsupp): supplier-per-part pairs come from lineitem.
    The NOT IN compiles to a broadcast left-anti join (the exclusion
    list — suppliers in arrears — is tiny by construction; NOT IN with
    nulls would need null-aware anti join, avoided here since s_suppkey
    is a PK). COUNT(DISTINCT) is exact, expanded by Spark into a
    two-phase distinct-then-count; at 100 TB swap approx_count_distinct
    if ±2% is acceptable.
    """
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
    )
    li = _t(spark, sf_dir, "lineitem")
    bad_supp = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    pairs = li.join(
        _bosh(bad_supp, bad_supp),
        li.l_suppkey == bad_supp.s_suppkey,
        "left_anti",
    ).join(_bosh(p, p), li.l_partkey == p.p_partkey)
    return pairs.groupBy("p_brand", "p_type", "p_size").agg(
        F.countDistinct("l_suppkey").alias("supplier_cnt")
    )


@register(
    "tpch_q18_large_volume_customers",
    oracle=f"""
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           strftime(CAST(o.o_orderdate AS DATE), '%Y-%m-%d') AS orderdate,
           ROUND(o.o_totalprice, 2) AS totalprice,
           {sql_det_sum("l.l_quantity")} AS sum_qty
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING SUM(l_quantity) > 180
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey,
             strftime(CAST(o.o_orderdate AS DATE), '%Y-%m-%d'),
             ROUND(o.o_totalprice, 2)
    """,
)
def tpch_q18_large_volume_customers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q18: IN-subquery with HAVING → semi join on an aggregate.

    The big-order key set is an aggregate of lineitem itself; Spark
    evaluates it once and semi-joins orders against it. The final
    per-order quantity re-aggregates only surviving lines. Both
    aggregates are partial-agg friendly. All three build sides (the
    big-order key set, the surviving orders, the customer decoration)
    are SF-proportional, so every hint is size-aware
    (``io.broadcast_or_shuffle_hash``) — at 100 TB the key-set and
    customer joins become shuffle-hash on the join keys and AQE is
    free to re-promote genuinely small runtime sides to broadcast.
    """
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(_DEC)).alias("_q"))
        .filter(F.col("_q") > 180)
        .select(F.col("l_orderkey").alias("_big_key"))
    )
    o_big = o.join(
        _bosh(big, big), o.o_orderkey == F.col("_big_key"), "left_semi"
    )
    return (
        li.join(_bosh(o_big, o), li.l_orderkey == o_big.o_orderkey)
        .join(_bosh(c, c), F.col("o_custkey") == c.c_custkey)
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM-dd")
            .alias("orderdate"),
            duck_round(F.col("o_totalprice"), 2).alias("totalprice"),
        )
        .agg(det_sum("l_quantity").alias("sum_qty"))
    )


@register(
    "tpch_q19_disjunctive_predicates",
    oracle=f"""
    SELECT {sql_det_sum("l.l_extendedprice * (1 - l.l_discount)")} AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19_disjunctive_predicates(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q19: disjunction of conjunctive cross-table predicates.

    The optimizer extracts the common implications — p_brand IN (...),
    p_size BETWEEN 1 AND 15, l_quantity BETWEEN 1 AND 30 — and pushes
    them below the join (visible as PushedFilters on both scans), so
    the OR only evaluates on pre-filtered rows. part broadcasts.
    """
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    q = F.col("l_quantity")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & q.between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & q.between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & q.between(20, 30)
        )
    )
    return (
        li.join(_bosh(p, p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            det_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "tpch_q22_idle_rich_customers",
    oracle=f"""
    WITH avg_bal AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(27,10))) AS DOUBLE)
             / COUNT(c_acctbal) AS a
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT n.n_name AS nation,
           COUNT(*) AS numcust,
           {sql_det_sum("c.c_acctbal")} AS totacctbal
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE c.c_acctbal > (SELECT a FROM avg_bal)
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderpriority = '1-URGENT'
      )
    GROUP BY n.n_name
    """,
)
def tpch_q22_idle_rich_customers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q22 shape: scalar subquery + NOT EXISTS anti join.

    Adapted (no c_phone; every customer has orders): "above-average
    balance, no urgent orders" instead of the country-code filter. The
    scalar average is a 1-row aggregate cross-joined in (broadcast —
    never collected to the driver); NOT EXISTS is a left-anti join
    whose build side is pre-filtered to urgent orders only. The decimal
    accumulation in the scalar makes the threshold bit-identical across
    engines, so boundary rows agree.
    """
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast(_DEC)).cast("double")
                / F.count("c_acctbal")
            ).alias("_avg_bal")
        )
    )
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_custkey"
    )
    rich = c.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("_avg_bal")
    )
    idle_rich = rich.join(
        urgent, rich.c_custkey == urgent.o_custkey, "left_anti"
    )
    return (
        idle_rich.join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("numcust"),
            det_sum("c_acctbal").alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Second batch: the remaining classic shapes (Q2/Q8/Q9/Q13/Q15/Q17/Q20/Q21),
# adapted to the slimmed schema (no partsupp / commitdate / receiptdate):
# lineitem doubles as the supply catalog (unit cost = extendedprice/quantity),
# and Q21's "late" predicate becomes "returned".
# ---------------------------------------------------------------------------

from pyspark.sql import Window

from ..functions.rounding import _scaled_long, _sql_scaled_long


@register(
    "tpch_q2_min_cost_supplier",
    oracle="""
    WITH costs AS (
      SELECT l_partkey, l_suppkey,
             ROUND(l_extendedprice / l_quantity, 2) AS unit_cost
      FROM lineitem
    )
    SELECT DISTINCT s.s_name, ROUND(s.s_acctbal, 2) AS acctbal,
           n.n_name AS nation, p.p_partkey, p.p_name, c.unit_cost AS min_cost
    FROM part p
    JOIN costs c ON c.l_partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = c.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_size BETWEEN 10 AND 20 AND p.p_type = 'STANDARD'
      AND c.unit_cost = (SELECT MIN(ROUND(l2.l_extendedprice / l2.l_quantity, 2))
                         FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)
    """,
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated scalar MIN subquery → cheapest supplier.

    Adapted (no partsupp): lineitem is the supply catalog and unit cost
    is ``round(extendedprice/quantity, 2)`` (``duck_round`` keeps the
    equality comparison bit-identical across engines). The correlated
    MIN decorrelates into a window min over ``l_partkey`` — ONE shuffle
    of lineitem, no self-join re-scan — then dimension joins broadcast.
    At 100 TB the window and the final dedup both reuse the same
    hash-partitioning on partkey, so no extra exchange appears.
    """
    li = _t(spark, sf_dir, "lineitem")
    costs = li.select(
        "l_partkey",
        "l_suppkey",
        duck_round(F.col("l_extendedprice") / F.col("l_quantity"), 2).alias(
            "unit_cost"
        ),
    )
    w = Window.partitionBy("l_partkey")
    best = (
        costs.withColumn("min_cost", F.min("unit_cost").over(w))
        .filter(F.col("unit_cost") == F.col("min_cost"))
        .select("l_partkey", "l_suppkey", "min_cost")
    )
    p = _t(spark, sf_dir, "part").filter(
        F.col("p_size").between(10, 20) & (F.col("p_type") == "STANDARD")
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    return (
        best.join(_bosh(p, p), best.l_partkey == p.p_partkey)
        .join(_bosh(s, s), best.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            "s_name",
            duck_round(F.col("s_acctbal"), 2).alias("acctbal"),
            F.col("n_name").alias("nation"),
            "p_partkey",
            "p_name",
            "min_cost",
        )
        .distinct()
    )


@register(
    "tpch_q8_market_share",
    oracle="""
    WITH vol AS (
      SELECT CAST(year(CAST(o.o_orderdate AS DATE)) AS BIGINT) AS o_year,
             CAST(CASE WHEN l.l_extendedprice * (1 - l.l_discount) >= 0
                  THEN FLOOR(CAST(l.l_extendedprice * (1 - l.l_discount) AS DOUBLE) * 1e6 + 0.5)
                  ELSE CEIL(CAST(l.l_extendedprice * (1 - l.l_discount) AS DOUBLE) * 1e6 - 0.5)
                  END AS BIGINT) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n1.n_regionkey
      JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'STANDARD'
        AND CAST(o.o_orderdate AS DATE) BETWEEN DATE '1995-01-01'
                                            AND DATE '1996-12-31'
    )
    SELECT o_year,
           ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_2'
                               THEN volume ELSE 0 END) AS DOUBLE)
                 / CAST(SUM(volume) AS DOUBLE), 4) AS mkt_share
    FROM vol GROUP BY o_year
    """,
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: national market share — ratio of conditional sums per year.

    Eight-way join: the fixed-size dimensions (nation, region)
    broadcast hard; every SF-proportional build (region's customers,
    the two-year order slice, filtered part, supplier⋈nation) takes a
    size-aware hint (``io.broadcast_or_shuffle_hash``) — broadcast at
    bench SF, shuffle-hash on the fact keys at 100 TB, where AQE may
    still re-promote small runtime sides. The customer-side region
    filter prunes orders before they meet lineitem. Volumes accumulate
    as 1e-6-grid BIGINTs so the ratio is order-independent and
    hash-stable against DuckDB.
    """
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    s = _t(spark, sf_dir, "supplier")
    od = F.col("o_orderdate").cast("date")
    o = _t(spark, sf_dir, "orders").filter(
        od.between(F.lit("1995-01-01").cast("date"),
                   F.lit("1996-12-31").cast("date"))
    )
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation")
    n2 = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cust_region = (
        c.join(F.broadcast(n1), c.c_nationkey == n1.n_nationkey)
        .join(F.broadcast(r), n1.n_regionkey == r.r_regionkey)
        .select("c_custkey")
    )
    ord_in = o.join(
        _bosh(cust_region, c), o.o_custkey == cust_region.c_custkey
    ).select(
        "o_orderkey",
        F.year(od).cast("long").alias("o_year"),
    )
    supp_nat = s.join(F.broadcast(n2), s.s_nationkey == n2.n_nationkey).select(
        "s_suppkey", F.col("n_name").alias("supp_nation")
    )
    vol = _scaled_long(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    joined = (
        li.join(_bosh(p, p), li.l_partkey == p.p_partkey)
        .join(_bosh(supp_nat, s), li.l_suppkey == supp_nat.s_suppkey)
        .join(_bosh(ord_in, o), li.l_orderkey == ord_in.o_orderkey)
        .select("o_year", "supp_nation", vol.alias("volume"))
    )
    return joined.groupBy("o_year").agg(
        duck_round(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_2", F.col("volume"))
                .otherwise(F.lit(0))
            ).cast("double")
            / F.sum("volume").cast("double"),
            4,
        ).alias("mkt_share")
    )


@register(
    "tpch_q9_product_type_profit",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(year(CAST(o.o_orderdate AS DATE)) AS BIGINT) AS o_year,
           {sql_det_sum("l.l_extendedprice * (1 - l.l_discount) - 0.6 * p.p_retailprice * l.l_quantity")} AS sum_profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY n.n_name, year(CAST(o.o_orderdate AS DATE))
    """,
)
def tpch_q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and order year.

    Adapted (no partsupp): supply cost proxied as ``0.6 * p_retailprice *
    l_quantity``; the LIKE filter on p_name keeps Q9's
    non-sargable-dimension-predicate character (pushed to the part scan,
    prunes that build side). Every build here grows with SF — worst the
    ``ord_year`` projection of the ENTIRE orders table — so all three
    joins take size-aware hints (``io.broadcast_or_shuffle_hash``): at
    100 TB the lineitem⋈orders leg runs as a shuffle-hash join
    co-partitioned on orderkey instead of a tens-of-GB forced broadcast.
    lineitem then shuffles once to the (nation, year) aggregate; the
    arithmetic stays left-associated in both engines so the
    grid-rounded partials agree bit-for-bit.
    """
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders")
    supp_nat = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", F.col("n_name").alias("nation")
    )
    ord_year = o.select(
        "o_orderkey",
        F.year(F.col("o_orderdate").cast("date")).cast("long").alias("o_year"),
    )
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(_bosh(p, p), li.l_partkey == p.p_partkey)
        .join(_bosh(supp_nat, s), li.l_suppkey == supp_nat.s_suppkey)
        .join(_bosh(ord_year, ord_year), li.l_orderkey == ord_year.o_orderkey)
        .groupBy("nation", "o_year")
        .agg(det_sum(profit).alias("sum_profit"))
    )


@register(
    "tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                        AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    ) per_cust
    GROUP BY c_count
    """,
)
def tpch_q13_customer_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q13: order-count histogram via outer join with an ON-clause
    residual predicate.

    The priority filter must live in the join condition (a WHERE would
    drop zero-order customers — the whole point of the query). Spark
    pushes it to the orders scan because it references only the
    preserved-side-independent input. Two aggregations: per-customer
    count (shuffle on custkey — at scale this is the orders table's
    natural partitioning) then the tiny histogram re-aggregation.
    """
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (o.o_custkey == c.c_custkey)
            & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy(c.c_custkey)
        .agg(F.count(o.o_orderkey).alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "tpch_q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {sql_det_sum("l_extendedprice * (1 - l_discount)")} AS total_revenue
      FROM lineitem
      WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
        AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN revenue r ON r.supplier_no = s.s_suppkey
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: view + scalar MAX over the view (argmax without a sort).

    The revenue "view" materializes once; its global max is a 1-row
    aggregate broadcast back (never collected to the driver) and the
    equality filter picks the top supplier(s) — ties preserved, unlike
    LIMIT 1. Revenue values live on the deterministic 1e-6 grid so the
    float equality is safe cross-engine. At scale: one shuffle for the
    per-supplier aggregate; the max + filter are map-side over its
    output.
    """
    sd = F.col("l_shipdate").cast("date")
    li = _t(spark, sf_dir, "lineitem").filter(
        (sd >= F.lit("1996-01-01").cast("date"))
        & (sd < F.lit("1996-04-01").cast("date"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        det_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_revenue"
        )
    )
    top = revenue.agg(F.max("total_revenue").alias("_max_rev"))
    s = _t(spark, sf_dir, "supplier")
    return (
        revenue.crossJoin(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("_max_rev"))
        .join(_bosh(s, s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "tpch_q17_small_quantity_revenue",
    oracle=f"""
    SELECT ROUND({sql_det_sum("l.l_extendedprice")} / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#12'
      AND l.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                          FROM lineitem l2
                          WHERE l2.l_partkey = l.l_partkey)
    """,
)
def tpch_q17_small_quantity_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q17: correlated AVG threshold (small-order revenue).

    The correlated average decorrelates into a window AVG over
    ``l_partkey`` computed on the already-part-filtered lines — valid
    because the outer filter touches only part attributes, so the
    per-part line set is unchanged. Quantities are integer-valued
    doubles (exact, order-independent sums), making the 0.2×avg
    threshold bit-identical across engines. One lineitem shuffle (the
    window); the global sum is map-side partials only.
    """
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#12")
    joined = li.join(_bosh(p, p), li.l_partkey == p.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    w = Window.partitionBy("l_partkey")
    small = joined.withColumn("_avg_q", F.avg("l_quantity").over(w)).filter(
        F.col("l_quantity") < F.lit(0.2) * F.col("_avg_q")
    )
    total = small.agg(
        (F.sum(_scaled_long(F.col("l_extendedprice"))).cast("double") / F.lit(1e6)).alias("_s")
    )
    return total.select(
        duck_round(duck_round(F.col("_s"), 2) / F.lit(7.0), 2).alias(
            "avg_yearly"
        )
    )


@register(
    "tpch_q20_part_promotion_suppliers",
    oracle="""
    SELECT s.s_name, ROUND(s.s_acctbal, 2) AS acctbal
    FROM supplier s
    WHERE s.s_suppkey IN (
        SELECT l.l_suppkey
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_name LIKE 'small%'
          AND CAST(l.l_shipdate AS DATE) >= DATE '1996-01-01'
          AND CAST(l.l_shipdate AS DATE) < DATE '1997-01-01'
        GROUP BY l.l_suppkey
        HAVING SUM(l.l_quantity) > 300
      )
      AND s.s_nationkey IN (SELECT n_nationkey FROM nation
                            WHERE n_name IN ('NATION_1', 'NATION_4'))
    """,
)
def tpch_q20_part_promotion_suppliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q20 shape: nested IN over an aggregate-with-HAVING.

    Adapted (no partsupp): "shipped >300 units of small* parts in 1996"
    replaces the half-of-stock predicate. Both INs become left-semi
    joins; the inner aggregate's build side shrinks to qualifying
    suppliers before touching the supplier table. Quantity sums are
    integer-exact so the HAVING boundary is engine-stable.
    """
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_4")
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    sd = F.col("l_shipdate").cast("date")
    li = _t(spark, sf_dir, "lineitem").filter(
        (sd >= F.lit("1996-01-01").cast("date"))
        & (sd < F.lit("1997-01-01").cast("date"))
    )
    heavy = (
        li.join(_bosh(p, p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("_qty"))
        .filter(F.col("_qty") > 300)
        .select("l_suppkey")
    )
    return (
        # heavy's rows are a subset of distinct supplier keys, so the
        # honest size question is whether the supplier key set fits
        s.join(_bosh(heavy, s.select("s_suppkey")),
               s.s_suppkey == heavy.l_suppkey, "left_semi")
        .join(F.broadcast(n.select("n_nationkey")),
              s.s_nationkey == F.col("n_nationkey"), "left_semi")
        .select("s_name", duck_round(F.col("s_acctbal"), 2).alias("acctbal"))
    )


@register(
    "tpch_q21_waiting_suppliers",
    oracle="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND n.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s.s_name
    """,
)
def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: EXISTS + NOT-EXISTS self-joins on lineitem.

    Adapted (no receipt/commit dates): "the only supplier who returned
    lines in a finished multi-supplier order". The two correlated
    quantified predicates collapse into ONE per-order aggregate —
    distinct suppliers and distinct returning suppliers — instead of two
    self-joins: a qualifying l1 needs ``n_supp > 1`` (EXISTS another
    supplier) and ``n_ret_supp == 1`` (no OTHER returning supplier,
    since l1 itself returns). One extra lineitem shuffle total, versus
    two O(lineitem²)-risk self-joins; at 100 TB both paths partition on
    l_orderkey so AQE coalesces them into the same exchange.
    """
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")
    )
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    order_stats = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("_n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("_n_ret_supp"),
    )
    supp = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", "s_name"
    )
    okeys = o.select("o_orderkey")
    l1 = (
        li.filter(F.col("l_returnflag") == "R")
        .join(_bosh(okeys, okeys),
              li.l_orderkey == F.col("o_orderkey"), "left_semi")
        .join(_bosh(supp, s), li.l_suppkey == supp.s_suppkey)
    )
    return (
        l1.join(order_stats, "l_orderkey")
        .filter((F.col("_n_supp") > 1) & (F.col("_n_ret_supp") == 1))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


@register(
    "tpch_q11_important_stock",
    oracle=f"""
    WITH sup AS (
      SELECT s_suppkey FROM supplier s
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_7'
    ), grouped AS (
      SELECT l.l_partkey AS partkey,
             CAST(SUM({_sql_scaled_long('l.l_extendedprice * l.l_quantity')})
                  AS BIGINT) AS v_scaled
      FROM lineitem l JOIN sup ON sup.s_suppkey = l.l_suppkey
      GROUP BY l.l_partkey
    )
    SELECT partkey, ROUND(CAST(v_scaled AS DOUBLE) / 1e6, 2) AS part_value
    FROM grouped
    WHERE CAST(v_scaled AS DOUBLE) >
          0.001 * (SELECT CAST(SUM(v_scaled) AS DOUBLE) FROM grouped)
    """,
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: group sums HAVING > fraction of the global total.

    Adapted (no partsupp): lineitem doubles as the supply catalog, part
    value = sum(extendedprice * quantity) over one nation's suppliers
    (reference analog: the share-of-total gate in
    ``portfolio_app/app.py:285``'s percent-of-group transform, lifted to
    a global scalar subquery).

    Scale shape: the nation→supplier semi side broadcasts, lineitem
    shuffles ONCE to the per-partkey aggregate, and the global total is a
    second aggregation over that same grouped exchange — Spark's
    ReusedExchange dedups the subplan, so lineitem is scanned and
    shuffled exactly once; the one-row total then broadcast-cross-joins
    back. No partkey ever sits in a single-partition window.
    """
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    sup = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey"
    )
    li = _t(spark, sf_dir, "lineitem")
    grouped = (
        li.join(_bosh(sup, s), li.l_suppkey == sup.s_suppkey, "left_semi")
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(
            F.sum(
                _scaled_long(F.col("l_extendedprice") * F.col("l_quantity"))
            ).alias("v_scaled")
        )
    )
    total = grouped.agg(
        F.sum("v_scaled").cast("double").alias("_total_scaled")
    )
    return (
        grouped.crossJoin(F.broadcast(total))
        .filter(
            F.col("v_scaled").cast("double")
            > F.lit(0.001) * F.col("_total_scaled")
        )
        .select(
            "partkey",
            duck_round(F.col("v_scaled").cast("double") / F.lit(1e6), 2).alias(
                "part_value"
            ),
        )
    )
