"""Window-function and multi-dimensional aggregation coverage.

The reference's window-shaped computations are share-of-group and
median ordering (SURVEY.md §2.5, done in pandas there, as Spark windows
here — a11/a12). These queries widen the family to the full ranking /
offset / frame surface and to ROLLUP grouping sets, so a user of any
standard analytic SQL shape finds it covered and oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..functions.rounding import det_sum, duck_round, sql_det_sum
from ..registry import register

# lineitem carries duplicate (orderkey, linenumber) rows, so windows
# order by the full tuple — a total order keeps every function
# deterministic and both engines agree exactly.
_ORDER_COLS = ("l_linenumber", "l_partkey", "l_suppkey", "l_quantity")
_SQL_ORDER = ", ".join(_ORDER_COLS)


@register(
    "w01_ranking_offset_frames",
    oracle=f"""
    SELECT l_orderkey, l_linenumber, l_partkey,
           ROUND(l_quantity, 2) AS qty,
           row_number() OVER w AS rn,
           rank() OVER (PARTITION BY l_orderkey ORDER BY CAST(l_quantity AS DOUBLE) DESC) AS qty_rank,
           dense_rank() OVER (PARTITION BY l_orderkey ORDER BY CAST(l_quantity AS DOUBLE) DESC) AS qty_dense_rank,
           ROUND(lag(l_quantity) OVER w, 2) AS prev_qty,
           ROUND(lead(l_quantity) OVER w, 2) AS next_qty,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(27,10))) OVER (
             PARTITION BY l_orderkey ORDER BY {_SQL_ORDER}
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 2)
             AS running_qty,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(27,10))) OVER (
             PARTITION BY l_orderkey ORDER BY {_SQL_ORDER}
             ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS DOUBLE) / 3, 2)
             AS centered_avg3
    FROM lineitem
    WINDOW w AS (PARTITION BY l_orderkey ORDER BY {_SQL_ORDER})
    """,
)
def w01_ranking_offset_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking, offset, and frame windows in one pass.

    All seven functions share two window specs → Catalyst plans a single
    shuffle on ``l_orderkey`` and two in-partition sorts. The running
    and moving sums accumulate in DECIMAL so any partition layout gives
    identical doubles (the centered "avg" divides by the fixed frame
    width to stay exact at partition edges).
    """
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy(*_ORDER_COLS)
    w_qty = Window.partitionBy("l_orderkey").orderBy(
        F.col("l_quantity").cast("double").desc()
    )
    dec_qty = F.col("l_quantity").cast("decimal(27,10)")
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    centered = w.rowsBetween(-1, 1)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        duck_round("l_quantity", 2).alias("qty"),
        F.row_number().over(w).alias("rn"),
        F.rank().over(w_qty).alias("qty_rank"),
        F.dense_rank().over(w_qty).alias("qty_dense_rank"),
        duck_round(F.lag("l_quantity").over(w), 2).alias("prev_qty"),
        duck_round(F.lead("l_quantity").over(w), 2).alias("next_qty"),
        duck_round(F.sum(dec_qty).over(running).cast("double"), 2).alias(
            "running_qty"
        ),
        duck_round(
            F.sum(dec_qty).over(centered).cast("double") / 3, 2
        ).alias("centered_avg3"),
    )


@register(
    "a14_rollup_flag_status",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_rows,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(27,10))) AS DOUBLE), 2)
             AS sum_qty,
           CAST(grouping(l_returnflag) AS INT) AS g_flag,
           CAST(grouping(l_linestatus) AS INT) AS g_status
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def a14_rollup_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets: detail, per-flag subtotal, grand total.

    One expand-based aggregation pass (Spark rewrites rollup into an
    Expand + single hash aggregate — no extra scans). ``grouping()``
    flags disambiguate genuine NULL keys from subtotal rows, exactly as
    in ANSI SQL.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            duck_round(
                F.sum(F.col("l_quantity").cast("decimal(27,10)")).cast("double"), 2
            ).alias("sum_qty"),
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
        )
    )


@register(
    "a15_pivot_status_counts",
    oracle="""
    SELECT l_returnflag,
           COUNT(CASE WHEN l_linestatus = 'F' THEN 1 END) AS n_f,
           COUNT(CASE WHEN l_linestatus = 'O' THEN 1 END) AS n_o,
           COUNT(CASE WHEN l_linestatus = 'P' THEN 1 END) AS n_p,
           ROUND(CAST(SUM(CASE WHEN l_linestatus = 'F'
                               THEN CAST(l_quantity AS DECIMAL(27,10)) END)
                 AS DOUBLE), 2) AS qty_f
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def a15_pivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: line-status columns per return flag.

    ``pivot`` with an explicit value list compiles to conditional
    aggregates in a single pass (no extra scan per column, no distinct
    job for value discovery). Missing combinations yield NULL counts in
    Spark but 0 in SQL ``COUNT(CASE ...)`` — coalesced for parity.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O", "P"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(27,10)")).alias("q"),
        )
    )
    return p.select(
        "l_returnflag",
        F.coalesce(F.col("F_n"), F.lit(0)).alias("n_f"),
        F.coalesce(F.col("O_n"), F.lit(0)).alias("n_o"),
        F.coalesce(F.col("P_n"), F.lit(0)).alias("n_p"),
        duck_round(F.col("F_q").cast("double"), 2).alias("qty_f"),
    )


@register(
    "j04_semi_anti_join",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CAST(c.c_custkey IN (SELECT o_custkey FROM orders) AS INT)
             AS has_orders
    FROM customer c
    """,
)
def j04_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI + LEFT ANTI joins (existence tests without row fan-out).

    Semi/anti never duplicate the left side however many matches exist —
    the right side reduces to its distinct keys in the build, so the
    shuffle carries keys only. The oracle states the same predicate as
    an IN subquery, which DuckDB plans as the identical semi join.
    """
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    cond = F.col("c_custkey") == F.col("o_custkey")
    with_orders = c.join(o, cond, "left_semi").withColumn(
        "has_orders", F.lit(1)
    )
    without = c.join(o, cond, "left_anti").withColumn("has_orders", F.lit(0))
    return with_orders.unionByName(without)


@register(
    "a16_grouping_sets",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
           CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
           COUNT(*) AS n_orders,
           {sql_det_sum("o_totalprice")} AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderstatus), ())
    """,
)
def a16_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with GROUPING() indicator columns.

    Unlike ROLLUP (a14) the sets are hand-picked — the (priority-only)
    slice is deliberately absent. Spark expands the sets in ONE pass
    (Expand operator: each input row fans out once per set, partial
    aggregation absorbs the fan-out map-side), so the shuffle carries
    one partial row per (set, group) per partition — the same plan shape
    a 100 TB cube build wants. GROUPING() disambiguates real NULL keys
    from super-aggregate rows.
    """
    o = load_table(spark, sf_dir, "orders")
    return o.groupingSets(
        [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"], []],
        "o_orderstatus",
        "o_orderpriority",
    ).agg(
        F.grouping("o_orderstatus").cast("long").alias("g_status"),
        F.grouping("o_orderpriority").cast("long").alias("g_priority"),
        F.count("*").alias("n_orders"),
        det_sum("o_totalprice").alias("total_price"),
    )


@register(
    "w02_distribution_frames",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           ROUND(c_acctbal, 2) AS acctbal,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           ROUND(first_value(c_acctbal) OVER w, 2) AS seg_min_bal,
           ROUND(nth_value(c_acctbal, 3) OVER w, 2) AS seg_third_bal
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)
def w02_distribution_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: percent_rank / cume_dist / ntile /
    first_value / nth_value.

    The (acctbal, custkey) ordering is total, so ntile's tie placement
    and nth_value's default frame (up to current row) are deterministic
    and engine-identical. percent_rank and cume_dist stay raw doubles:
    both engines compute the same integer-ratio division, so the bits
    match without rounding. One shuffle on the segment key serves all
    five functions (same window spec).
    """
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        duck_round("c_acctbal", 2).alias("acctbal"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        duck_round(F.first("c_acctbal").over(w), 2).alias("seg_min_bal"),
        duck_round(
            F.nth_value("c_acctbal", 3).over(w), 2
        ).alias("seg_third_bal"),
    )


@register(
    "w03_range_frames",
    oracle=f"""
    SELECT user_id, event_id,
           strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS ts_s,
           ROUND(SUM(value) OVER (
             PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
           ), 2) AS rolling_1h_value,
           COUNT(*) OVER (
             PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
           ) AS rolling_1h_events
    FROM events
    """,
)
def w03_range_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based (RANGE) window frames: per-user 1-hour rolling sums.

    The time-series rolling aggregate: the frame is defined by the
    ordering VALUE (events within the last hour), not a row count, so
    ties and irregular sampling are handled correctly.
    ``Window.rangeBetween`` needs a numeric ordering key — the
    epoch-microsecond column stands in for the timestamp with -3600s
    expressed in the same unit. One shuffle on user_id; rows with equal
    timestamps share a frame on both engines.
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_s"),
        duck_round(F.sum("value").over(w), 2).alias("rolling_1h_value"),
        F.count("*").over(w).alias("rolling_1h_events"),
    )


@register(
    "a17_cube_type_status",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_rows,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(27,10))) AS DOUBLE), 2)
             AS sum_qty,
           CAST(grouping(l_returnflag) AS INT) AS g_flag,
           CAST(grouping(l_linestatus) AS INT) AS g_status
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def a17_cube_type_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 2^k grouping sets (detail, each margin, grand total).

    Completes the grouping-sets family next to ROLLUP (a14) and
    explicit GROUPING SETS (a16). Spark expands the cube in a single
    pass with map-side partials — one shuffle regardless of the number
    of sets; GROUPING() flags disambiguate real nulls from subtotal
    rows.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_rows"),
            duck_round(
                F.sum(F.col("l_quantity").cast("decimal(27,10)")).cast(
                    "double"
                ),
                2,
            ).alias("sum_qty"),
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
        )
    )
