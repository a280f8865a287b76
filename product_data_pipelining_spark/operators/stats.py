"""Statistical operators: group-wise top-k, deterministic moments, histograms.

Beyond-reference coverage (the reference's statistics stop at AVG /
MIN / MAX / exact percentiles — SURVEY.md §2.4); these are the shapes a
training-data curation pipeline leans on: heavy hitters per key,
correlation/dispersion profiling, and distribution histograms.

Cross-engine float determinism: Spark and DuckDB sum doubles in
different orders, so instead of comparing their ``corr``/``stddev``
built-ins (Welford-style merges, order-dependent at the ULP level) the
moment query accumulates *exact decimal* power sums — associative and
partition-layout-independent — and derives the statistics with one
identical double expression on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.rounding import duck_round
from ..io import load_table
from ..registry import register


@register(
    "a18_topk_per_group",
    oracle="""
    SELECT o_orderpriority, o_orderkey,
           ROUND(o_totalprice, 2) AS total_price, rn
    FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (
               PARTITION BY o_orderpriority
               ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def a18_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters: top-3 orders by value within each priority class.

    The canonical per-key top-k: ``row_number`` over (key, value desc)
    then ``rn <= k``. Catalyst plans one shuffle on the partition key
    and — because the rank filter is a window-group limit — pushes the
    top-k *into* the sort (WindowGroupLimit), so each partition keeps
    only k rows per key before and after the exchange; at 100 TB no
    executor ever materializes a full group. Ties are impossible in the
    ordering because ``o_orderkey`` completes a total order.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.select(
            "o_orderpriority",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("total_price"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


# x = l_extendedprice, y = l_quantity: positively correlated by
# construction (extendedprice ~ price * quantity). Inputs carry <= 2
# decimal places, so DECIMAL(12,2) is exact; products widen to scale 4
# and sums stay decimal — associative, no float until the finish.
_MOMENT_SQL = """
WITH sums AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS sx,
         SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sy,
         SUM(CAST(l_extendedprice AS DECIMAL(12,2))
             * CAST(l_extendedprice AS DECIMAL(12,2))) AS sxx,
         SUM(CAST(l_quantity AS DECIMAL(12,2))
             * CAST(l_quantity AS DECIMAL(12,2))) AS syy,
         SUM(CAST(l_extendedprice AS DECIMAL(12,2))
             * CAST(l_quantity AS DECIMAL(12,2))) AS sxy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
         AS price_qty_corr,
       ROUND(sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1))), 6)
         AS price_stddev
FROM sums
"""


@register("pr02_numeric_stats", oracle=_MOMENT_SQL)
def pr02_numeric_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group correlation and stddev from exact decimal power sums.

    One map-side-combined aggregation collects the five power sums per
    group (same shuffle profile as any group-agg: one exchange on the
    3-value key); the driver-free finishing ``select`` derives
    Pearson r and sample stddev with the textbook formulas. Because
    the sums are exact decimals and the finishing expression is the
    *same* double computation DuckDB runs, the results match bit-for-
    bit — distributed summation order never leaks into the output,
    which `F.corr`/`F.stddev` cannot promise across engines.

    Precision envelope: cross-engine *parity* holds at any scale (both
    engines cast the same exact decimal to double), but the finishing
    doubles lose absolute accuracy once a power sum exceeds 2^53
    (~9.0e15). With l_extendedprice <= ~1.1e5, sxx per group stays
    under 2^53 up to ~7e5 lineitem rows per flag (~SF 0.3 here since
    this generator is row-scaled); past that, derive the moments from
    per-partition-key partial sums (two-level aggregation) or switch
    the finish to DECIMAL(38) arithmetic before the final divide —
    the shuffle shape is unchanged either way.
    """
    li = load_table(spark, sf_dir, "lineitem")
    dx = F.col("l_extendedprice").cast("decimal(12,2)")
    dy = F.col("l_quantity").cast("decimal(12,2)")
    sums = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dx).alias("sx"),
        F.sum(dy).alias("sy"),
        F.sum(dx * dx).alias("sxx"),
        F.sum(dy * dy).alias("syy"),
        F.sum(dx * dy).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    var_x = nd * sxx - sx * sx
    var_y = nd * syy - sy * sy
    return sums.select(
        "l_returnflag",
        "n",
        duck_round(
            (nd * sxy - sx * sy) / (F.sqrt(var_x) * F.sqrt(var_y)), 6
        ).alias("price_qty_corr"),
        duck_round(F.sqrt(var_x / (nd * (nd - 1))), 6).alias("price_stddev"),
    )


_BUCKET_WIDTH = 60_000.0
_N_BUCKETS = 10


@register(
    "pr03_histogram",
    oracle=f"""
    SELECT LEAST(CAST(FLOOR(o_totalprice / {_BUCKET_WIDTH}) AS BIGINT),
                 {_N_BUCKETS - 1}) AS bucket,
           LEAST(CAST(FLOOR(o_totalprice / {_BUCKET_WIDTH}) AS BIGINT),
                 {_N_BUCKETS - 1}) * {_BUCKET_WIDTH} AS bucket_lo,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY 1, 2
    """,
)
def pr03_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram of order totals (10 buckets, clamped).

    Binning is a pure map expression (``floor(x / width)`` — one double
    division, deterministic across engines) so the whole histogram is a
    single map-side-combined count shuffle over at most ``_N_BUCKETS``
    keys; output size is O(buckets) regardless of input scale, the
    degenerate-skew-friendly shape (partial aggregation collapses each
    task's rows to <=10 before the exchange).
    """
    orders = load_table(spark, sf_dir, "orders")
    bucket = F.least(
        F.floor(F.col("o_totalprice") / F.lit(_BUCKET_WIDTH)).cast("bigint"),
        F.lit(_N_BUCKETS - 1),
    )
    return (
        orders.select(
            bucket.alias("bucket"),
            (bucket * F.lit(_BUCKET_WIDTH)).alias("bucket_lo"),
        )
        .groupBy("bucket", "bucket_lo")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "chk02_outlier_zscore",
    oracle="""
    WITH sums AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS sx,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                 * CAST(l_extendedprice AS DECIMAL(12,2))) AS sxx
      FROM lineitem GROUP BY l_returnflag
    ), params AS (
      SELECT l_returnflag,
             CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
             sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1))) AS sd
      FROM sums
    )
    SELECT l.l_returnflag,
           COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN abs(l.l_extendedprice - p.mean) > 2.5 * p.sd
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           ROUND(p.mean, 4) AS mean_price
    FROM lineitem l JOIN params p ON l.l_returnflag = p.l_returnflag
    GROUP BY l.l_returnflag, p.mean
    """,
)
def chk02_outlier_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit: per-group z-score outlier counts (|z| > 2.5).

    Two passes over the fact, zero passes over the driver: pass one
    collects the exact decimal power sums per group (pr02's pattern),
    pass two re-scans with the group's (mean, sd) joined back in — a
    3-row broadcast, so the audit costs one map-side-combined count at
    any scale. The mean/sd derivation repeats the identical double
    expression on both engines, keeping the boundary predicate
    ``|x - mean| > 2.5 sd`` bit-deterministic, so even a row sitting
    exactly on the threshold classifies the same way in both engines.
    Same 2^53 accuracy envelope as pr02 (see its docstring): parity is
    scale-free, absolute accuracy of mean/sd needs sxx < 2^53.
    """
    li = load_table(spark, sf_dir, "lineitem")
    dx = F.col("l_extendedprice").cast("decimal(12,2)")
    sums = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dx).alias("sx"),
        F.sum(dx * dx).alias("sxx"),
    )
    nd = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sxx = F.col("sxx").cast("double")
    params = sums.select(
        F.col("l_returnflag").alias("p_flag"),
        (sx / nd).alias("mean"),
        F.sqrt((nd * sxx - sx * sx) / (nd * (nd - 1))).alias("sd"),
    )
    outlier = F.abs(F.col("l_extendedprice") - F.col("mean")) > 2.5 * F.col("sd")
    return (
        li.join(F.broadcast(params), li.l_returnflag == F.col("p_flag"))
        .groupBy("l_returnflag", "mean")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(outlier, 1).otherwise(0)).alias("n_outliers"),
        )
        .select(
            "l_returnflag",
            "n_rows",
            "n_outliers",
            duck_round("mean", 4).alias("mean_price"),
        )
    )


@register(
    "a19_argmax_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey AS top_orderkey,
           ROUND(o_totalprice, 2) AS top_price
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
      FROM orders
    ) WHERE rn = 1
    """,
)
def a19_argmax_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arg-max per key as an aggregate: each customer's priciest order.

    The k=1 specialization of a18 deserves its own plan: ``max`` over a
    ``struct(value, key)`` is an ordinary partial-combinable aggregate —
    lexicographic max merges associatively — so the whole query is one
    map-side-combined exchange with no sort, no window, and per-task
    state of one struct per key. For "latest record per key" /
    "winner per key" at 100 TB this beats the window formulation: the
    shuffle carries one candidate per (task, key) instead of every row.
    The trailing ``o_orderkey`` in the struct makes ties deterministic
    (largest key wins, mirrored in the oracle's DESC tiebreak).
    """
    orders = load_table(spark, sf_dir, "orders")
    m = F.max(F.struct("o_totalprice", "o_orderkey")).alias("m")
    return (
        orders.groupBy("o_custkey")
        .agg(m)
        .select(
            "o_custkey",
            F.col("m.o_orderkey").alias("top_orderkey"),
            F.round("m.o_totalprice", 2).alias("top_price"),
        )
    )


@register(
    "pr04_winsorize",
    oracle="""
    WITH thresholds AS (
      SELECT l_returnflag,
             ROUND(quantile_cont(l_extendedprice, 0.05), 2) AS lo,
             ROUND(quantile_cont(l_extendedprice, 0.95), 2) AS hi
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_returnflag,
           COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN l.l_extendedprice < t.lo THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clamped_low,
           CAST(SUM(CASE WHEN l.l_extendedprice > t.hi THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clamped_high,
           ROUND(CAST(CAST(SUM(CAST(CASE
               WHEN CASE WHEN l.l_extendedprice < t.lo THEN t.lo
                         WHEN l.l_extendedprice > t.hi THEN t.hi
                         ELSE l.l_extendedprice END >= 0
               THEN FLOOR(CAST(CASE WHEN l.l_extendedprice < t.lo THEN t.lo
                                    WHEN l.l_extendedprice > t.hi THEN t.hi
                                    ELSE l.l_extendedprice END AS DOUBLE)
                          * 1e6 + 0.5)
               ELSE CEIL(CAST(CASE WHEN l.l_extendedprice < t.lo THEN t.lo
                                   WHEN l.l_extendedprice > t.hi THEN t.hi
                                   ELSE l.l_extendedprice END AS DOUBLE)
                         * 1e6 - 0.5) END AS BIGINT)) AS BIGINT) AS DOUBLE)
             / 1e6 / COUNT(*), 2) AS winsorized_avg
    FROM lineitem l JOIN thresholds t ON l.l_returnflag = t.l_returnflag
    GROUP BY l.l_returnflag
    """,
)
def pr04_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization: clamp each group's tail values at exact p05/p95.

    Outlier capping the way feature pipelines apply it before training:
    pass one computes exact interpolated percentiles per group (a03's
    hardest-parity machinery, rounded onto the money grid so both
    engines hold identical thresholds); pass two re-scans with the
    3-row threshold table broadcast and clamps map-side, re-aggregating
    with the deterministic scaled-integer average. Same two-pass
    broadcast-back shape as chk02 — O(groups) driver-free state, two
    map-side-combined exchanges at any scale.
    """
    from ..functions.rounding import det_avg, duck_round

    li = load_table(spark, sf_dir, "lineitem")
    thresholds = li.groupBy(F.col("l_returnflag").alias("t_flag")).agg(
        duck_round(F.percentile("l_extendedprice", F.lit(0.05)), 2).alias("lo"),
        duck_round(F.percentile("l_extendedprice", F.lit(0.95)), 2).alias("hi"),
    )
    x = F.col("l_extendedprice")
    clamped = (
        F.when(x < F.col("lo"), F.col("lo"))
        .when(x > F.col("hi"), F.col("hi"))
        .otherwise(x)
    )
    return (
        li.join(F.broadcast(thresholds), li.l_returnflag == F.col("t_flag"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(x < F.col("lo"), 1).otherwise(0)).alias(
                "n_clamped_low"
            ),
            F.sum(F.when(x > F.col("hi"), 1).otherwise(0)).alias(
                "n_clamped_high"
            ),
            det_avg(clamped).alias("winsorized_avg"),
        )
    )


@register("a20_hll_sketch_rollup", oracle=None)  # sketch estimates are
# implementation-defined within the HLL error bound, so no engine-exact
# SQL oracle; tests/test_plans.py pins the estimates against exact
# countDistinct with the lgConfigK=12 relative-error contract (~1.6% rsd)
def a20_hll_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketch pre-aggregation: weekly sketches → rollups.

    The 100 TB distinct-count pattern: COUNT(DISTINCT user) over a year
    re-scans a year of raw events for every query, while a per-(type,
    week) Datasketches HLL sketch is built ONCE in the weekly load (one
    map-side-combinable pass, O(2^lgK) bytes of state per group), and
    any coarser rollup — monthly, yearly, all-time, cross-type — is a
    sketch UNION over output-sized rows, never a raw re-scan. This
    query materializes the weekly tier and rolls it to per-type totals;
    the same ``hll_union_agg`` would serve any other grain. Estimates
    are exact-comparable across engines running the same Datasketches
    build but not SQL-reproducible in DuckDB, hence the pytest error
    contract instead of a value oracle.
    """
    ev = load_table(spark, sf_dir, "events")
    weekly = ev.groupBy(
        "event_type",
        F.date_trunc("week", F.col("ts")).cast("date").alias("week"),
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    return (
        weekly.groupBy("event_type")
        .agg(
            F.count("*").alias("n_weeks"),
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias(
                "est_distinct_users"
            ),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# pr05: full pairwise correlation matrix over the numeric lineitem
# measures — the profiling surface pandas users know as df.corr(),
# computed from ONE exact-decimal power-sum aggregation (pr02's
# determinism contract, widened from a single hand-picked pair to
# every pair).

_PR05_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
_PR05_PAIRS = [
    (a, b)
    for i, a in enumerate(_PR05_COLS)
    for b in _PR05_COLS[i + 1 :]
]


def _pr05_oracle() -> str:
    sums = ",\n         ".join(
        [f"SUM(CAST({c} AS DECIMAL(12,2))) AS s_{c}" for c in _PR05_COLS]
        + [
            f"SUM(CAST({a} AS DECIMAL(12,2)) * CAST({b} AS DECIMAL(12,2)))"
            f" AS s_{a}_{b}"
            for a in _PR05_COLS
            for b in _PR05_COLS
            if a <= b
        ]
    )
    def corr(a: str, b: str) -> str:
        n = "CAST(n AS DOUBLE)"
        sx, sy = f"CAST(s_{a} AS DOUBLE)", f"CAST(s_{b} AS DOUBLE)"
        sxx, syy = f"CAST(s_{a}_{a} AS DOUBLE)", f"CAST(s_{b}_{b} AS DOUBLE)"
        key = f"s_{a}_{b}" if a <= b else f"s_{b}_{a}"
        sxy = f"CAST({key} AS DOUBLE)"
        return (
            f"ROUND(({n} * {sxy} - {sx} * {sy})"
            f" / (sqrt({n} * {sxx} - {sx} * {sx})"
            f" * sqrt({n} * {syy} - {sy} * {sy})), 6)"
        )

    arms = "\nUNION ALL\n".join(
        f"SELECT '{a}' AS col_x, '{b}' AS col_y, n, {corr(a, b)} AS corr"
        " FROM sums"
        for a, b in _PR05_PAIRS
    )
    return f"""
    WITH sums AS (
      SELECT COUNT(*) AS n,
         {sums}
      FROM lineitem
    )
    {arms}
    """


@register("pr05_correlation_matrix", oracle=_pr05_oracle())
def pr05_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson matrix (unpivoted) over the lineitem measures.

    One map-side-combined global aggregation collects every power sum
    (4 sums, 4 sums-of-squares, 6 cross sums, all exact DECIMAL — the
    associative, order-independent representation), then the one-row
    result explodes into the 6 (col_x, col_y, corr) pairs with the
    textbook finish in doubles. Identical finishing arithmetic on both
    engines means bit-for-bit parity, which ``F.corr`` (a float
    accumulator whose result depends on partition merge order) cannot
    promise. Scale shape: a single exchange of ~15 decimal cells —
    the corpus streams through the partial aggregate once; adding
    columns grows the aggregate width quadratically but never adds a
    shuffle or a pass.
    """
    li = load_table(spark, sf_dir, "lineitem")
    dec = {c: F.col(c).cast("decimal(12,2)") for c in _PR05_COLS}
    aggs = [F.count(F.lit(1)).alias("n")]
    aggs += [F.sum(dec[c]).alias(f"s_{c}") for c in _PR05_COLS]
    aggs += [
        F.sum(dec[a] * dec[b]).alias(f"s_{a}_{b}")
        for a in _PR05_COLS
        for b in _PR05_COLS
        if a <= b
    ]
    sums = li.agg(*aggs)

    def corr(a: str, b: str):
        n = F.col("n").cast("double")
        sx, sy = F.col(f"s_{a}").cast("double"), F.col(f"s_{b}").cast("double")
        sxx = F.col(f"s_{a}_{a}").cast("double")
        syy = F.col(f"s_{b}_{b}").cast("double")
        key = f"s_{a}_{b}" if a <= b else f"s_{b}_{a}"
        sxy = F.col(key).cast("double")
        return duck_round(
            (n * sxy - sx * sy)
            / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)),
            6,
        )

    pairs = F.array(
        *[
            F.struct(
                F.lit(a).alias("col_x"),
                F.lit(b).alias("col_y"),
                F.col("n").alias("n"),
                corr(a, b).alias("corr"),
            )
            for a, b in _PR05_PAIRS
        ]
    )
    return sums.select(F.explode(pairs).alias("p")).select(
        "p.col_x", "p.col_y", "p.n", "p.corr"
    )


# ---------------------------------------------------------------------------
# a21: theta-sketch audience overlap — the SET-ALGEBRA sketch tier.
# a20's HLL answers "how many distinct", but HLL cannot intersect; a
# Datasketches THETA sketch supports union/intersection/difference, so
# per-segment sketches built once answer every pairwise overlap
# question ("users who did BOTH purchase AND refund") from
# output-sized rows, never a raw re-scan per pair.


@register("a21_theta_audience_overlap", oracle=None)  # sketch estimates
# are implementation-defined within the theta error envelope; the
# contract vs exact pairwise intersections is pinned in test_plans.py
def a21_theta_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise distinct-user overlap between event types via theta.

    One pass over raw events builds a theta sketch of user_id per
    event_type (map-side-combinable, bounded state per group — the
    same shuffle shape as any group-agg). The pairwise stage then
    operates ONLY on the per-type sketch table (|types|^2 rows, bytes
    each): intersection estimates the co-audience, union feeds the
    Jaccard denominator. At 100 TB the sketch table is thousands of
    rows against terabytes of raw events, and any new segment-overlap
    question is answered without touching the raw table again —
    exactly the mergeability win a20 documents for counts, extended
    to set algebra HLL cannot express.
    """
    from ..io import load_events

    ev = load_events(spark, sf_dir)
    sk = ev.groupBy("event_type").agg(
        F.theta_sketch_agg("user_id").alias("sk"),
        F.countDistinct("user_id").alias("n_exact"),
    )
    a, b = sk.alias("a"), sk.alias("b")
    pairs = a.join(b, F.col("a.event_type") < F.col("b.event_type"))
    inter = F.theta_sketch_estimate(
        F.theta_intersection(F.col("a.sk"), F.col("b.sk"))
    )
    union = F.theta_sketch_estimate(
        F.theta_union(F.col("a.sk"), F.col("b.sk"))
    )
    return pairs.select(
        F.col("a.event_type").alias("type_a"),
        F.col("b.event_type").alias("type_b"),
        inter.alias("est_overlap"),
        union.alias("est_union"),
        duck_round(
            inter.cast("double") / union.cast("double"), 4
        ).alias("est_jaccard"),
    ).orderBy("type_a", "type_b")


# ---------------------------------------------------------------------------
# a22: KLL quantile-sketch rollup — the mergeable-quantiles tier that
# completes the Datasketches trio (a20 HLL counts, a21 theta sets,
# here KLL distributions). Exact percentiles (a03) sort n log n per
# query; a per-(flag, month) KLL sketch is built once and ANY coarser
# grain's quantiles come from merging output-sized sketch rows.

_KLL_K = 1024  # sketch size: ~1.3% worst-case rank error at this k


@register("a22_kll_quantile_rollup", oracle=None)  # sketch estimates
# are implementation-defined within the KLL rank-error bound; the
# contract vs exact per-flag percentiles is pinned in test_plans.py
def a22_kll_quantile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly KLL sketches of l_extendedprice → per-flag quantiles.

    The 100 TB distribution-serving pattern: the monthly load appends
    one (flag, month) KLL sketch row (map-side-combinable, O(k log n)
    state), and dashboards answer any quantile at any grain by merging
    sketches — never re-sorting raw rows. This query materializes the
    monthly tier and rolls it to per-flag p25/p50/p75/p95; the same
    ``kll_sketch_merge_double`` serves yearly or global grains from
    the identical rows. Rank error is bounded by the sketch parameter
    (k=1024 → ~1.3%), asserted against exact sort-based percentiles
    in tests; estimates are not SQL-reproducible in DuckDB, hence
    rows-only.
    """
    li = load_table(spark, sf_dir, "lineitem")
    monthly = li.groupBy(
        "l_returnflag",
        F.date_trunc("month", F.col("l_shipdate")).cast("date").alias("month"),
    ).agg(
        F.kll_sketch_agg_double("l_extendedprice", F.lit(_KLL_K)).alias("sk")
    )
    # kll_sketch_merge_double is a binary scalar (no aggregate form in
    # Spark 4.1), so the rollup collects the per-flag sketch list —
    # bounded at |months| rows of ~k doubles each — and folds it with
    # the HOF reduce; still one exchange, still output-sized state.
    merged = (
        monthly.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_months"),
            F.collect_list("sk").alias("sks"),
        )
        .select(
            "l_returnflag",
            "n_months",
            F.reduce(
                F.slice(F.col("sks"), 2, F.size("sks") - 1),
                F.element_at(F.col("sks"), 1),
                lambda acc, x: F.kll_sketch_merge_double(acc, x),
            ).alias("sk"),
        )
    )
    q = lambda p: F.kll_sketch_get_quantile_double(F.col("sk"), F.lit(p))
    return merged.select(
        "l_returnflag",
        "n_months",
        q(0.25).alias("est_p25"),
        q(0.50).alias("est_p50"),
        q(0.75).alias("est_p75"),
        q(0.95).alias("est_p95"),
    ).orderBy("l_returnflag")


# ---------------------------------------------------------------------------
# chk03: robust outlier audit — the median/MAD twin of chk02. Mean/std
# z-scores (chk02) are themselves dragged by the outliers they hunt;
# the modified z-score 0.6745*(x - median)/MAD (Iglewicz & Hoaglin
# 1993) keeps its calibration under heavy tails, the standard audit
# for skewed pipeline metrics.

CHK03_CUT = 3.5  # Iglewicz-Hoaglin recommended modified-z threshold


@register(
    "chk03_outlier_robust_mad",
    oracle=f"""
    WITH med AS (
      SELECT l_returnflag,
             quantile_cont(l_extendedprice, 0.5) AS med
      FROM lineitem GROUP BY l_returnflag
    ),
    mad AS (
      SELECT l.l_returnflag,
             quantile_cont(abs(l.l_extendedprice - m.med), 0.5) AS mad
      FROM lineitem l JOIN med m ON l.l_returnflag = m.l_returnflag
      GROUP BY l.l_returnflag
    )
    SELECT l.l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN abs(0.6745 * (l.l_extendedprice - m.med)
                                  / d.mad) > {CHK03_CUT}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           ROUND(m.med, 2) AS median_price,
           ROUND(d.mad, 2) AS mad_price
    FROM lineitem l
    JOIN med m ON l.l_returnflag = m.l_returnflag
    JOIN mad d ON l.l_returnflag = d.l_returnflag
    GROUP BY l.l_returnflag, m.med, d.mad
    """,
)
def chk03_outlier_robust_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modified-z outlier counts per flag from exact median + MAD.

    Two exact-percentile passes (median, then median absolute
    deviation) and one counting re-scan — each a single exchange,
    with the 3-row parameter frames broadcast back onto the fact
    scan, the same replication pattern chk02/pr04 document. Exact
    interpolated percentiles carry the a03 cross-engine parity
    contract, so the flagged counts are deterministic; at 100 TB the
    two percentile passes swap to the KLL sketch tier (a22) with the
    re-scan unchanged.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    med = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("med")
    )
    mad = (
        li.join(F.broadcast(med), "l_returnflag")
        .groupBy("l_returnflag", "med")  # med is constant per flag
        .agg(
            F.expr(
                "percentile(abs(l_extendedprice - med), 0.5)"
            ).alias("mad")
        )
        .select("l_returnflag", "mad")
    )
    rz = F.abs(
        F.lit(0.6745)
        * (F.col("l_extendedprice") - F.col("med"))
        / F.col("mad")
    )
    return (
        li.join(F.broadcast(med), "l_returnflag")
        .join(F.broadcast(mad), "l_returnflag")
        .groupBy("l_returnflag", "med", "mad")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                F.when(rz > CHK03_CUT, 1).otherwise(0)
            ).cast("long").alias("n_outliers"),
        )
        .select(
            "l_returnflag",
            "n_rows",
            "n_outliers",
            duck_round(F.col("med"), 2).alias("median_price"),
            duck_round(F.col("mad"), 2).alias("mad_price"),
        )
    )


# a23: count-min sketch — the frequency member of the sketch tier.
# Width deliberately small relative to the key space so the fixture
# actually exercises collisions (the CM guarantee est >= exact with
# bounded overcount is only visible when cells are shared).
CM_D = 4  # hash rows
CM_W = 256  # counters per row


def _sql_cm_cell(d_expr: str, key_expr: str) -> str:
    """DuckDB twin of the CM cell index: md5-derived row hash mod width."""
    return (
        f"CAST('0x' || substr(md5(CAST({d_expr} AS VARCHAR) || '|' || "
        f"CAST({key_expr} AS VARCHAR)), 1, 8) AS BIGINT) % {CM_W}"
    )


@register(
    "a23_countmin_frequency",
    oracle=f"""
    WITH ex AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact_cnt
      FROM events GROUP BY user_id
    ),
    cells AS (
      SELECT d, CAST({_sql_cm_cell("d", "user_id")} AS BIGINT) AS w,
             exact_cnt, user_id
      FROM ex, unnest([{", ".join(map(str, range(CM_D)))}]) AS t(d)
    ),
    sk AS (
      SELECT d, w, CAST(SUM(exact_cnt) AS BIGINT) AS c
      FROM cells GROUP BY d, w
    ),
    est AS (
      SELECT user_id, MIN(sk.c) AS cm_estimate
      FROM cells JOIN sk USING (d, w) GROUP BY user_id
    )
    SELECT ex.user_id, ex.exact_cnt, est.cm_estimate,
           est.cm_estimate - ex.exact_cnt AS overcount
    FROM ex JOIN est USING (user_id)
    """,
)
def a23_countmin_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimates, audited against exact counts.

    Completes the sketch tier (a20 HLL cardinality / a21 theta set
    algebra / a22 KLL quantiles) with the frequency sketch: ``CM_D``
    md5-derived hash rows of ``CM_W`` counters each; every key adds its
    count to one cell per row, a point estimate reads the MINIMUM of
    its cells. Unlike the other sketches this one is fully
    SQL-expressible (the sketch IS a (d, w) -> sum table), so the whole
    pipeline — build, query, and the overcount audit — carries a value
    oracle. The classic guarantee (estimate >= exact, overcount
    <= eps * N with prob 1 - delta) is pytest-pinned; the fixture's
    key space (~150 users into 256 counters) forces real collisions so
    ``overcount`` is visibly non-zero.

    Scale shape: exact per-key counts first (ONE map-side-combined
    groupBy — at 100 TB this is the same shuffle any frequency query
    pays), then everything downstream is sketch-sized: the (d x w)
    counter table is 1024 rows REGARDLESS of corpus size, broadcast
    back to the key set for the min-of-cells read. Sketches from
    disjoint corpus shards merge by cell-wise addition (same groupBy),
    which is the production reason to carry one.
    """
    ev = load_table(spark, sf_dir, "events")
    ex = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_cnt"))
    ds = F.explode(F.array(*[F.lit(i) for i in range(CM_D)])).alias("d")
    cells = ex.select("user_id", "exact_cnt", ds).withColumn(
        "w",
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("d").cast("string"),
                        F.lit("|"),
                        F.col("user_id").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % CM_W,
    )
    sk = cells.groupBy("d", "w").agg(F.sum("exact_cnt").alias("c"))
    est = (
        cells.select("user_id", "d", "w")
        .join(F.broadcast(sk), ["d", "w"])
        .groupBy("user_id")
        .agg(F.min("c").alias("cm_estimate"))
    )
    return ex.join(est, "user_id").select(
        "user_id",
        "exact_cnt",
        "cm_estimate",
        (F.col("cm_estimate") - F.col("exact_cnt")).alias("overcount"),
    )


# chk05: PSI drift — fixed-width price bins; domain chosen from the
# generator's o_totalprice envelope (~1e3 .. 5e5).
PSI_BIN_W = 25_000.0
PSI_NB = 20
PSI_BIN_ALERT = 0.005  # per-bin contribution worth surfacing


@register(
    "chk05_distribution_drift",
    oracle=f"""
    WITH snap_a AS (
      SELECT o_totalprice AS p FROM orders WHERE o_orderkey % 10 <> 3
    ),
    snap_b AS (
      SELECT CASE WHEN o_orderkey % 10 IN (5, 6)
                  THEN o_totalprice * 1.2 ELSE o_totalprice END AS p
      FROM orders WHERE o_orderkey % 10 <> 7
    ),
    ca AS (
      SELECT LEAST(CAST(FLOOR(p / {PSI_BIN_W}) AS BIGINT), {PSI_NB - 1})
               AS bin, CAST(COUNT(*) AS BIGINT) AS c
      FROM snap_a GROUP BY 1
    ),
    cb AS (
      SELECT LEAST(CAST(FLOOR(p / {PSI_BIN_W}) AS BIGINT), {PSI_NB - 1})
               AS bin, CAST(COUNT(*) AS BIGINT) AS c
      FROM snap_b GROUP BY 1
    ),
    ta AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM ca),
    tb AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM cb),
    spine AS (SELECT unnest(range({PSI_NB})) AS bin),
    j AS (
      SELECT spine.bin,
             COALESCE(ca.c, 0) AS c_a, COALESCE(cb.c, 0) AS c_b,
             (CAST(COALESCE(ca.c, 0) AS DOUBLE) + 1)
               / (ta.t + {PSI_NB}) AS pa,
             (CAST(COALESCE(cb.c, 0) AS DOUBLE) + 1)
               / (tb.t + {PSI_NB}) AS pb
      FROM spine LEFT JOIN ca USING (bin) LEFT JOIN cb USING (bin), ta, tb
    )
    SELECT bin, c_a, c_b,
           ROUND((pa - pb) * ln(pa / pb), 6) AS psi_contrib,
           ROUND((pa - pb) * ln(pa / pb), 6) >= {PSI_BIN_ALERT} AS drifted
    FROM j
    """,
)
def chk05_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between two snapshots, per bin.

    The distribution-drift monitor a feature pipeline runs between
    yesterday's and today's landing: histogram both snapshots into
    fixed-width bins, Laplace-smooth ((c+1)/(N+NB), so empty bins are
    well-defined without eps hacks), and report each bin's PSI
    contribution (p_a - p_b) * ln(p_a / p_b). Total PSI is the SUM of
    this column (the usual read: < 0.1 stable, > 0.25 action);
    per-bin rows localize WHICH part of the range moved, which the
    scalar can't. Snapshots derive deterministically from one fixture
    (chk04's membership trick, plus a +20% price shift on two key
    classes) so both engines see identical drift.

    Determinism: bin counts are exact integers on a fixed spine
    (every bin present via the generated spine, zero-filled); the
    smoothed p's and the ln are single identical double expressions
    from those integers on both sides.

    Scale shape: two map-side-combined histogram aggregations (the
    only passes over data), then everything is NB-sized: spine join,
    totals broadcast, one final projection. At 100 TB the histogram
    shuffle carries NB rows per task — nothing scales with the
    corpus but the scans.
    """
    o = load_table(spark, sf_dir, "orders")
    mod = F.col("o_orderkey") % 10

    def binned(df):
        b = F.least(
            F.floor(F.col("p") / PSI_BIN_W).cast("long"),
            F.lit(PSI_NB - 1),
        )
        return df.groupBy(b.alias("bin")).agg(F.count(F.lit(1)).alias("c"))

    ca = binned(o.filter(mod != 3).select(F.col("o_totalprice").alias("p")))
    cb = binned(
        o.filter(mod != 7).select(
            F.when(mod.isin(5, 6), F.col("o_totalprice") * 1.2)
            .otherwise(F.col("o_totalprice"))
            .alias("p")
        )
    )
    ta = ca.agg(F.sum("c").alias("t_a"))
    tb = cb.agg(F.sum("c").alias("t_b"))
    spine = spark.range(PSI_NB).select(F.col("id").alias("bin"))
    j = (
        spine.join(F.broadcast(ca.withColumnRenamed("c", "ca")), "bin", "left")
        .join(F.broadcast(cb.withColumnRenamed("c", "cb")), "bin", "left")
        .crossJoin(F.broadcast(ta))
        .crossJoin(F.broadcast(tb))
    )
    pa = (F.coalesce(F.col("ca"), F.lit(0)).cast("double") + 1) / (
        F.col("t_a") + PSI_NB
    )
    pb = (F.coalesce(F.col("cb"), F.lit(0)).cast("double") + 1) / (
        F.col("t_b") + PSI_NB
    )
    contrib = duck_round((pa - pb) * F.log(pa / pb), 6)
    return j.select(
        "bin",
        F.coalesce(F.col("ca"), F.lit(0)).alias("c_a"),
        F.coalesce(F.col("cb"), F.lit(0)).alias("c_b"),
        contrib.alias("psi_contrib"),
        (contrib >= PSI_BIN_ALERT).alias("drifted"),
    )
