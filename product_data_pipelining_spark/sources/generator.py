"""Distributed deterministic data generation (dbgen/dsdgen-style).

The fixture generator (``synthetic.py``) builds the small oracle
fixtures driver-side; THIS module generates arbitrarily large
reference-shaped tables *on the cluster*: every column is a pure
function of the row id via 64-bit hashing, evaluated inside
whole-stage codegen from ``spark.range`` splits.

Properties the tests pin:

- **Deterministic**: same (n_rows, seed) → the same multiset of rows,
  regardless of partition count, cluster size, or engine version —
  no ``rand()``, whose draw order is partition-dependent.
- **Shuffle-free**: the plan is Range → Project (→ per-order explode
  for line items); generating 100 TB is embarrassingly parallel and
  writes directly to partitioned parquet, no exchange anywhere.
- **Scale-free skew**: value distributions come from modular hashing,
  so relative frequencies hold at any size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_PRIORITIES = ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
_STATUSES = ("O", "F", "P")
_FLAGS = ("N", "R", "A")
_VOCAB = (
    "key", "agg", "row", "scan", "slow", "fast", "table", "value", "part",
    "hash", "merge", "batch", "spark", "line", "sort", "window", "stream",
    "filter", "group", "column", "join", "query", "data", "order", "small",
    "big", "customer", "vector", "the", "a",
)


def _h(seed: int, *cols: Column) -> Column:
    """64-bit deterministic hash of (seed, cols...)."""
    return F.xxhash64(F.lit(seed), *cols)


def _pick(options: tuple[str, ...], seed: int, *cols: Column) -> Column:
    """Deterministic choice from a literal list."""
    arr = F.array(*[F.lit(o) for o in options])
    return F.element_at(arr, (F.pmod(_h(seed, *cols), F.lit(len(options))) + 1).cast("int"))


def _unit(seed: int, *cols: Column) -> Column:
    """Deterministic uniform [0, 1) double."""
    return F.pmod(_h(seed, *cols), F.lit(1_000_000)) / F.lit(1_000_000.0)


def generate_orders(
    spark: SparkSession, n_rows: int, seed: int = 7, num_partitions: int | None = None
) -> DataFrame:
    parts = num_partitions or spark.sparkContext.defaultParallelism
    oid = F.col("id")
    return spark.range(0, n_rows, 1, parts).select(
        oid.alias("o_orderkey"),
        F.pmod(_h(seed + 1, oid), F.lit(max(n_rows // 10, 1))).alias("o_custkey"),
        _pick(_STATUSES, seed + 2, oid).alias("o_orderstatus"),
        F.round(_unit(seed + 3, oid) * 400_000 + 1_000, 2).alias("o_totalprice"),
        F.date_add(
            F.lit("1992-01-01").cast("date"),
            F.pmod(_h(seed + 4, oid), F.lit(2557)).cast("int"),
        ).alias("o_orderdate"),
        _pick(_PRIORITIES, seed + 5, oid).alias("o_orderpriority"),
    )


def generate_lineitem(
    spark: SparkSession,
    n_orders: int,
    seed: int = 7,
    max_lines: int = 7,
    num_partitions: int | None = None,
) -> DataFrame:
    """1..max_lines line items per order, exploded map-side."""
    parts = num_partitions or spark.sparkContext.defaultParallelism
    oid = F.col("id")
    n_lines = (F.pmod(_h(seed + 10, oid), F.lit(max_lines)) + 1).cast("int")
    base = spark.range(0, n_orders, 1, parts).select(
        oid.alias("l_orderkey"),
        F.explode(F.sequence(F.lit(1), n_lines)).alias("l_linenumber"),
    )
    ok, ln = F.col("l_orderkey"), F.col("l_linenumber")
    return base.select(
        ok,
        F.pmod(_h(seed + 11, ok, ln), F.lit(max(n_orders // 5, 1))).alias("l_partkey"),
        F.pmod(_h(seed + 12, ok, ln), F.lit(max(n_orders // 100, 1))).alias("l_suppkey"),
        ln,
        (F.pmod(_h(seed + 13, ok, ln), F.lit(50)) + 1).cast("double").alias("l_quantity"),
        F.round(_unit(seed + 14, ok, ln) * 90_000 + 1_000, 2).alias("l_extendedprice"),
        F.round(_unit(seed + 15, ok, ln) * 0.1, 2).alias("l_discount"),
        F.round(_unit(seed + 16, ok, ln) * 0.08, 2).alias("l_tax"),
        _pick(_FLAGS, seed + 17, ok, ln).alias("l_returnflag"),
        _pick(_STATUSES[:2], seed + 18, ok, ln).alias("l_linestatus"),
        F.date_add(
            F.lit("1992-01-03").cast("date"),
            F.pmod(_h(seed + 19, ok, ln), F.lit(2557)).cast("int"),
        ).alias("l_shipdate"),
    )


def generate_documents(
    spark: SparkSession,
    n_rows: int,
    seed: int = 7,
    min_words: int = 20,
    max_words: int = 60,
    num_partitions: int | None = None,
) -> DataFrame:
    """Word-soup documents: text is a pure function of (doc_id, position)."""
    parts = num_partitions or spark.sparkContext.defaultParallelism
    did = F.col("id")
    n_words = (
        F.pmod(_h(seed + 20, did), F.lit(max_words - min_words + 1)) + min_words
    ).cast("int")
    vocab = F.array(*[F.lit(w) for w in _VOCAB])
    words = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda i: F.element_at(
            vocab,
            (F.pmod(F.xxhash64(F.lit(seed + 21), did, i), F.lit(len(_VOCAB))) + 1).cast(
                "int"
            ),
        ),
    )
    text = F.array_join(words, " ")
    return spark.range(0, n_rows, 1, parts).select(
        did.alias("doc_id"),
        text.alias("text"),
        _pick(("en", "de", "fr", "es"), seed + 22, did).alias("lang"),
        _pick(("web", "books", "code", "wiki"), seed + 23, did).alias("source"),
        F.length(text).alias("n_chars"),
    )
