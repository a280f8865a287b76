"""Upsert / keyed-dedup operators (SURVEY.md §2.1 S5/S6/S9).

The reference enforces primary keys with DuckDB ``INSERT OR REPLACE``
(``portfolio_app/scripts/main_pipeline.py:326-352,420-435``). Spark's
immutable storage has no PK enforcement, so the engine provides
last-writer-wins semantics as a deterministic ranking window:

    row_number() OVER (PARTITION BY pk ORDER BY version DESC, tiebreak) = 1

This is the plain-Parquet fallback; on Delta Lake the same API maps to
``MERGE WHEN MATCHED UPDATE WHEN NOT MATCHED INSERT``. At 100 TB the
window shuffles once on the PK hash — the same shuffle a MERGE would do —
and AQE splits skewed keys.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..functions.rounding import duck_round
from ..registry import register


def upsert_last_writer_wins(
    df: DataFrame,
    keys: Sequence[str],
    version_col: str,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Keep exactly one row per key: highest ``version_col`` wins.

    Deterministic replacement for ``INSERT OR REPLACE`` — equivalent to
    replaying inserts in ``version_col`` order (``main_pipeline.py:347``,
    where later fetches replace earlier rows). ``tiebreak`` columns make
    the winner stable when versions collide (SURVEY §2.9: dropDuplicates
    is arbitrary-winner, so we never use it for upserts).
    """
    order = [F.desc(version_col)] + [F.asc(c) for c in tiebreak]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def merge_upsert(existing: DataFrame, updates: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Batch MERGE emulation: updates replace matching keys, others kept.

    Plain-Parquet equivalent of Delta ``MERGE`` for full-snapshot rebuilds
    (the reference's dbt ``--full-refresh`` world, SURVEY §2.9).
    """
    existing_only = existing.join(updates.select(*keys).distinct(), list(keys), "left_anti")
    return existing_only.unionByName(updates)


@register(
    "s05_upsert_last_writer_wins",
    oracle="""
    SELECT user_id, event_type, event_id AS latest_event_id,
           strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS latest_ts,
           ROUND(value, 2) AS latest_value
    FROM (
      SELECT *, row_number() OVER (
               PARTITION BY user_id, event_type
               ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
      FROM events
    )
    WHERE rn = 1
    """,
)
def s05_upsert_last_writer_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5/S6: upsert as last-writer-wins on a composite key.

    Treats the events stream as an upsert feed keyed on
    (user_id, event_type): the newest row (by ts, event_id tiebreak)
    replaces all earlier ones — exactly what replaying the reference's
    ``INSERT OR REPLACE`` (``main_pipeline.py:420-435``) would leave.
    """
    ev = load_table(spark, sf_dir, "events")
    # ts ties are possible in the synthetic feed — event_id desc as tiebreak
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts_us"), F.desc("event_id")
    )
    latest = (
        ev.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    return latest.select(
        "user_id",
        "event_type",
        F.col("event_id").alias("latest_event_id"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("latest_ts"),
        duck_round("value", 2).alias("latest_value"),
    )


@register(
    "s09_first_seen_dedup",
    oracle="""
    SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity
    FROM (
      SELECT *, row_number() OVER (
               PARTITION BY l_orderkey
               ORDER BY l_linenumber ASC, l_partkey ASC, l_suppkey ASC,
                        l_quantity ASC) AS rn
      FROM lineitem
    )
    WHERE rn = 1
    """,
)
def s09_first_seen_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9: deterministic first-seen-wins dedup.

    Reference: ``main_pipeline.py:184,206-209`` — a Python set keeps the
    first location seen per id across zip queries. The Spark analog uses
    an explicit stable ordering (lowest l_linenumber per order), never
    ``dropDuplicates`` whose winner is partition-order-dependent.
    """
    li = load_table(spark, sf_dir, "lineitem")
    # the feed contains duplicate (orderkey, linenumber) rows — the extra
    # keys make the ordering total, so the winner is reproducible
    w = Window.partitionBy("l_orderkey").orderBy(
        F.asc("l_linenumber"), F.asc("l_partkey"), F.asc("l_suppkey"),
        F.asc("l_quantity"),
    )
    return (
        li.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity")
    )


@register(
    "s06_merge_upsert",
    oracle="""
    WITH existing AS (
      SELECT event_id, user_id, event_type, ROUND(value, 2) AS value
      FROM events WHERE event_id % 3 != 0
    ),
    updates AS (
      SELECT event_id, user_id, event_type, ROUND(value * 2, 2) AS value
      FROM events WHERE event_id % 5 = 0
    )
    SELECT e.* FROM existing e
    LEFT JOIN (SELECT DISTINCT event_id FROM updates) u
      ON e.event_id = u.event_id
    WHERE u.event_id IS NULL
    UNION ALL
    SELECT * FROM updates
    """,
)
def s06_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6: batch MERGE emulation — updates replace matches, others kept.

    The plain-Parquet equivalent of Delta ``MERGE WHEN MATCHED UPDATE
    WHEN NOT MATCHED INSERT`` (reference ``INSERT OR REPLACE``,
    ``main_pipeline.py:420-435``): an anti-join drops the matched
    existing rows, then the update set unions in. One shuffle on the
    key; at scale the anti-join broadcasts whenever the update batch is
    small — the common case for incremental loads.
    """
    ev = load_table(spark, sf_dir, "events")
    existing = ev.filter(F.col("event_id") % 3 != 0).select(
        "event_id", "user_id", "event_type", duck_round("value", 2).alias("value")
    )
    updates = ev.filter(F.col("event_id") % 5 == 0).select(
        "event_id",
        "user_id",
        "event_type",
        duck_round(F.col("value") * 2, 2).alias("value"),
    )
    return merge_upsert(existing, updates, ["event_id"])
