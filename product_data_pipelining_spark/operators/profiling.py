"""Dataset profiling: per-column statistics in one scan.

The engine-side generalization of the reference's schema tests (§5):
instead of pass/fail ``unique``/``not_null`` checks, emit the actual
per-column statistics (rows, nulls, exact distincts, min/max) that a
data-quality dashboard or a partition planner consumes. Everything
computes in a single aggregation pass — the per-column aggregates ride
one job, then ``stack`` unpivots the single result row into one row per
column (driver never loops over data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register

_PROFILE_COLS = ("l_orderkey", "l_returnflag", "l_linestatus", "l_shipdate")


def profile_columns(df: DataFrame, columns: tuple[str, ...]) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct, min_value, max_value) rows."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in columns:
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"__nulls_{c}"),
            F.countDistinct(c).alias(f"__dist_{c}"),
            F.min(c).cast("string").alias(f"__min_{c}"),
            F.max(c).cast("string").alias(f"__max_{c}"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __nulls_{c}, __dist_{c}, __min_{c}, __max_{c}"
        for c in columns
    )
    return one.select(
        F.expr(
            f"stack({len(columns)}, {stack_args}) AS "
            "(column_name, n_nulls, n_distinct, min_value, max_value)"
        ),
        F.col("__n").alias("n_rows"),
    ).select(
        "column_name", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value"
    )


def _sql_profile(table: str, columns: tuple[str, ...]) -> str:
    parts = [
        f"""
        SELECT '{c}' AS column_name,
               COUNT(*) AS n_rows,
               COUNT(*) - COUNT({c}) AS n_nulls,
               COUNT(DISTINCT {c}) AS n_distinct,
               CAST(MIN({c}) AS VARCHAR) AS min_value,
               CAST(MAX({c}) AS VARCHAR) AS max_value
        FROM {table}
        """
        for c in columns
    ]
    return " UNION ALL ".join(parts)


@register(
    "pr01_profile_columns",
    oracle=_sql_profile("lineitem", _PROFILE_COLS),
)
def pr01_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass column profile of the lineitem fact."""
    li = load_table(spark, sf_dir, "lineitem")
    return profile_columns(li, _PROFILE_COLS)
