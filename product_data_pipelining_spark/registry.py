"""Query registry: every engine operator exposed as a named query.

Each entry pairs a Spark implementation ``(spark, sf_dir) -> DataFrame``
with (where SQL-expressible) an equivalent ANSI/DuckDB oracle SQL string
over the same parquet tables. The driver's correctness gate runs both and
hash-compares (row-count + schema + order-insensitive value hash), so:

- every computed column is aliased identically on both sides;
- floating aggregates are rounded identically on both sides (summation
  order differs between engines; rounding makes the comparison stable);
- output row order is irrelevant (driver sorts before hashing).

Operator IDs in query names refer to SURVEY.md §2's inventory of the
reference repo's operators.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB-runnable SQL; None → rows-only check
    doc: str


_REGISTRY: dict[str, QuerySpec] = {}


# Opt-in prepared-plan cache (SPARK_GRAFT_PLAN_CACHE=1): memoize the
# *unresolved-to-analyzed DataFrame* per (session, sf_dir, query). Spark
# analyzes eagerly on every transformation, so re-declaring a deep plan
# costs 100-400 ms of analyzer + py4j round trips before a single task
# runs — the moral equivalent of re-preparing a statement per execution.
# DataFrames are immutable, so serving the memoized object is
# semantically identical; the reference's dashboard does the same one
# level up (Streamlit result caching). Off by default so tests and the
# driver's correctness gate exercise fresh plan construction.
_PLAN_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query to the registry."""
    import os

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")

        def prepared(spark: SparkSession, sf_dir: str) -> DataFrame:
            if os.environ.get("SPARK_GRAFT_PLAN_CACHE") != "1":
                return fn(spark, sf_dir)
            key = (spark.sparkContext.applicationId, sf_dir, name)
            df = _PLAN_CACHE.get(key)
            if df is None:
                df = fn(spark, sf_dir)
                _PLAN_CACHE[key] = df
            return df

        prepared.__name__ = fn.__name__
        prepared.__doc__ = fn.__doc__
        _REGISTRY[name] = QuerySpec(
            name=name, fn=prepared, oracle=oracle, doc=fn.__doc__ or ""
        )
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    """Import all operator modules (populating the registry) and return it."""
    # imports are deferred so importing `registry` alone stays cheap
    from .models import pipeline_queries  # noqa: F401
    from .sources import payload_queries  # noqa: F401
    from .operators import (  # noqa: F401
        cogroup,
        dedup,
        multimodal,
        profiling,
        relational,
        sampling,
        scalar_ops,
        similarity,
        sqlapi,
        stats,
        temporal,
        tpch_shapes,
        windows,
        textops,
        upsert,
    )
    from .streaming import sessionize  # noqa: F401

    return dict(_REGISTRY)
