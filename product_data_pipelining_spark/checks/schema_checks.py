"""Data-quality checks: the reference's dbt generic tests on Spark.

The reference declares 16 ``unique`` / ``not_null`` tests in
``/root/reference/dbt_pipeline_demo/models/schema.yml`` (SURVEY.md §5);
dbt compiles each into a SELECT returning violating rows, and a model
passes when that query is empty. Here each check is a distributed
count over the model DataFrame — a single aggregation job, no collect
of data rows — mirroring ``dbt test`` (SURVEY.md §3 entry point 3).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class CheckResult:
    model: str
    column: str
    kind: str  # "unique" | "not_null"
    violations: int

    @property
    def passed(self) -> bool:
        return self.violations == 0


def unique_violations(df: DataFrame, column: str) -> int:
    """Number of key values appearing more than once (dbt ``unique``).

    dbt counts *values* with duplicates, not duplicated rows; NULL keys
    are ignored (dbt's unique test excludes them — ``not_null`` covers
    those). One hash aggregation with map-side partial counts.
    """
    return (
        df.filter(F.col(column).isNotNull())
        .groupBy(column)
        .count()
        .filter(F.col("count") > 1)
        .count()
    )


def not_null_violations(df: DataFrame, column: str) -> int:
    """Number of rows with a NULL in ``column`` (dbt ``not_null``)."""
    return df.filter(F.col(column).isNull()).count()


# the 16 declared tests — schema.yml lines cited in SURVEY.md §5
SCHEMA_CHECKS: tuple[tuple[str, str, str], ...] = (
    ("stg_products", "product_id", "unique"),        # schema.yml:22-26
    ("stg_products", "product_id", "not_null"),
    ("stg_locations", "location_id", "unique"),      # schema.yml:41-45
    ("stg_locations", "location_id", "not_null"),
    ("stg_prices", "product_id", "not_null"),        # schema.yml:68-75
    ("stg_prices", "location_id", "not_null"),
    ("dim_products", "product_id", "unique"),        # schema.yml:110-114
    ("dim_products", "product_id", "not_null"),
    ("dim_locations", "location_id", "unique"),      # schema.yml:127-131
    ("dim_locations", "location_id", "not_null"),
    ("fact_prices", "product_id", "not_null"),       # schema.yml:152-159
    ("fact_prices", "location_id", "not_null"),
    ("mart_category_distribution", "category", "not_null"),  # :202-205
    ("mart_price_by_category", "category", "not_null"),      # :216-219
    ("mart_location_sales", "location_id", "unique"),        # :244-248
    ("mart_location_sales", "location_id", "not_null"),
)


def run_schema_checks(models: dict[str, DataFrame]) -> list[CheckResult]:
    """Run all 16 checks against built models; returns every result.

    Callers gate on ``all(r.passed for r in results)`` — the engine
    equivalent of a green ``dbt test`` run.
    """
    results: list[CheckResult] = []
    for model, column, kind in SCHEMA_CHECKS:
        df = models[model]
        n = (
            unique_violations(df, column)
            if kind == "unique"
            else not_null_violations(df, column)
        )
        results.append(CheckResult(model, column, kind, n))
    return results
