"""Staging models: raw → typed/filtered views (reference staging layer).

Each function is the Spark expression of one dbt staging model
(``/root/reference/dbt_pipeline_demo/models/staging/*.sql``) — a pure
``DataFrame -> DataFrame`` projection/filter that Catalyst pushes into
the parquet scan, mirroring dbt's ``+materialized: view`` choice
(``dbt_project.yml:35-37``): staging is never persisted.

Type parity with the DuckDB reference (SURVEY.md §2.9, verified
empirically):

- ``discount_amount``: DECIMAL arithmetic stays exact — Spark's
  ``decimal(10,2) - decimal(10,2) -> decimal(11,2)`` widening matches
  DuckDB's.
- ``discount_pct``: DuckDB evaluates ``DECIMAL / DECIMAL`` as DOUBLE
  division; we cast to double before dividing and use ``duck_round``
  so the half-away-from-zero rounding matches bit-for-bit.
- ``TRY_CAST(... AS DATE)``: Spark ``try_cast`` nulls unparseable
  strings exactly like DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.rounding import duck_round


def stg_locations(raw_locations: DataFrame) -> DataFrame:
    """Column passthrough + not-null gate.

    Reference: ``models/staging/stg_locations.sql:1-13`` (P1/P2).
    Both the 10-column projection and the conjunct filter reach the
    parquet scan (column pruning + predicate pushdown) — zero shuffle.
    """
    return raw_locations.select(
        "location_id",
        "name",
        "chain",
        "address_line1",
        "city",
        "state",
        "zip_code",
        "latitude",
        "longitude",
        "fetched_at",
    ).filter(F.col("location_id").isNotNull() & F.col("latitude").isNotNull())


def stg_products(raw_products: DataFrame) -> DataFrame:
    """JSON first-element extraction + not-null key gate.

    Reference: ``models/staging/stg_products.sql:1-9`` (P7/P8) —
    ``json_extract_string(categories, '$[0]')``. ``get_json_object``
    is the JVM-side equivalent (no UDF in the hot path).
    """
    return raw_products.select(
        "product_id",
        "description",
        "brand",
        F.get_json_object("categories", "$[0]").alias("primary_category"),
        "categories",
        "fetched_at",
    ).filter(F.col("product_id").isNotNull())


def stg_prices(raw_prices: DataFrame) -> DataFrame:
    """Derived discount columns + safe date casts + positive-price gate.

    Reference: ``models/staging/stg_prices.sql:1-21`` (P3-P6).
    ``regular_price > 0`` is pushed to the scan as a parquet row-group
    filter; everything else is per-row expression work inside
    whole-stage codegen.
    """
    r = F.col("regular_price")
    p = F.col("promo_price")
    rd = r.cast("double")
    pd_ = p.cast("double")
    return raw_prices.select(
        "product_id",
        "location_id",
        "item_id",
        "size",
        "regular_price",
        "promo_price",
        (r - F.coalesce(p, r)).alias("discount_amount"),
        F.when(
            p.isNotNull() & (p < r),
            duck_round((rd - pd_) / rd * F.lit(100.0), 2),
        )
        .otherwise(F.lit(0.0))
        .alias("discount_pct"),
        F.col("effective_date").try_cast("date").alias("effective_date"),
        F.col("expiration_date").try_cast("date").alias("expiration_date"),
        "fulfillment_instore",
        "fulfillment_delivery",
        "fulfillment_curbside",
        "fulfillment_shiptohome",
        "stock_level",
        "fetched_at",
    ).filter(r > 0)
