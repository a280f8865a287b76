"""Registry entries for the ingest layer (S2/S7/S8/S9 payload flattening).

Spark side: typed-struct reads + :mod:`.ingest` flatten expressions over
the JSONL payload fixtures. Oracle side: DuckDB ``read_json_objects`` +
JSON-path extraction replaying the reference's dict traversal
(``main_pipeline.py:205-222, 355-418``) over the identical files.
"""

from __future__ import annotations

import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .ingest import (
    flatten_locations,
    flatten_prices,
    flatten_products,
    read_location_payloads,
    read_product_payloads,
)
from .synthetic import write_payload_fixtures

_FIXTURE_DIR = str(Path(__file__).resolve().parents[2] / "fixtures")


def ensure_payload_fixtures() -> str:
    if not os.path.exists(os.path.join(_FIXTURE_DIR, "products_payload.jsonl")):
        write_payload_fixtures(_FIXTURE_DIR)
    return _FIXTURE_DIR


ensure_payload_fixtures()

_LOC = f"{_FIXTURE_DIR}/locations_payload.jsonl"
_PROD = f"{_FIXTURE_DIR}/products_payload.jsonl"


@register(
    "s02_s09_flatten_locations",
    oracle=f"""
    WITH flat AS (
      SELECT CAST(json_extract_string(json, '$.fetch_seq') AS BIGINT) AS fetch_seq,
             json_extract_string(json, '$.location.locationId') AS location_id,
             json_extract_string(json, '$.location.name') AS name,
             json_extract_string(json, '$.location.chain') AS chain,
             json_extract_string(json, '$.location.address.addressLine1') AS address_line1,
             json_extract_string(json, '$.location.address.city') AS city,
             json_extract_string(json, '$.location.address.state') AS state,
             json_extract_string(json, '$.location.address.zipCode') AS zip_code,
             CAST(json_extract_string(json, '$.location.geolocation.latitude') AS DOUBLE) AS latitude,
             CAST(json_extract_string(json, '$.location.geolocation.longitude') AS DOUBLE) AS longitude
      FROM read_json_objects('{_LOC}', format='newline_delimited')
      WHERE json_extract_string(json, '$.location.locationId') IS NOT NULL
    )
    SELECT location_id, name, chain, address_line1, city, state, zip_code,
           latitude, longitude
    FROM (SELECT *, row_number() OVER (
            PARTITION BY location_id ORDER BY fetch_seq) AS rn FROM flat)
    WHERE rn = 1
    """,
)
def s02_s09_flatten_locations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2+S9: nested location payload → raw row, first-seen per id.

    The nested ``address``/``geolocation`` unwrap replaces
    ``main_pipeline.py:205-222``; first-seen dedup replaces the Python
    ``set`` (``:206-209``) with a deterministic min-``fetch_seq`` window.
    """
    return flatten_locations(read_location_payloads(spark, _LOC))


@register(
    "s07a_flatten_products",
    oracle=f"""
    SELECT json_extract_string(json, '$.product.productId') AS product_id,
           json_extract_string(json, '$.product.description') AS description,
           json_extract_string(json, '$.product.brand') AS brand,
           COALESCE(CAST(json_extract(json, '$.product.categories') AS VARCHAR),
                    '[]') AS categories
    FROM read_json_objects('{_PROD}', format='newline_delimited')
    WHERE json_extract_string(json, '$.product.productId') IS NOT NULL
    """,
)
def s07a_flatten_products(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 product branch: payload → raw_products row, categories
    re-serialized to a JSON string (``main_pipeline.py:379-388``)."""
    return flatten_products(read_product_payloads(spark, _PROD))


@register(
    "s07b_flatten_prices",
    oracle=f"""
    SELECT json_extract_string(json, '$.product.productId') AS product_id,
           json_extract_string(json, '$.location_id') AS location_id,
           json_extract_string(json, '$.product.items[0].itemId') AS item_id,
           json_extract_string(json, '$.product.items[0].size') AS size,
           CAST(CAST(json_extract_string(json, '$.product.items[0].price.regular')
                AS DECIMAL(10,2)) AS DOUBLE) AS regular_price,
           CAST(CAST(json_extract_string(json, '$.product.items[0].price.promo')
                AS DECIMAL(10,2)) AS DOUBLE) AS promo_price,
           json_extract_string(json, '$.product.items[0].price.effectiveDate.value')
             AS effective_date,
           json_extract_string(json, '$.product.items[0].price.expirationDate.value')
             AS expiration_date,
           CAST(json_extract_string(json, '$.product.items[0].fulfillment.instore')
                AS BOOLEAN) AS fulfillment_instore,
           CAST(json_extract_string(json, '$.product.items[0].fulfillment.delivery')
                AS BOOLEAN) AS fulfillment_delivery,
           CAST(json_extract_string(json, '$.product.items[0].fulfillment.curbside')
                AS BOOLEAN) AS fulfillment_curbside,
           CAST(json_extract_string(json, '$.product.items[0].fulfillment.shiptohome')
                AS BOOLEAN) AS fulfillment_shiptohome,
           json_extract_string(json, '$.product.items[0].inventory.stockLevel')
             AS stock_level
    FROM read_json_objects('{_PROD}', format='newline_delimited')
    WHERE json_extract_string(json, '$.product.productId') IS NOT NULL
      AND json_extract_string(json, '$.product.items[0].price.regular') IS NOT NULL
    """,
)
def s07b_flatten_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 price branch: ``items[0]`` + nested price/fulfillment/inventory
    unwrap + dateValueModel.value + S8 gates (``main_pipeline.py:390-418``)."""
    df = flatten_prices(read_product_payloads(spark, _PROD))
    return df.select(
        "product_id",
        "location_id",
        "item_id",
        "size",
        F.col("regular_price").cast("double").alias("regular_price"),
        F.col("promo_price").cast("double").alias("promo_price"),
        "effective_date",
        "expiration_date",
        "fulfillment_instore",
        "fulfillment_delivery",
        "fulfillment_curbside",
        "fulfillment_shiptohome",
        "stock_level",
    )
