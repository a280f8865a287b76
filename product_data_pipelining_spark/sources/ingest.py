"""REST ingestion layer: nested API payloads → flat raw rows, Spark-first.

Reference: ``/root/reference/portfolio_app/scripts/main_pipeline.py``.
The reference fetches OAuth2-authenticated JSON from a grocery REST API
(S1-S3, ``main_pipeline.py:135-272``) and flattens the nested payloads
with hand-rolled dict traversal in driver Python (S7,
``main_pipeline.py:355-418``). Here the flattening is a *Spark
expression over typed nested structs* — ``element_at(items, 1)`` + field
-path selects — so at scale the landed payload files flatten in parallel
on executors, while the thin HTTP client below stays driver-side (auth
and pagination are not a distributed concern).

Payload shape (vendored OpenAPI spec ``/root/reference/.claude/
openapi.json`` — productModel :491-530, productItemModel :974-1007,
dateValueModel :1076-1088; locations consumed at
``main_pipeline.py:205-222``):

- product: ``productId``, ``description``, ``brand``,
  ``categories: array<string>``, ``items[]`` with nested
  ``price{regular, promo, effectiveDate{value,timezone},
  expirationDate{...}}``, ``fulfillment{4 bools}``,
  ``inventory{stockLevel}``.
- location: ``locationId``, ``name``, ``chain``, nested ``address{...}``
  and ``geolocation{latitude, longitude}``.

Replayed fixtures add request context the live client would carry
in-memory: ``location_id`` (the store a product page was fetched for)
and ``fetch_seq`` (global request/row order, which makes the reference's
first-seen dedup — a Python ``set``, ``main_pipeline.py:206-209`` —
deterministic on Spark).
"""

from __future__ import annotations

import os
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --- payload schemas (explicit — nothing schema-inferred at read time) ------

DATE_VALUE = T.StructType(
    [
        T.StructField("value", T.StringType()),
        T.StructField("timezone", T.StringType()),
    ]
)

PRODUCT_ITEM = T.StructType(
    [
        T.StructField("itemId", T.StringType()),
        T.StructField("size", T.StringType()),
        T.StructField(
            "price",
            T.StructType(
                [
                    T.StructField("regular", T.DecimalType(10, 2)),
                    T.StructField("promo", T.DecimalType(10, 2)),
                    T.StructField("effectiveDate", DATE_VALUE),
                    T.StructField("expirationDate", DATE_VALUE),
                ]
            ),
        ),
        T.StructField(
            "fulfillment",
            T.StructType(
                [
                    T.StructField("curbside", T.BooleanType()),
                    T.StructField("delivery", T.BooleanType()),
                    T.StructField("instore", T.BooleanType()),
                    T.StructField("shiptohome", T.BooleanType()),
                ]
            ),
        ),
        T.StructField(
            "inventory",
            T.StructType([T.StructField("stockLevel", T.StringType())]),
        ),
    ]
)

PRODUCT_PAYLOAD = T.StructType(
    [
        T.StructField("fetch_seq", T.LongType()),
        T.StructField("location_id", T.StringType()),
        T.StructField(
            "product",
            T.StructType(
                [
                    T.StructField("productId", T.StringType()),
                    T.StructField("description", T.StringType()),
                    T.StructField("brand", T.StringType()),
                    T.StructField("categories", T.ArrayType(T.StringType())),
                    T.StructField("items", T.ArrayType(PRODUCT_ITEM)),
                ]
            ),
        ),
    ]
)

LOCATION_PAYLOAD = T.StructType(
    [
        T.StructField("fetch_seq", T.LongType()),
        T.StructField(
            "location",
            T.StructType(
                [
                    T.StructField("locationId", T.StringType()),
                    T.StructField("name", T.StringType()),
                    T.StructField("chain", T.StringType()),
                    T.StructField(
                        "address",
                        T.StructType(
                            [
                                T.StructField("addressLine1", T.StringType()),
                                T.StructField("city", T.StringType()),
                                T.StructField("state", T.StringType()),
                                T.StructField("zipCode", T.StringType()),
                            ]
                        ),
                    ),
                    T.StructField(
                        "geolocation",
                        T.StructType(
                            [
                                T.StructField("latitude", T.DoubleType()),
                                T.StructField("longitude", T.DoubleType()),
                            ]
                        ),
                    ),
                ]
            ),
        ),
    ]
)


# --- landed-payload readers + Spark-native flattening (S7) ------------------


def read_location_payloads(spark: SparkSession, path: str) -> DataFrame:
    """Landed location payloads (JSONL) with the explicit schema."""
    return spark.read.schema(LOCATION_PAYLOAD).json(path)


def read_product_payloads(spark: SparkSession, path: str) -> DataFrame:
    """Landed product payloads (JSONL) with the explicit schema."""
    return spark.read.schema(PRODUCT_PAYLOAD).json(path)


def flatten_locations(payloads: DataFrame) -> DataFrame:
    """Location payload → raw_locations row; first-seen wins per id (S9).

    Replaces the dict traversal at ``main_pipeline.py:205-222``: nested
    field paths null-safely project missing structs to NULL, exactly
    like chained ``dict.get``. The reference keeps the *first* payload
    per ``locationId`` across the zip loop (a Python ``set``); with
    ``fetch_seq`` carrying that order, a min-seq row_number makes the
    same choice deterministically in parallel.
    """
    flat = payloads.select(
        "fetch_seq",
        F.col("location.locationId").alias("location_id"),
        F.col("location.name").alias("name"),
        F.col("location.chain").alias("chain"),
        F.col("location.address.addressLine1").alias("address_line1"),
        F.col("location.address.city").alias("city"),
        F.col("location.address.state").alias("state"),
        F.col("location.address.zipCode").alias("zip_code"),
        F.col("location.geolocation.latitude").alias("latitude"),
        F.col("location.geolocation.longitude").alias("longitude"),
    ).filter(F.col("location_id").isNotNull())
    w = Window.partitionBy("location_id").orderBy("fetch_seq")
    return (
        flat.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "fetch_seq")
    )


def flatten_products(payloads: DataFrame) -> DataFrame:
    """Product payload → raw_products row (S7 product branch).

    ``main_pipeline.py:379-388``: skip payloads without ``productId``
    (S8); serialize ``categories`` back to a JSON string for raw-table
    parity (missing array → ``'[]'``, like ``json.dumps([])``).
    """
    return payloads.filter(F.col("product.productId").isNotNull()).select(
        F.col("product.productId").alias("product_id"),
        F.col("product.description").alias("description"),
        F.col("product.brand").alias("brand"),
        F.coalesce(F.to_json("product.categories"), F.lit("[]")).alias(
            "categories"
        ),
    )


def flatten_prices(payloads: DataFrame) -> DataFrame:
    """Product payload → raw_product_prices row (S7 price branch).

    ``main_pipeline.py:390-418``: first item only (``items[0]``), nested
    price/fulfillment/inventory unwrap, ``dateValueModel.value`` date
    extraction, and the S8 gates (no product id / no items / no regular
    price → no row). ``element_at(items, 1)`` is NULL for empty/missing
    arrays, so one filter covers both gate shapes.
    """
    item = F.element_at("product.items", 1)
    return (
        payloads.filter(F.col("product.productId").isNotNull())
        .select(
            F.col("product.productId").alias("product_id"),
            F.col("location_id"),
            item.alias("item"),
        )
        .filter(F.col("item.price.regular").isNotNull())
        .select(
            "product_id",
            "location_id",
            F.col("item.itemId").alias("item_id"),
            F.col("item.size").alias("size"),
            F.col("item.price.regular").alias("regular_price"),
            F.col("item.price.promo").alias("promo_price"),
            F.col("item.price.effectiveDate.value").alias("effective_date"),
            F.col("item.price.expirationDate.value").alias("expiration_date"),
            F.col("item.fulfillment.instore").alias("fulfillment_instore"),
            F.col("item.fulfillment.delivery").alias("fulfillment_delivery"),
            F.col("item.fulfillment.curbside").alias("fulfillment_curbside"),
            F.col("item.fulfillment.shiptohome").alias("fulfillment_shiptohome"),
            F.col("item.inventory.stockLevel").alias("stock_level"),
        )
    )


# --- driver-side REST client (S1-S3) ----------------------------------------

CATEGORY_SEARCHES = [
    "produce", "dairy", "bakery", "meat",
    "frozen", "snacks", "beverages", "household",
]
LOCATION_ZIPS = [
    "10001", "60601", "77001", "90001", "30301",
    "85001", "98101", "78201", "33101", "02101",
]
REQUEST_DELAY = 0.1
REQUEST_TIMEOUT = 30
MAX_RETRIES = 4  # attempts = MAX_RETRIES + 1
BACKOFF_BASE_S = 0.5
BACKOFF_CAP_S = 8.0
RETRYABLE_STATUS = frozenset({429, 500, 502, 503, 504})


class TransientHTTPError(RuntimeError):
    """A retryable HTTP response (429 / 5xx)."""

    def __init__(self, status: int, url: str):
        super().__init__(f"HTTP {status} from {url}")
        self.status = status


class PermanentHTTPError(RuntimeError):
    """A non-retryable HTTP response (4xx other than 429).

    Raised from the *status code we already inspected* — classification
    never depends on the transport's exception class names, so a custom
    transport raising its own ``HTTPError`` for a 503 still retries.
    """

    def __init__(self, status: int, url: str):
        super().__init__(f"HTTP {status} from {url}")
        self.status = status


class RestClient:
    """Thin OAuth2 client-credentials REST client with a replay mode.

    Mirrors S1-S3 (``main_pipeline.py:135-272``): token fetch via Basic
    auth, per-zip location queries, per-(location, term) product
    queries. ``replay_dir`` short-circuits HTTP and reads landed JSONL
    payloads instead — the test/CI path, and the shape a production
    deployment uses anyway (land payloads to object storage, flatten
    with Spark).

    Every request retries transient failures — connection errors,
    timeouts, HTTP 429/5xx (the reference logs and aborts per call,
    ``main_pipeline.py:163-169,226-228``) — with capped exponential
    backoff plus full jitter, bounded at ``MAX_RETRIES`` retries.
    Non-retryable statuses (4xx other than 429) raise immediately.
    ``transport`` / ``sleeper`` are injectable for tests (a flaky fake
    transport) and so the backoff can be asserted without sleeping.
    """

    def __init__(
        self,
        base_url: str = "https://api.example.com",
        client_id: str | None = None,
        client_secret: str | None = None,
        replay_dir: str | None = None,
        transport: "Any | None" = None,
        sleeper: "Any" = time.sleep,
    ) -> None:
        self.base_url = base_url
        self.client_id = client_id
        self.client_secret = client_secret
        self.replay_dir = replay_dir
        self.transport = transport
        self._sleep = sleeper

    def _default_transport(self, method: str, url: str, **kw: Any):
        import requests  # driver-side only; never shipped to executors

        return requests.request(method, url, timeout=REQUEST_TIMEOUT, **kw)

    def _request(self, method: str, url: str, **kw: Any):
        """One logical request = up to 1 + MAX_RETRIES attempts."""
        import random

        transport = self.transport or self._default_transport
        last_exc: Exception | None = None
        for attempt in range(MAX_RETRIES + 1):
            try:
                resp = transport(method, url, **kw)
                status = getattr(resp, "status_code", 200)
                if status in RETRYABLE_STATUS:
                    raise TransientHTTPError(status, url)
                if status >= 400:
                    # permanent client error: no retry will change it.
                    # Classified on the inspected status, never on the
                    # transport's exception class names.
                    raise PermanentHTTPError(status, url)
                return resp
            except PermanentHTTPError:
                raise
            except TransientHTTPError as exc:
                last_exc = exc
            except Exception as exc:
                # connection reset / timeout / DNS — all retryable
                last_exc = exc
            if attempt < MAX_RETRIES:
                # capped exponential backoff, full jitter: desynchronizes
                # concurrent clients hammering a recovering endpoint
                cap = min(BACKOFF_CAP_S, BACKOFF_BASE_S * (2**attempt))
                self._sleep(cap * random.random())
        raise last_exc  # type: ignore[misc]

    # S1: main_pipeline.py:135-169
    def get_access_token(self) -> str:
        if self.replay_dir is not None:
            return "replay-token"
        resp = self._request(
            "POST",
            f"{self.base_url}/v1/connect/oauth2/token",
            auth=(self.client_id or "", self.client_secret or ""),
            data={"grant_type": "client_credentials", "scope": "product.compact"},
        )
        return resp.json()["access_token"]

    def _get(self, token: str, path: str, params: dict[str, Any]) -> list[dict]:
        resp = self._request(
            "GET",
            f"{self.base_url}{path}",
            headers={"Authorization": f"Bearer {token}",
                     "Accept": "application/json"},
            params=params,
        )
        self._sleep(REQUEST_DELAY)
        return resp.json().get("data", [])

    # S2: main_pipeline.py:172-228
    def fetch_location_payloads(
        self, token: str, zip_codes: list[str] | None = None
    ) -> list[dict]:
        """One payload dict per returned location, fetch order preserved."""
        if self.replay_dir is not None:
            return _read_jsonl(os.path.join(self.replay_dir, "locations_payload.jsonl"))
        out: list[dict] = []
        seq = 0
        for zip_code in zip_codes or LOCATION_ZIPS:
            for loc in self._get(
                token,
                "/v1/locations",
                {"filter.zipCode.near": zip_code,
                 "filter.radiusInMiles": 50,
                 "filter.limit": 10},
            ):
                out.append({"fetch_seq": seq, "location": loc})
                seq += 1
        return out

    # S3: main_pipeline.py:231-272
    def fetch_product_payloads(
        self,
        token: str,
        location_ids: list[str],
        terms: list[str] | None = None,
    ) -> list[dict]:
        if self.replay_dir is not None:
            return _read_jsonl(os.path.join(self.replay_dir, "products_payload.jsonl"))
        out: list[dict] = []
        seq = 0
        for loc_id in location_ids:
            for term in terms or CATEGORY_SEARCHES:
                for prod in self._get(
                    token,
                    "/v1/products",
                    {"filter.term": term,
                     "filter.locationId": loc_id,
                     "filter.limit": 50},
                ):
                    out.append(
                        {"fetch_seq": seq, "location_id": loc_id, "product": prod}
                    )
                    seq += 1
        return out


def _read_jsonl(path: str) -> list[dict]:
    import json

    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]
