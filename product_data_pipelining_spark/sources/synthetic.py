"""Deterministic synthetic generator for the reference-shaped raw tables.

Produces the three raw tables of the reference's ingest layer
(``raw.locations`` / ``raw.products`` / ``raw.product_prices`` — DDL at
``/root/reference/portfolio_app/scripts/main_pipeline.py:281-322``) with
every oracle-sensitive edge case from FIXTURES.md:

- ~5% null latitude (stg_locations filter), null zip/address
- ~1% null product_id (stg_products filter), ~10% null brand,
  JSON-array ``categories`` strings incl. ``'[]'``
- prices: a few rows ≤ 0, ~60% null promo (some ≥ regular),
  date STRINGS incl. unparseable (TRY_CAST path), all-false
  fulfillment rows, ~5% null stock_level, duplicate PKs with distinct
  fetched_at (upsert last-writer-wins), FK misses (LEFT JOIN survival),
  categories with < 5 price rows (HAVING), zero-promo categories,
  groups of 1/2/odd/even size (percentile interpolation)

Everything is pure ``random.Random(seed)`` — same seed, same bytes.
The tables are written once as parquet; Spark and the DuckDB oracle
read identical files.
"""

from __future__ import annotations

import json
import os
import random
from datetime import date, datetime, timedelta
from decimal import Decimal

import pyarrow as pa
import pyarrow.parquet as pq

CATEGORIES = [
    "produce",
    "dairy",
    "bakery",
    "meat",
    "frozen",
    "snacks",
    "beverages",
    "household",
]
STATES = ["OH", "KY", "TX", "CA", "WA", "GA", "MI", "IN", "TN", "AZ"]
CHAINS = ["KROGER", "FRED MEYER", "RALPHS", "FRYS", "SMITHS"]
STOCK_LEVELS = ["HIGH", "LOW", "TEMPORARILY_OUT_OF_STOCK"]

BASE_TS = datetime(2026, 2, 1, 12, 0, 0)


def gen_locations(rng: random.Random, n: int) -> list[dict]:
    rows = []
    for i in range(n):
        rows.append(
            {
                "location_id": f"{10000000 + i:08d}",
                "name": f"Kroger - City{i % 37} #{i}",
                "chain": rng.choice(CHAINS),
                "address_line1": None if rng.random() < 0.1 else f"{100 + i} Main St",
                "city": f"City{i % 37}",
                "state": STATES[i % len(STATES)],
                "zip_code": None if rng.random() < 0.05 else f"{45000 + i % 999:05d}",
                "latitude": None if rng.random() < 0.05 else round(rng.uniform(25, 48), 6),
                "longitude": round(rng.uniform(-124, -71), 6),
                "fetched_at": BASE_TS + timedelta(seconds=i),
            }
        )
    return rows


def gen_products(rng: random.Random, n: int) -> list[dict]:
    rows = []
    for i in range(n):
        pid = None if rng.random() < 0.01 else f"{1000000000000 + i:013d}"
        n_cats = rng.choices([0, 1, 2], weights=[5, 75, 20])[0]
        cats = rng.sample(CATEGORIES, n_cats) if n_cats else []
        rows.append(
            {
                "product_id": pid,
                "description": f"Product {i} description",
                "brand": None if rng.random() < 0.10 else f"Brand{i % 25}",
                "categories": json.dumps(cats),
                "fetched_at": BASE_TS + timedelta(seconds=i),
            }
        )
    # duplicate upsert keys: re-emit a few ids with later fetched_at
    for i in range(0, min(n, 50), 10):
        base = dict(rows[i])
        if base["product_id"] is not None:
            base["description"] = f"Product {i} description v2"
            base["fetched_at"] = BASE_TS + timedelta(days=1, seconds=i)
            rows.append(base)
    return rows


def gen_prices(
    rng: random.Random, products: list[dict], locations: list[dict], n: int
) -> list[dict]:
    pids = [p["product_id"] for p in products if p["product_id"]]
    lids = [loc["location_id"] for loc in locations]
    rows = []
    for i in range(n):
        # ~2% FK misses on each side — LEFT JOIN must keep these rows
        pid = f"{9999000000000 + i:013d}" if rng.random() < 0.02 else rng.choice(pids)
        lid = f"{99900000 + i:08d}" if rng.random() < 0.02 else rng.choice(lids)
        regular = Decimal(rng.randint(50, 6000)) / 100
        if rng.random() < 0.005:
            regular = Decimal(rng.choice(["0.00", "-1.00"]))  # filter fodder
        promo = None
        r = rng.random()
        if r > 0.6:
            if r < 0.68:  # some promos ≥ regular → discount_pct clamps to 0
                promo = regular + Decimal(rng.randint(0, 200)) / 100
            else:
                promo = max(Decimal("0.01"), regular - Decimal(rng.randint(1, 2000)) / 100)
        d = rng.random()
        if d < 0.7:
            eff = date(2026, 1, 1) + timedelta(days=rng.randint(0, 89))
            eff_s = eff.isoformat()
        elif d < 0.85:
            eff = date(2025, 6, 1) + timedelta(days=rng.randint(0, 500))
            eff_s = eff.isoformat()
        elif d < 0.92:
            eff_s = None
        else:
            eff_s = "not-a-date"  # TRY_CAST must null this
        exp_s = (
            None
            if rng.random() < 0.4
            else ("9999-12-31" if rng.random() < 0.2 else "2026-06-30")
        )
        all_false = rng.random() < 0.05
        rows.append(
            {
                "product_id": pid,
                "location_id": lid,
                "item_id": pid if rng.random() < 0.9 else f"{i:013d}",
                "size": rng.choice(["1 gal", "12 oz", "6 ct", "1 lb"]),
                "regular_price": regular,
                "promo_price": promo,
                "effective_date": eff_s,
                "expiration_date": exp_s,
                "fulfillment_instore": False if all_false else rng.random() < 0.7,
                "fulfillment_delivery": False if all_false else rng.random() < 0.5,
                "fulfillment_curbside": False if all_false else rng.random() < 0.6,
                "fulfillment_shiptohome": False if all_false else rng.random() < 0.3,
                "stock_level": None if rng.random() < 0.05 else rng.choice(STOCK_LEVELS),
                "fetched_at": BASE_TS + timedelta(seconds=i),
            }
        )
    # duplicate composite PKs with later fetched_at (upsert fodder)
    for i in range(0, min(n, 200), 20):
        dup = dict(rows[i])
        dup["regular_price"] = dup["regular_price"] + Decimal("1.00")
        dup["fetched_at"] = BASE_TS + timedelta(days=2, seconds=i)
        rows.append(dup)
    return rows


_LOCATION_SCHEMA = pa.schema(
    [
        ("location_id", pa.string()),
        ("name", pa.string()),
        ("chain", pa.string()),
        ("address_line1", pa.string()),
        ("city", pa.string()),
        ("state", pa.string()),
        ("zip_code", pa.string()),
        ("latitude", pa.float64()),
        ("longitude", pa.float64()),
        ("fetched_at", pa.timestamp("us")),
    ]
)
_PRODUCT_SCHEMA = pa.schema(
    [
        ("product_id", pa.string()),
        ("description", pa.string()),
        ("brand", pa.string()),
        ("categories", pa.string()),
        ("fetched_at", pa.timestamp("us")),
    ]
)
_PRICE_SCHEMA = pa.schema(
    [
        ("product_id", pa.string()),
        ("location_id", pa.string()),
        ("item_id", pa.string()),
        ("size", pa.string()),
        ("regular_price", pa.decimal128(10, 2)),
        ("promo_price", pa.decimal128(10, 2)),
        ("effective_date", pa.string()),
        ("expiration_date", pa.string()),
        ("fulfillment_instore", pa.bool_()),
        ("fulfillment_delivery", pa.bool_()),
        ("fulfillment_curbside", pa.bool_()),
        ("fulfillment_shiptohome", pa.bool_()),
        ("stock_level", pa.string()),
        ("fetched_at", pa.timestamp("us")),
    ]
)


def gen_location_payloads(rng: random.Random, n: int) -> list[dict]:
    """Nested location payloads incl. duplicate ids across 'zip queries'
    (first-seen dedup fodder), missing address/geolocation structs, and
    ~2% missing locationId (gate fodder)."""
    out = []
    ids: list[str] = []
    for seq in range(n):
        if ids and rng.random() < 0.25:  # re-fetch of an already-seen store
            lid = rng.choice(ids)
            name = f"DUPE SHOULD LOSE #{seq}"
        else:
            lid = f"{20000000 + seq:08d}"
            ids.append(lid)
            name = f"Store {seq}"
        loc: dict = {"locationId": None if rng.random() < 0.02 else lid,
                     "name": name,
                     "chain": rng.choice(CHAINS)}
        if rng.random() >= 0.08:  # some payloads lack the address struct
            loc["address"] = {
                "addressLine1": f"{seq} Market St",
                "city": f"City{seq % 23}",
                "state": STATES[seq % len(STATES)],
                "zipCode": f"{60000 + seq % 997:05d}",
            }
            if rng.random() < 0.1:
                del loc["address"]["zipCode"]
        if rng.random() >= 0.06:
            loc["geolocation"] = {
                "latitude": round(rng.uniform(25, 48), 6),
                "longitude": round(rng.uniform(-124, -71), 6),
            }
        out.append({"fetch_seq": seq, "location": loc})
    return out


def gen_product_payloads(rng: random.Random, n: int) -> list[dict]:
    """Nested product payloads with every S7/S8 edge: missing productId,
    empty/missing items, missing price.regular, dateValueModel variants,
    missing fulfillment/inventory/categories."""
    out = []
    for seq in range(n):
        prod: dict = {}
        if rng.random() >= 0.015:
            prod["productId"] = f"{2000000000000 + seq % 450:013d}"
        prod["description"] = f"Payload product {seq}"
        if rng.random() >= 0.1:
            prod["brand"] = f"Brand{seq % 19}"
        r = rng.random()
        if r < 0.05:
            pass  # categories key absent entirely
        elif r < 0.1:
            prod["categories"] = []
        else:
            prod["categories"] = rng.sample(CATEGORIES, rng.choice([1, 1, 2]))
        if rng.random() >= 0.05:  # some payloads have no items at all
            item: dict = {"itemId": f"{seq:013d}", "size": rng.choice(["1 gal", "12 oz"])}
            if rng.random() >= 0.08:  # some items lack the price struct
                price: dict = {}
                if rng.random() >= 0.1:  # some lack regular (gate: no row)
                    price["regular"] = rng.randint(50, 6000) / 100
                if rng.random() < 0.45:
                    price["promo"] = rng.randint(25, 5000) / 100
                d = rng.random()
                if d < 0.7:
                    price["effectiveDate"] = {
                        "value": f"2026-0{rng.randint(1, 3)}-{rng.randint(1, 28):02d}",
                        "timezone": "America/New_York",
                    }
                elif d < 0.8:  # dateValueModel without a value field
                    price["effectiveDate"] = {"timezone": "UTC"}
                if rng.random() < 0.5:
                    price["expirationDate"] = {"value": "2026-06-30"}
                item["price"] = price
            if rng.random() >= 0.07:
                item["fulfillment"] = {
                    "curbside": rng.random() < 0.6,
                    "delivery": rng.random() < 0.5,
                    "instore": rng.random() < 0.7,
                    "shiptohome": rng.random() < 0.3,
                }
            if rng.random() >= 0.1:
                item["inventory"] = {"stockLevel": rng.choice(STOCK_LEVELS)}
            # a second item that must be IGNORED (reference takes items[0])
            items = [item]
            if rng.random() < 0.15:
                items.append({"itemId": "IGNORED", "price": {"regular": 1.0}})
            prod["items"] = items
        out.append(
            {
                "fetch_seq": seq,
                "location_id": f"{20000000 + seq % 40:08d}",
                "product": prod,
            }
        )
    return out


def write_payload_fixtures(
    out_dir: str, seed: int = 77, n_locations: int = 90, n_products: int = 600
) -> dict[str, str]:
    """Write the nested JSONL payload fixtures (ingest replay inputs)."""
    rng = random.Random(seed)
    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    for name, rows in [
        ("locations_payload", gen_location_payloads(rng, n_locations)),
        ("products_payload", gen_product_payloads(rng, n_products)),
    ]:
        path = os.path.join(out_dir, f"{name}.jsonl")
        with open(path, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        paths[name] = path
    return paths


def write_raw_tables(
    out_dir: str, seed: int = 42, n_locations: int = 60, n_products: int = 400, n_prices: int = 4000
) -> dict[str, str]:
    """Generate and write the three raw tables as parquet; returns paths."""
    rng = random.Random(seed)
    locations = gen_locations(rng, n_locations)
    products = gen_products(rng, n_products)
    prices = gen_prices(rng, products, locations, n_prices)
    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    for name, rows, schema in [
        ("raw_locations", locations, _LOCATION_SCHEMA),
        ("raw_products", products, _PRODUCT_SCHEMA),
        ("raw_product_prices", prices, _PRICE_SCHEMA),
    ]:
        path = os.path.join(out_dir, f"{name}.parquet")
        cols = {f.name: [r[f.name] for r in rows] for f in schema}
        pq.write_table(pa.table(cols, schema=schema), path)
        paths[name] = path
    return paths
