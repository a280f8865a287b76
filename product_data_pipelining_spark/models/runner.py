"""Pipeline runner: load → staging → dims → fact → marts (dbt replacement).

The reference sequences its DAG with in-process dbt
(``main_pipeline.py:446-477``): ``stg_* → dim_* → fact_prices → mart_*``
with ``--full-refresh`` (every mart rebuilt from scratch). Here the DAG
is an explicit toposorted call list of pure DataFrame functions — the
models stay lazy logical plans until materialization, so Catalyst
optimizes across layer boundaries (e.g. a mart's category filter reaches
the raw parquet scan through staging and the fact join).

Load semantics (``main_pipeline.py:326-440``): rows are null-gated (S8)
then upserted with ``INSERT OR REPLACE`` per primary key. On Spark the
upsert is deterministic last-writer-wins
(:func:`..operators.upsert.upsert_last_writer_wins`) keyed like the
reference DDL (``main_pipeline.py:283,297,320``).

Materialization mirrors dbt's config (``dbt_project.yml:33-40``):
staging = never persisted (views); dims/fact/marts = parquet tables,
``mode("overwrite")`` = full refresh. When materializing, downstream
marts re-read the written fact table so the join work is done once, not
re-derived three times.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.upsert import upsert_last_writer_wins
from . import dashboard, marts, staging

RAW_TABLES = ("raw_locations", "raw_products", "raw_product_prices")

# (upsert primary key, null-gate column) per raw table — reference DDL
# main_pipeline.py:283 (locations PK), :297 (products PK), :320 (prices
# composite PK); null gates main_pipeline.py:379-380,398-402 (S8).
_LOAD_SPEC = {
    "raw_locations": (("location_id",), "location_id"),
    "raw_products": (("product_id",), "product_id"),
    "raw_product_prices": (
        ("product_id", "location_id", "item_id"),
        "regular_price",
    ),
}


def load_raw(spark: SparkSession, raw_dir: str) -> dict[str, DataFrame]:
    """Read the raw parquet tables and apply the reference's load rules:
    null-gate (S8) then keyed upsert, last ``fetched_at`` wins (S5/S6)."""
    out: dict[str, DataFrame] = {}
    for name in RAW_TABLES:
        df = spark.read.parquet(os.path.join(raw_dir, f"{name}.parquet"))
        keys, gate = _LOAD_SPEC[name]
        df = df.filter(F.col(gate).isNotNull())
        out[name] = upsert_last_writer_wins(
            df, keys, version_col="fetched_at", tiebreak=[c for c in df.columns]
        )
    return out


def build_models(raw: dict[str, DataFrame]) -> dict[str, DataFrame]:
    """Toposorted model build over already-loaded raw DataFrames.

    Pure and lazy — no jobs run until the caller acts on a result.
    """
    m: dict[str, DataFrame] = {}
    m["stg_locations"] = staging.stg_locations(raw["raw_locations"])
    m["stg_products"] = staging.stg_products(raw["raw_products"])
    m["stg_prices"] = staging.stg_prices(raw["raw_product_prices"])
    m["dim_locations"] = marts.dim_locations(m["stg_locations"])
    m["dim_products"] = marts.dim_products(m["stg_products"])
    m["fact_prices"] = marts.fact_prices(
        m["stg_prices"], m["dim_products"], m["dim_locations"]
    )
    m["mart_category_distribution"] = marts.mart_category_distribution(
        m["fact_prices"]
    )
    m["mart_location_sales"] = marts.mart_location_sales(
        m["fact_prices"], m["dim_locations"]
    )
    m["mart_price_by_category"] = marts.mart_price_by_category(m["fact_prices"])
    return m


MATERIALIZED = (
    "dim_locations",
    "dim_products",
    "fact_prices",
    "mart_category_distribution",
    "mart_location_sales",
    "mart_price_by_category",
)


def run_pipeline(
    spark: SparkSession, raw_dir: str, out_dir: str | None = None
) -> dict[str, DataFrame]:
    """Full-refresh pipeline run (dbt ``run --full-refresh`` analog).

    With ``out_dir`` set, dims/fact/marts are written as parquet
    (overwrite) and each written table is re-read before its dependents
    are built — the fact join executes once and the three marts scan its
    parquet output, exactly dbt's table-materialization dataflow.
    Without ``out_dir``, returns the lazy DataFrames.
    """
    raw = load_raw(spark, raw_dir)
    m = build_models(raw)
    if out_dir is None:
        return m

    def _materialize(name: str) -> DataFrame:
        path = os.path.join(out_dir, name)
        m[name].write.mode("overwrite").parquet(path)
        m[name] = spark.read.parquet(path)
        return m[name]

    _materialize("dim_locations")
    _materialize("dim_products")
    m["fact_prices"] = marts.fact_prices(
        m["stg_prices"], m["dim_products"], m["dim_locations"]
    )
    _materialize("fact_prices")
    m["mart_category_distribution"] = marts.mart_category_distribution(
        m["fact_prices"]
    )
    m["mart_location_sales"] = marts.mart_location_sales(
        m["fact_prices"], m["dim_locations"]
    )
    m["mart_price_by_category"] = marts.mart_price_by_category(m["fact_prices"])
    for name in MATERIALIZED[3:]:
        _materialize(name)
    return m


def dashboard_queries(m: dict[str, DataFrame]) -> dict[str, DataFrame]:
    """The seven dashboard chart queries over built models (app.py:81-439)."""
    price_rows = dashboard.price_distribution(m["fact_prices"], q1_2026_only=True)
    cvm = dashboard.category_value_map(m["fact_prices"])
    return {
        "price_distribution_q1": price_rows,
        "effective_date_range": dashboard.effective_date_range(m["fact_prices"]),
        "category_median_price_order": dashboard.category_median_price_order(
            dashboard.price_distribution(m["fact_prices"], q1_2026_only=False)
        ),
        "state_price_summary": dashboard.state_price_summary(
            m["mart_location_sales"]
        ),
        "location_map": dashboard.location_map(
            m["mart_location_sales"], m["dim_locations"]
        ),
        "stock_status_mix": dashboard.stock_status_mix(m["fact_prices"]),
        "discount_depth": dashboard.discount_depth(m["fact_prices"]),
        "category_value_map": cvm,
        "value_map_medians": dashboard.value_map_medians(cvm),
    }


def run_incremental(
    spark: SparkSession,
    raw_dir: str,
    out_dir: str,
    since: str,
) -> dict[str, DataFrame]:
    """Incremental refresh: merge new raw rows, rebuild downstream marts.

    The reference only does full refresh (dbt ``--full-refresh``,
    SURVEY.md §2.9); this is the incremental materialization a
    continuously-ingesting deployment needs. Raw rows with
    ``fetched_at > since`` are upserted into the existing raw snapshots
    (MERGE semantics — :func:`..operators.upsert.merge_upsert`), then
    staging/dims/fact/marts rebuild from the merged snapshot. Dims and
    marts are aggregates of the full key space, so they rebuild rather
    than merge — the fact/mart rebuild reads the merged parquet, not the
    original feed, keeping incremental cost proportional to snapshot
    size, never to history length.

    Requires a prior :func:`run_pipeline` (or ``run_incremental``) to
    have written ``out_dir/raw_*`` snapshots; writes updated snapshots
    back before rebuilding.
    """
    from ..operators.upsert import merge_upsert

    raw: dict[str, DataFrame] = {}
    for name in RAW_TABLES:
        feed = spark.read.parquet(os.path.join(raw_dir, f"{name}.parquet"))
        keys, gate = _LOAD_SPEC[name]
        fresh = feed.filter(
            F.col(gate).isNotNull() & (F.col("fetched_at") > F.lit(since))
        )
        fresh = upsert_last_writer_wins(
            fresh, keys, version_col="fetched_at",
            tiebreak=[c for c in feed.columns],
        )
        snap_path = os.path.join(out_dir, f"snap_{name}")
        snapshot = spark.read.parquet(snap_path)
        merged = merge_upsert(snapshot, fresh, keys)
        tmp = snap_path + "__new"
        merged.write.mode("overwrite").parquet(tmp)
        # swap: re-point the snapshot (atomic-rename territory on a real
        # object store; plain overwrite-by-rename locally)
        import shutil

        shutil.rmtree(snap_path)
        os.rename(tmp, snap_path)
        raw[name] = spark.read.parquet(snap_path)

    m = build_models(raw)
    for name in MATERIALIZED:
        path = os.path.join(out_dir, name)
        m[name].write.mode("overwrite").parquet(path)
        m[name] = spark.read.parquet(path)
    return m


def seed_snapshots(
    spark: SparkSession, raw_dir: str, out_dir: str, until: str | None = None
) -> None:
    """Write the initial raw snapshots ``run_incremental`` merges into.

    ``until`` bounds the seed load (``fetched_at <= until``) so tests
    can replay history as seed + incremental batches.
    """
    for name in RAW_TABLES:
        df = spark.read.parquet(os.path.join(raw_dir, f"{name}.parquet"))
        keys, gate = _LOAD_SPEC[name]
        df = df.filter(F.col(gate).isNotNull())
        if until is not None:
            df = df.filter(F.col("fetched_at") <= F.lit(until))
        df = upsert_last_writer_wins(
            df, keys, version_col="fetched_at", tiebreak=[c for c in df.columns]
        )
        df.write.mode("overwrite").parquet(os.path.join(out_dir, f"snap_{name}"))
