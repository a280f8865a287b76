#!/usr/bin/env python3
"""Targeted oracle-parity check for the queries a round-12 optimization
touches: run each named query on Spark and its DuckDB oracle on the
same parquet and frame-compare under the driver's contract.

Usage: python scripts/r12_targeted_check.py <sf_dir> <query> [query ...]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("SPARK_GRAFT_CACHE_TABLES", "1")
os.environ.setdefault("SPARK_GRAFT_AQE", "0")
os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")

import duckdb  # noqa: E402

from product_data_pipelining_spark.checks.oracle_compare import (  # noqa: E402
    duck_view_sql,
    frames_match,
)
from product_data_pipelining_spark.io import TPCH_TABLES  # noqa: E402
from product_data_pipelining_spark.registry import all_queries  # noqa: E402
from product_data_pipelining_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    specs = all_queries()
    spark = get_spark(app_name="r12-targeted-check", cpus=32)
    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.execute(duck_view_sql(sf_dir, t))
    bad = 0
    for name in names:
        spec = specs[name]
        t0 = time.time()
        got = spec.fn(spark, sf_dir).toPandas()
        t1 = time.time()
        if spec.oracle is None:
            print(f"{name}: rows_only n={len(got)} ({t1 - t0:.1f}s)")
            continue
        want = con.execute(spec.oracle).fetch_df()
        ok, why = frames_match(got, want)
        print(f"{name}: {'MATCH' if ok else 'MISMATCH ' + why} "
              f"n={len(got)} ({t1 - t0:.1f}s)")
        bad += 0 if ok else 1
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
