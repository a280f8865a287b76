#!/usr/bin/env python3
"""At-scale A/B for the r12 MinHash numeric-min rewrite (verdict ask #5).

Round 12 replaced the md5 signature build's ``min`` over STRING hex
windows (variable-width agg buffer → SortAggregate fallback: a full
sort of the exploded shingle table) with ``min`` over
``conv(hex,16,10)::decimal(20,0)`` (fixed-width buffer → codegen'd
partial HashAggregate), reconstructing the exact hex after the final
aggregation. At sf0.1 the shingle table is too small for the sort to
clear the noise floor; this script puts an at-scale number on the
claim by A/B-ing the REGISTERED consumers (dd03 signature build, dd04
LSH pairs, dd14 incremental ingest) in ONE process at a big SF.

Arms: "stringmin" = the SHIPPED code (r13 reverted the md5 branch to
the string minima after this script's first sf10 run showed the
numeric form losing at scale); "numeric" = the r12 conv/decimal form,
injected by monkeypatching ``dedup.signature_from_shingles`` before
that arm's DataFrames are BUILT (plans coexist; the patch only matters
at build time). Reps alternate which arm leads. Equality gate before
timing: dd04/dd14/pipe02 outputs row-compared across arms at the probe
SF (dd03's signatures feed all of them, so their parity is covered
transitively; it is also pinned vs the DuckDB oracle in the sweeps).

Usage: python scripts/r13_minhash_ab.py [--dir /tmp/sf10] [--reps 5]
Prints one JSON line with provenance.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

os.environ.setdefault("SPARK_GRAFT_CACHE_TABLES", "1")
# plan cache OFF: it memoizes per (name, sf_dir), so the second arm
# would silently reuse the first arm's plans (the plan-sanity block
# below caught exactly that on the first run of this script)
os.environ["SPARK_GRAFT_PLAN_CACHE"] = "0"
os.environ.setdefault("SPARK_GRAFT_AQE", "0")

from _provenance import provenance  # noqa: E402

QUERIES = (
    "dd03_minhash_signatures",
    "dd04_minhash_lsh_pairs",
    "dd14_incremental_ingest_dedup",
    "pipe02_curation_funnel_lsh",
)
EQUALITY_GATED = (
    "dd04_minhash_lsh_pairs",
    "dd14_incremental_ingest_dedup",
    "pipe02_curation_funnel_lsh",
)


def _sized_shuffle_partitions(sf_dir: str, cpus: int) -> str:
    total = 0
    try:
        for root, _dirs, files in os.walk(sf_dir):
            total += sum(
                os.path.getsize(os.path.join(root, f))
                for f in files
                if not f.startswith((".", "_"))
            )
    except OSError:
        pass
    return str(min(cpus, max(8, total // (64 * 1024 * 1024))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/sf10")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument(
        "--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    ap.add_argument(
        "--queries", default=None,
        help="comma-separated subset of the default query list",
    )
    args = ap.parse_args()
    global QUERIES, EQUALITY_GATED
    if args.queries:
        picked = tuple(q.strip() for q in args.queries.split(","))
        unknown = [q for q in picked if q not in QUERIES]
        assert not unknown, unknown
        QUERIES = picked
        EQUALITY_GATED = tuple(q for q in EQUALITY_GATED if q in picked)
    os.environ.setdefault(
        "SPARK_GRAFT_SHUFFLE_PARTITIONS",
        _sized_shuffle_partitions(args.dir, args.cpus),
    )

    from pyspark.sql import functions as F

    from product_data_pipelining_spark.operators import dedup
    from product_data_pipelining_spark.registry import all_queries
    from product_data_pipelining_spark.session import get_spark

    shipped_sig = dedup.signature_from_shingles

    def numeric_sig(sh_arr, hash_mode="xxhash64"):
        """The r12 md5 form: min over conv(hex,16,10)::decimal(20,0)
        with a hex round-trip after the final aggregation (codegen'd
        partial HashAggregate). Non-md5 modes delegate."""
        if hash_mode != "md5":
            return shipped_sig(sh_arr, hash_mode)
        ex = sh_arr.select("doc_id", F.explode("sh").alias("s"))
        digests = ex.select("doc_id", F.md5("s").alias("dg"))
        mins = digests.groupBy("doc_id").agg(
            *[
                F.min(
                    F.conv(
                        F.substring("dg", o, dedup._SLICE_LEN), 16, 10
                    ).cast("decimal(20,0)")
                ).alias(f"n{j}")
                for j, o in enumerate(dedup._SLICE_OFFSETS)
            ]
        )
        return mins.select(
            "doc_id",
            *[
                F.lpad(
                    F.lower(F.conv(F.col(f"n{j}").cast("string"), 10, 16)),
                    dedup._SLICE_LEN,
                    "0",
                ).alias(f"h{j}")
                for j in range(dedup.NUM_MINHASH)
            ],
        )

    specs = all_queries()
    spark = get_spark(app_name="r13-minhash-ab", cpus=args.cpus)

    dfs: dict[tuple[str, str], object] = {}
    dedup.signature_from_shingles = numeric_sig
    try:
        for name in QUERIES:
            dfs[(name, "numeric")] = specs[name].fn(spark, args.dir)
    finally:
        dedup.signature_from_shingles = shipped_sig
    for name in QUERIES:
        dfs[(name, "stringmin")] = specs[name].fn(spark, args.dir)

    # plan sanity: the stringmin arm must carry the SortAggregate the
    # numeric arm removed — otherwise the A/B measures nothing
    plans = {
        k: dfs[k]._jdf.queryExecution().executedPlan().toString()
        for k in dfs
    }
    sort_aggs = {
        f"{n}:{a}": plans[(n, a)].count("SortAggregate")
        for n in QUERIES
        for a in ("stringmin", "numeric")
    }
    # plan sanity: the arms must actually differ — the stringmin arm
    # carries the SortAggregate fallback the numeric arm avoids (the
    # first run of this script was silently comparing an arm to itself
    # through the registry plan cache; never again)
    for n in QUERIES:
        assert sort_aggs[f"{n}:stringmin"] > sort_aggs[f"{n}:numeric"], (
            n, sort_aggs
        )

    # equality gate on the two bounded-output consumers
    mismatch = []
    for name in EQUALITY_GATED:
        a = {tuple(r) for r in dfs[(name, "numeric")].collect()}
        b = {tuple(r) for r in dfs[(name, "stringmin")].collect()}
        if a != b:
            mismatch.append(name)
    if mismatch:
        print(json.dumps({"metric": "r13_minhash_ab", "error": mismatch}))
        raise SystemExit(1)

    def noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    for df in dfs.values():
        noop(df)

    t: dict[tuple[str, str], list[float]] = {k: [] for k in dfs}
    keys = list(dfs)
    for rep in range(args.reps):
        order = keys if rep % 2 == 0 else keys[::-1]
        for k in order:
            spark.sparkContext.setJobDescription(f"r13_minhash_ab:{k[0]}:{k[1]}")
            t0 = time.monotonic()
            noop(dfs[k])
            t[k].append(round(time.monotonic() - t0, 3))
        spark._jvm.System.gc()
    spark.sparkContext.setJobDescription(None)

    out = {
        "metric": "r13_minhash_ab",
        "dir": args.dir,
        "cpus": args.cpus,
        "reps": args.reps,
        "equality_gated": list(EQUALITY_GATED),
        "sort_aggregates_in_plan": sort_aggs,
        "queries": {},
    }
    for name in QUERIES:
        sm = round(statistics.median(t[(name, "stringmin")]), 3)
        nm = round(statistics.median(t[(name, "numeric")]), 3)
        out["queries"][name] = {
            "stringmin_median_sec": sm,
            "numeric_median_sec": nm,
            "numeric_over_stringmin": round(nm / sm, 3) if sm > 0 else None,
            "stringmin_samples": t[(name, "stringmin")],
            "numeric_samples": t[(name, "numeric")],
        }
    out["provenance"] = provenance()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
