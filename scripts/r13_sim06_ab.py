#!/usr/bin/env python3
"""A/B for the r13 sim06 wide-ADC restructure (verdict ask #4).

Round 13 re-expresses sim06's ADC scoring: instead of the r12 shape —
groupBy(vec_id, m) argmin → broadcast equi-join on (m, code)=(m, c)
(|corpus| x PQ_M x |queries| joined rows) → groupBy(query_id, vec_id)
SUM — the corpus codes fold into ONE wide row per vector in a single
aggregation over the distance grid, the per-query LUT packs into one
PQ_M*PQ_K-long array, and the ADC sum is PQ_M O(1) array lookups in a
codegen'd projection over the |corpus| x |queries| candidate rows.
Same exact BIGINT arithmetic, same output; two exchanges and the
biggest join+hash-aggregate intermediate removed.

Arms in ONE process: "r12" = the old tail reconstructed verbatim from
the r12 code below; "wide" = the registered query. Output frames are
compared for exact equality before timing; reps alternate the leading
arm.

Usage: python scripts/r13_sim06_ab.py [--dir /tmp/sf10] [--reps 5]
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
os.environ["SPARK_GRAFT_PLAN_CACHE"] = "0"  # arms must not share plans
os.environ.setdefault("SPARK_GRAFT_AQE", "0")

from _provenance import provenance  # noqa: E402


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


def r12_sim06(spark, sf_dir):
    """The round-12 sim06 tail, verbatim (narrow enc + (m, code) join +
    sum aggregate), over the same encode front end."""
    from pyspark.sql import Column, Window
    from pyspark.sql import functions as F

    from product_data_pipelining_spark.operators.similarity import (
        PQ_K,
        PQ_M,
        PQ_MAX_QUERIES,
        PQ_SUB,
        QUERY_STRIDE,
        TOP_K,
        _pq_seeds,
        _pq_subvectors,
        _with_norm,
    )
    from product_data_pipelining_spark.functions.rounding import _scaled_long

    v = _with_norm(spark, sf_dir).select(
        "vec_id",
        F.transform(
            "embedding", lambda x: x.cast("double") / F.col("nrm")
        ).alias("embedding"),
    )
    seeds = _pq_seeds(v, "c")
    cent_sub = seeds.select(
        "c", F.posexplode(_pq_subvectors(F.col("embedding"))).alias("m", "cv")
    )
    sub_tbl = v.select(
        "vec_id",
        F.posexplode(_pq_subvectors(F.col("embedding"))).alias("m", "sv"),
    )
    l2: Column = F.lit(0.0)
    for _i in range(PQ_SUB):
        _d = (
            F.col("sv").getItem(_i).cast("double")
            - F.col("cv").getItem(_i).cast("double")
        )
        l2 = l2 + _d * _d
    dist = sub_tbl.join(F.broadcast(cent_sub), "m").select(
        "vec_id", "m", "c", _scaled_long(l2).cast("long").alias("d6")
    )
    enc = (
        dist.groupBy("vec_id", "m")
        .agg(F.min(F.col("d6") * PQ_K + F.col("c")).alias("pc"))
        .select(
            "vec_id", "m", (F.col("pc") % PQ_K).cast("int").alias("code")
        )
    )
    lut = dist.filter(
        (F.col("vec_id") % QUERY_STRIDE == 0)
        & (F.col("vec_id") < QUERY_STRIDE * PQ_MAX_QUERIES)
    ).select(F.col("vec_id").alias("query_id"), "m", "c", "d6")
    scored = (
        enc.join(
            F.broadcast(lut),
            (enc.m == lut.m)
            & (enc.code == lut.c)
            & (enc.vec_id != lut.query_id),
        )
        .groupBy("query_id", "vec_id")
        .agg(F.sum("d6").alias("s6"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("s6"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (F.col("s6").cast("double") / F.lit(1e6)).alias("adc_dist"),
            "rank",
        )
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/sf10")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument(
        "--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    args = ap.parse_args()
    os.environ.setdefault(
        "SPARK_GRAFT_SHUFFLE_PARTITIONS",
        _sized_shuffle_partitions(args.dir, args.cpus),
    )

    from product_data_pipelining_spark.registry import all_queries
    from product_data_pipelining_spark.session import get_spark

    specs = all_queries()
    spark = get_spark(app_name="r13-sim06-ab", cpus=args.cpus)

    dfs = {
        "r12": r12_sim06(spark, args.dir),
        "wide": specs["sim06_pq_adc"].fn(spark, args.dir),
    }
    plans = {
        k: dfs[k]._jdf.queryExecution().executedPlan().toString() for k in dfs
    }
    exchanges = {k: plans[k].count("Exchange") for k in dfs}

    a = {tuple(r) for r in dfs["r12"].collect()}
    b = {tuple(r) for r in dfs["wide"].collect()}
    if a != b:
        print(json.dumps({"metric": "r13_sim06_ab", "error": "MISMATCH",
                          "r12_rows": len(a), "wide_rows": len(b)}))
        raise SystemExit(1)

    def noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    for df in dfs.values():
        noop(df)

    t = {k: [] for k in dfs}
    keys = list(dfs)
    for rep in range(args.reps):
        order = keys if rep % 2 == 0 else keys[::-1]
        for k in order:
            spark.sparkContext.setJobDescription(f"r13_sim06_ab:{k}")
            t0 = time.monotonic()
            noop(dfs[k])
            t[k].append(round(time.monotonic() - t0, 3))
        spark._jvm.System.gc()
    spark.sparkContext.setJobDescription(None)

    med = {k: round(statistics.median(v), 3) for k, v in t.items()}
    print(
        json.dumps(
            {
                "metric": "r13_sim06_ab",
                "dir": args.dir,
                "cpus": args.cpus,
                "reps": args.reps,
                "rows": len(b),
                "outputs_equal": True,
                "exchange_nodes_in_plan": exchanges,
                "median_sec": med,
                "wide_over_r12": round(med["wide"] / med["r12"], 3)
                if med["r12"] > 0
                else None,
                "samples": t,
                "provenance": provenance(),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
