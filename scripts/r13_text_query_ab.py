#!/usr/bin/env python3
"""A/B the REGISTERED text queries (tx02/tx03/tx11) with the r13
mapInArrow featurization on vs off, in ONE process.

scripts/exp_text_arrow.py measures the isolated featurization kernel;
this script measures what the bench actually times — the registered
query plans in bench posture (cached tables, static planning, sized
shuffle partitions), Arrow arm (default) vs JVM arm
(SPARK_GRAFT_TEXT_ARROW=0, toggled at DataFrame-build time so both
plans coexist in one session). Reps alternate which arm leads so
neither inherits the other's cache/GC shadow; medians are reported
with raw samples so spread is visible.

Row counts are compared per query as an in-run sanity gate; the full
value-equality evidence is the committed twin test
(tests/test_plans.py::test_text_arrow_featurization_matches_jvm_twin),
the three-SF oracle MATCH runs, and exp_text_arrow.py's row-equality
gate over the full corpus.

Usage: python scripts/r13_text_query_ab.py [--dir /tmp/sf10] [--reps 7]
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

# bench posture (mirrors bench.py's env defaults) EXCEPT the plan
# cache: it memoizes per (app, sf_dir, name), so with it on the second
# arm would silently reuse the first arm's plans and the A/B would
# compare an arm against itself (caught by the plan-sanity block below)
os.environ.setdefault("SPARK_GRAFT_CACHE_TABLES", "1")
os.environ["SPARK_GRAFT_PLAN_CACHE"] = "0"
os.environ.setdefault("SPARK_GRAFT_AQE", "0")

from _provenance import provenance  # noqa: E402

QUERIES = (
    "tx02_quality_score",
    "tx03_language_id",
    "tx11_corpus_filter_pipeline",
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
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    os.environ.setdefault(
        "SPARK_GRAFT_SHUFFLE_PARTITIONS",
        _sized_shuffle_partitions(args.dir, args.cpus),
    )

    from product_data_pipelining_spark.registry import all_queries
    from product_data_pipelining_spark.session import get_spark

    specs = all_queries()
    spark = get_spark(app_name="r13-text-ab", cpus=args.cpus)

    # build both arms' plans up front (env is read at build time)
    dfs: dict[tuple[str, str], object] = {}
    for name in QUERIES:
        os.environ["SPARK_GRAFT_TEXT_ARROW"] = "0"
        dfs[(name, "jvm")] = specs[name].fn(spark, args.dir)
        os.environ["SPARK_GRAFT_TEXT_ARROW"] = "1"
        dfs[(name, "arrow")] = specs[name].fn(spark, args.dir)
    os.environ.pop("SPARK_GRAFT_TEXT_ARROW", None)

    # plan sanity: the arrow arm must actually plan MapInArrow and the
    # jvm arm must not — otherwise the A/B compares an arm to itself
    for name in QUERIES:
        pj = dfs[(name, "jvm")]._jdf.queryExecution().executedPlan().toString()
        pa = dfs[(name, "arrow")]._jdf.queryExecution().executedPlan().toString()
        assert "MapInArrow" in pa and "MapInArrow" not in pj, (
            f"{name}: arms did not plan differently (plan cache on?)"
        )

    rows = {k: dfs[k].count() for k in dfs}
    mismatched = [
        n for n in QUERIES if rows[(n, "jvm")] != rows[(n, "arrow")]
    ]
    if mismatched:
        print(json.dumps({"metric": "r13_text_query_ab", "error": mismatched}))
        raise SystemExit(1)

    def noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    for df in dfs.values():  # warm: JIT, codegen, caches, Python workers
        noop(df)

    t: dict[tuple[str, str], list[float]] = {k: [] for k in dfs}
    keys = list(dfs)
    for rep in range(args.reps):
        order = keys if rep % 2 == 0 else keys[::-1]
        for k in order:
            spark.sparkContext.setJobDescription(f"r13_text_ab:{k[0]}:{k[1]}")
            t0 = time.monotonic()
            noop(dfs[k])
            t[k].append(round(time.monotonic() - t0, 3))
        spark._jvm.System.gc()
    spark.sparkContext.setJobDescription(None)

    out = {"metric": "r13_text_query_ab", "dir": args.dir,
           "cpus": args.cpus, "reps": args.reps, "queries": {}}
    for name in QUERIES:
        jm = round(statistics.median(t[(name, "jvm")]), 3)
        am = round(statistics.median(t[(name, "arrow")]), 3)
        out["queries"][name] = {
            "rows": rows[(name, "arrow")],
            "jvm_median_sec": jm,
            "arrow_median_sec": am,
            "arrow_over_jvm": round(am / jm, 3) if jm > 0 else None,
            "jvm_samples": t[(name, "jvm")],
            "arrow_samples": t[(name, "arrow")],
        }
    out["provenance"] = provenance()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
