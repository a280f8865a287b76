#!/usr/bin/env python3
"""Assemble BENCH_R12_AB_SF5.json from four alternating bench.py legs at sf5.

Legs (run adjacent in time, same box, alternating arms to cancel drift):
  /tmp/ab_sf5_pre1.json   pre-optimization commit (bed8be3) worktree
  /tmp/ab_sf5_head1.json  final round-12 code (/root/repo HEAD)
  /tmp/ab_sf5_pre2.json   pre-optimization again
  /tmp/ab_sf5_head2.json  final again

Each leg is a full bench.py run (noop-sink Spark timing + interleaved DuckDB
CTAS baseline) with SPARK_GRAFT_SF_DIR=/tmp/sf5, SPARK_GRAFT_CPUS=32 — the
same contract the driver uses. Per-arm summary = min of the two legs per
query (min, not mean: on a contended box the smaller time is the better
estimate of the code's cost; both raw legs are kept in `runs`).
"""
import json
import subprocess
import sys
from datetime import datetime, timezone

LEGS = {
    "preopt_run1": "/tmp/ab_sf5_pre1.json",
    "head_run1": "/tmp/ab_sf5_head1.json",
    "preopt_run2": "/tmp/ab_sf5_pre2.json",
    "head_run2": "/tmp/ab_sf5_head2.json",
}


def load(path):
    with open(path) as f:
        return json.loads(f.read().strip().splitlines()[-1])


def arm_summary(*legs):
    """Per-query min across the arm's legs, plus oracled totals."""
    queries = {k: round(min(lg["queries"][k] for lg in legs), 3)
               for k in legs[0]["queries"]}
    duck = {k: round(min(lg["duckdb_queries"][k] for lg in legs), 3)
            for k in legs[0]["duckdb_queries"]}
    spark_oracled = round(sum(queries[k] for k in duck), 3)
    duck_total = round(sum(duck.values()), 3)
    return {
        "spark_total_sec": round(sum(queries.values()), 3),
        "spark_oracled_sec": spark_oracled,
        "duckdb_total_sec": duck_total,
        "ratio_vs_duckdb": round(spark_oracled / duck_total, 3),
        "queries": queries,
        "duckdb_queries": duck,
    }


def main():
    import os
    runs = {k: load(v) for k, v in LEGS.items() if os.path.exists(v)}
    pre = arm_summary(*[v for k, v in runs.items() if k.startswith("preopt")])
    head = arm_summary(*[v for k, v in runs.items() if k.startswith("head")])

    per_query = {}
    for q in head["queries"]:
        row = {"preopt": pre["queries"].get(q), "head": head["queries"][q]}
        if q in head["duckdb_queries"]:
            row["duck_preopt"] = pre["duckdb_queries"].get(q)
            row["duck_head"] = head["duckdb_queries"][q]
        per_query[q] = row

    commit = subprocess.run(["git", "rev-parse", "HEAD"], cwd="/root/repo",
                            capture_output=True, text=True).stdout.strip()
    pre_commit = runs["preopt_run1"]["provenance"]["code_commit"]

    out = {
        "metric": "r12_sf5_preopt_vs_head_ab",
        "sf": "/tmp/sf5",
        "data_scale_factor": 50.0,
        "note": (f"{len(runs)} adjacent fresh-process bench.py legs at sf5 "
                 "(pre-opt then head, back-to-back on the same box, "
                 "median-of-5 per query within each leg) measuring the "
                 "round-12 optimization commit's at-scale effect. The box "
                 "drifted between legs (the interleaved DuckDB baseline "
                 "itself moved 330.3 -> 246.4 s, and within each leg the "
                 "first ~4 queries ran under a contention spike), so judge "
                 "per-query: rows whose Spark delta exceeds their own DuckDB "
                 "delta are signal (tx16 2.41->1.40, pipe02 5.09->3.65, "
                 "mm02 0.51->0.34, sim10 3.96->2.50, sim02x 4.80->1.53, "
                 "sim05 0.92->0.49 — all structurally changed or "
                 "norm-unroll consumers); early-position rows (q1/q3/q5/"
                 "a03/dd10) moved WITH their baselines and are drift. "
                 "Head leg ran with README/artifact edits uncommitted "
                 "(code_dirty=true in its embedded provenance) — no query "
                 "code differed from head_commit."),
        "adjacent_ab": {
            "preopt": {"commit": pre_commit, **{k: v for k, v in pre.items()
                                                if not isinstance(v, dict)}},
            "head": {"commit": commit, **{k: v for k, v in head.items()
                                          if not isinstance(v, dict)}},
            "per_query": per_query,
        },
        "runs": runs,
        "provenance": {
            "preopt_commit": pre_commit,
            "head_commit": commit,
            "measured_utc": datetime.now(timezone.utc).isoformat(timespec="seconds"),
        },
    }
    with open("/root/repo/BENCH_R12_AB_SF5.json", "w") as f:
        json.dump(out, f, indent=1)
    print("preopt:", {k: v for k, v in pre.items() if not isinstance(v, dict)})
    print("head:  ", {k: v for k, v in head.items() if not isinstance(v, dict)})


if __name__ == "__main__":
    sys.exit(main())
