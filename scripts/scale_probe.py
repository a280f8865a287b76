#!/usr/bin/env python3
"""Scale probe: measure how the headline set scales from sf0.1 upward.

Generates a complete scaled directory with the deterministic distributed
generator (``sources/generator.py`` — schema-identical to the driver's
testdata, verified by ``test_generate_scale_matches_testdata_schemas``),
then runs ``bench.py`` back-to-back at the target SF and at sf0.1 under
identical machine conditions and records per-query scaling factors.

Usage:  python scripts/scale_probe.py [--sf 1] [--dir /tmp/sfN] [--regen]
Writes: BENCH_SF{N}.json at the repo root (e.g. BENCH_SF1.json,
BENCH_SF5.json).

Reading the artifact: data grows (sf/0.1)x between the runs, so a query
at or under that factor in wall-time is linear-or-better; sort-based
operators (exact percentile) legitimately run at ~n log n. Each run
also carries its own in-process interleaved DuckDB baseline, so
``ratio_vs_duckdb`` stays contention-robust at every scale factor.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
TESTDATA_SF01 = "/root/testdata/sf0.1"


def run_bench(sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        env=env, capture_output=True, text=True, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


# value-compare is driver-bounded (both result sets come to pandas);
# headline outputs are aggregate-sized except sessionize, which grows
# with users — above this cap record a distributed row-count check only.
# normalize() is vectorized (checks/oracle_compare._canon_series), so
# 10M rows x a handful of columns compares in tens of seconds / a few
# GB of driver memory; the cap guards the truly unbounded case.
MAX_COMPARE_ROWS = 10_000_000


def run_correctness(sf_dir: str) -> dict:
    """Value-level oracle parity for the headline set AT the probe SF.

    The driver verifies correctness at sf0.01; this re-runs the same
    contract (shared ``checks.oracle_compare`` normalization — sorted
    columns, canonical cells, sorted rows) against DuckDB on the
    generated data, so the artifact carries "still CORRECT at 10-50x",
    not just "still fast". In-process, after the benches, so timing is
    unaffected.
    """
    sys.path.insert(0, str(REPO))
    import duckdb

    from bench import HEADLINE
    from product_data_pipelining_spark.checks.oracle_compare import (
        duck_view_sql,
        frames_match,
    )
    from product_data_pipelining_spark.io import TPCH_TABLES
    from product_data_pipelining_spark.registry import all_queries
    from product_data_pipelining_spark.session import get_spark

    specs = all_queries()
    spark = get_spark(app_name="pdp-scale-check", cpus=int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")
    ))
    con = duckdb.connect()
    # cap DuckDB beside the live Spark JVM and let heavy oracles spill
    # to disk instead of OOM-ing the whole probe
    con.execute("SET memory_limit='24GB'")
    con.execute("SET temp_directory='/tmp/duck_spill'")
    for t in TPCH_TABLES:
        con.execute(duck_view_sql(sf_dir, t))

    results: dict[str, str] = {}
    for name in HEADLINE:
        spec = specs[name]
        try:
            df = spec.fn(spark, sf_dir)
            if spec.oracle is None:
                results[name] = f"rows_only:{df.count()}"
                continue
            n = df.count()
            want_n = con.execute(
                f"SELECT COUNT(*) FROM ({spec.oracle})"
            ).fetchone()[0]
            if n > MAX_COMPARE_ROWS:
                results[name] = (
                    f"rowcount_only:{n}" if n == want_n
                    else f"ROWCOUNT_MISMATCH:{n}!={want_n}"
                )
                continue
            if n != want_n:
                results[name] = f"ROWCOUNT_MISMATCH:{n}!={want_n}"
                continue
            ok, reason = frames_match(
                df.toPandas(), con.execute(spec.oracle).df()
            )
            results[name] = "match" if ok else f"MISMATCH:{reason}"
        except Exception as exc:  # noqa: BLE001 — one query's resource
            # blow-up (DuckDB OOM running a heavyweight oracle next to
            # the live JVM) must not lose the whole artifact; record it
            # honestly and move on. MISMATCH stays a loud string the
            # summary counts; check_error does too.
            results[name] = f"check_error:{type(exc).__name__}"
    con.close()
    return results


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0,
                    help="target scale factor (sf0.1 is the baseline side)")
    ap.add_argument("--dir", default=None,
                    help="directory for the generated data "
                         "(default /tmp/sf{N})")
    ap.add_argument("--regen", action="store_true",
                    help="regenerate the scaled data even if the "
                         "directory exists")
    ap.add_argument("--no-check", action="store_true",
                    help="skip the at-scale value-level oracle check")
    args = ap.parse_args()

    sf_label = f"{args.sf:g}".replace(".", "_")
    big_dir = args.dir or f"/tmp/sf{sf_label}"

    if args.regen or not os.path.isdir(big_dir):
        subprocess.run(
            [sys.executable, "-m",
             "product_data_pipelining_spark.sources.generator",
             "--sf", f"{args.sf:g}", "--out", big_dir],
            cwd=REPO, check=True,
        )

    big = run_bench(big_dir)
    sf01 = run_bench(TESTDATA_SF01)

    factor = args.sf / 0.1
    scaling = {
        q: round(big["queries"][q] / sf01["queries"][q], 2)
        for q in big["queries"]
        if sf01.get("queries", {}).get(q)
    }
    artifact = {
        "metric": f"sf{sf_label}_scale_probe",
        "data_scale_factor": round(factor, 2),
        f"sf{sf_label}": big,
        "sf0_1": sf01,
        "per_query_time_scaling": scaling,
        "worst_scaling": max(scaling.values()),
        "notes": (
            "Back-to-back runs on the same machine; each bench carries "
            "its own interleaved in-process DuckDB baseline, so judge "
            "ratio_vs_duckdb per SF, not absolute seconds. Scaling at or "
            f"under ~{factor:g}x is linear-or-better for {factor:g}x "
            "data; exact-percentile a03 runs at ~n log n by design."
        ),
    }
    # Write the bench results BEFORE the correctness stage: the benches
    # are ~an hour of wall-clock at sf5+, and a crash in the at-scale
    # oracle re-check (e.g. DuckDB OOM beside a live Spark JVM) must
    # not lose them. The file is rewritten with the extra key after.
    out_path = REPO / f"BENCH_SF{sf_label}.json"
    out_path.write_text(json.dumps(artifact, indent=2) + "\n")
    if not args.no_check:
        artifact["correctness_at_scale"] = run_correctness(big_dir)
        out_path.write_text(json.dumps(artifact, indent=2) + "\n")
    summary = {"artifact": out_path.name,
               "worst_scaling": artifact["worst_scaling"],
               "big_ratio_vs_duckdb": big["ratio_vs_duckdb"],
               "sf0_1_ratio_vs_duckdb": sf01["ratio_vs_duckdb"]}
    if "correctness_at_scale" in artifact:
        vals = list(artifact["correctness_at_scale"].values())
        summary["correct_at_scale"] = (
            f"{sum(v == 'match' for v in vals)}/{len(vals)} match, "
            f"{sum('MISMATCH' in v for v in vals)} mismatched, "
            f"{sum('check_error' in v for v in vals)} check_error"
        )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
