#!/usr/bin/env python3
"""sim05 baseline evidence: DuckDB twin of one Lloyd ASSIGNMENT round.

sim05 (distributed spherical k-means) is rows-only by design — no single
SQL statement expresses the iterative loop — which left its bench rows
with no comparison of any kind (round-9 verdict: 61.8 s at sf10, the
heaviest Spark row, "fast enough?" unanswerable). The assignment step IS
SQL-expressible (it is sim04's coarse-quantizer CTE verbatim), so this
probe times:

- spark_full_sim05: the ENTIRE operator (2 train rounds on the 25%
  sample + 2 codebook updates + 1 full-corpus assignment), one fresh
  JVM per leg via bench.py, median-of-REPEATS;
- duckdb_one_assignment: ONE full-corpus assignment round against the
  same seed centroids (ROUND(cosine,6) argmax, min-cent_id tiebreak —
  the `_sql_asg_cte` shape sim04's oracle uses), fresh DuckDB per leg.

The DuckDB leg is a deliberate UNDER-count of the full algorithm (it
omits the two sampled train rounds and both update aggregations), so a
Spark/duck ratio near or below ~2-3x means the full distributed loop
costs about as much as the single-process engine spends on one of its
three assignment passes. Writes SIM05_BASELINE.json.

Usage: python scripts/sim05_baseline_probe.py [--sfs 1,10] [--repeats 5]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

sys.path.insert(0, str(Path(__file__).resolve().parent))
from _provenance import provenance  # noqa: E402


def duck_twin_sql() -> str:
    sys.path.insert(0, str(REPO))
    from product_data_pipelining_spark.operators.similarity import (
        _SQL_CENT_PRED,
        _SQL_NORM,
        _sql_asg_cte,
    )

    return f"""
    WITH v AS (
      SELECT vec_id, embedding,
             {_SQL_NORM.format(a="embedding")} AS nrm
      FROM embeddings
    ),
    c AS (
      SELECT vec_id AS cent_id, embedding AS c_emb, nrm AS c_nrm
      FROM v WHERE {_SQL_CENT_PRED}
    ),
    asg AS ({_sql_asg_cte()})
    SELECT vec_id, cent_id AS cluster_id FROM asg WHERE crank = 1
    """


def time_duck(sf_dir: str, repeats: int) -> tuple[float, float]:
    """Median + rel spread of the one-assignment twin, fresh connection."""
    import duckdb

    sql = duck_twin_sql()
    emb = Path(sf_dir) / "embeddings.parquet"
    src = f"{emb}/*.parquet" if emb.is_dir() else str(emb)
    samples = []
    for _ in range(repeats):
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{src}')"
        )
        t0 = time.perf_counter()
        con.execute(f"CREATE TEMP TABLE __out AS {sql}")
        samples.append(time.perf_counter() - t0)
        con.close()
    med = statistics.median(samples)
    return round(med, 3), round((max(samples) - min(samples)) / med, 2)


def time_spark(
    sf_dir: str, repeats: int, attempts: int = 3
) -> tuple[float, float, list[float]]:
    """Full sim05: median of ATTEMPTS fresh-JVM bench legs.

    Each attempt is one bench.py child (cached tables, noop-write
    action, its own median-of-``repeats``); the reported value is the
    median of the attempt medians and the spread is computed ACROSS
    those medians. A raw-sample (max-min)/median spread grows with
    every GC outlier no matter how many repeats are added (the r10
    artifact carried 1.61/6.84 spreads from single heap-pause samples);
    the spread of the ESTIMATOR is the stable number a regression check
    needs, and the per-attempt medians are recorded so nothing hides.
    """
    meds = [_one_spark_leg(sf_dir, repeats) for _ in range(attempts)]
    med = statistics.median(meds)
    spread = round((max(meds) - min(meds)) / med, 2) if med else 0.0
    return round(med, 3), spread, [round(m, 3) for m in meds]


def _one_spark_leg(sf_dir: str, repeats: int) -> float:
    env = dict(
        os.environ,
        SPARK_GRAFT_ONLY="sim05_kmeans_assign",
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_REPEATS=str(repeats),
        SPARK_GRAFT_SKIP_DUCKDB="1",
    )
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        env=env, capture_output=True, text=True,
    )
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    if proc.returncode != 0 or not lines:
        # a misconfigured bench (e.g. SPARK_GRAFT_ONLY rejection) exits
        # with text only — surface ITS error, not an IndexError
        raise RuntimeError(
            f"bench.py emitted no JSON line (rc={proc.returncode});\n"
            f"stdout tail: {proc.stdout[-500:]}\n"
            f"stderr tail: {proc.stderr[-1000:]}"
        )
    data = json.loads(lines[-1])
    return data["queries"]["sim05_kmeans_assign"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sfs", default="1,10")
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--attempts", type=int, default=3,
                    help="fresh-JVM spark legs; the value is the median "
                         "of attempt medians, the spread is across them")
    args = ap.parse_args()
    out: dict = {
        "metric": "sim05_vs_duckdb_one_assignment_round",
        "unit": "sec",
        "note": (
            "spark_full = entire sim05 (2 sampled train rounds + 2 "
            "updates + 1 full assignment), median of N fresh-JVM "
            "bench.py legs (each itself a median-of-repeats; the "
            "per-attempt medians are recorded and the spread is across "
            "THEM — raw-sample spreads were single-GC-pause noise); "
            "duckdb_one_assignment = ONE full-corpus seed assignment "
            "round (sim04's asg CTE), fresh connection — an "
            "under-count of the full algorithm by design"
        ),
        "legs": {},
    }
    for sf in args.sfs.split(","):
        sf = sf.strip()
        sf_dir = f"/tmp/sf{sf}"
        if not Path(sf_dir).exists():
            print(f"# {sf_dir} missing — skipped", file=sys.stderr)
            continue
        s_med, s_spread, s_meds = time_spark(
            sf_dir, args.repeats, args.attempts
        )
        d_med, d_spread = time_duck(sf_dir, args.repeats)
        out["legs"][f"sf{sf}"] = {
            "spark_full_sim05_sec": s_med,
            "spark_rel_spread": s_spread,
            "spark_attempt_medians": s_meds,
            "duckdb_one_assignment_sec": d_med,
            "duckdb_rel_spread": d_spread,
            "ratio_full_vs_one_round": (
                round(s_med / d_med, 3) if d_med else None
            ),
        }
        print(f"# sf{sf}: spark full {s_med}s, duck 1-round {d_med}s",
              file=sys.stderr)
    out["provenance"] = provenance()
    (REPO / "SIM05_BASELINE.json").write_text(
        json.dumps(out, indent=2) + "\n"
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
