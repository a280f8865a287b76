#!/usr/bin/env python3
"""Round-13 optimization profiler: per-query plan shape + job/stage/task
counts + timed noop-write medians for the headline set.

For each headline query it records, in bench posture (cached tables,
static planning, sized shuffle partitions):

- ``plans/r13/<query>_<tag>.txt`` — ``explain("formatted")`` output;
- jobs / stages / tasks triggered by ONE noop-write execution (via a
  per-query job group + the status tracker) — the fixed-overhead
  multiplier a contended scheduler pays per query;
- Exchange / BroadcastExchange / scan counts parsed from the plan;
- median wall time of N noop writes.

Usage: python scripts/r13_profile.py <tag> [query ...]
Env:   SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as bench.py.
Writes plans/r13/profile_<tag>.json and the per-query plan files.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPEATS = int(os.environ.get("SPARK_GRAFT_REPEATS", "3"))

# bench posture (mirrors bench.py's env defaults)
os.environ.setdefault("SPARK_GRAFT_CACHE_TABLES", "1")
os.environ.setdefault("SPARK_GRAFT_PLAN_CACHE", "1")
os.environ.setdefault("SPARK_GRAFT_AQE", "0")


def _sized_shuffle_partitions(sf_dir: str) -> str:
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
    return str(min(CPUS, max(8, total // (64 * 1024 * 1024))))


os.environ.setdefault(
    "SPARK_GRAFT_SHUFFLE_PARTITIONS", _sized_shuffle_partitions(SF_DIR)
)

from _provenance import provenance  # noqa: E402

from product_data_pipelining_spark.registry import all_queries  # noqa: E402
from product_data_pipelining_spark.session import get_spark  # noqa: E402

HEADLINE_DEFAULT = [
    "tpch_q1_pricing_summary", "tpch_q3_shipping_priority",
    "tpch_q5_regional_revenue", "a03_percentile_summary",
    "a11_share_of_group_window", "s05_upsert_last_writer_wins",
    "ev02_sessionize", "dd01_exact_dedup", "dd04_minhash_lsh_pairs",
    "dd09_minhash_lsh_pairs_xxh", "dd10_bloom_decontaminate",
    "tx02_quality_score", "tx11_corpus_filter_pipeline",
    "ev05_funnel_conversion", "sim01_ann_bruteforce_topk",
    "sim02_ann_lsh_bucketed", "sim02x_ann_lsh_bucketed_np",
    "tp02_resample_gapfill", "sim06_pq_adc", "sim05_kmeans_assign",
    "sim07_ann_ivfpq", "sim08_ann_ivfpq_rerank", "sim09_knn_graph",
    "dd13_semantic_dedup", "dd14_incremental_ingest_dedup",
    "mm02_decode_features", "pipe02_curation_funnel_lsh",
    "sim10_mmr_diverse_topk", "sim11_hard_negatives",
    "tx16_bigram_logprob",
]

_PLAN_NODE_RE = re.compile(r"^\s*\(\d+\)\s+(\S+)", re.MULTILINE)


def plan_counts(plan: str) -> dict:
    nodes = _PLAN_NODE_RE.findall(plan)
    def n(prefix: str) -> int:
        return sum(1 for x in nodes if x.startswith(prefix))
    return {
        "exchanges": n("Exchange"),
        "broadcast_exchanges": n("BroadcastExchange"),
        "sorts": n("Sort"),
        "scans": sum(1 for x in nodes if x.startswith(("Scan", "InMemoryTableScan"))),
        "joins": sum(1 for x in nodes if "Join" in x),
        "python_eval": sum(
            1 for x in nodes
            if x.startswith(("BatchEvalPython", "ArrowEvalPython", "MapInArrow",
                             "MapInPandas", "FlatMapGroupsInPandas",
                             "FlatMapCoGroupsInPandas"))
        ),
        "aggregates": n("HashAggregate") + n("SortAggregate") + n("ObjectHashAggregate"),
        "windows": n("Window"),
        "total_nodes": len(nodes),
    }


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or HEADLINE_DEFAULT
    specs = all_queries()
    spark = get_spark(app_name=f"r13-profile-{tag}", cpus=CPUS)
    sc = spark.sparkContext
    out_dir = Path(__file__).resolve().parent.parent / "plans" / "r13"
    out_dir.mkdir(parents=True, exist_ok=True)

    def run(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # warm every requested query once (JIT, codegen, table caches)
    for name in names:
        try:
            run(specs[name].fn(spark, SF_DIR))
        except Exception as exc:
            print(f"# warmup {name} failed: {exc}", file=sys.stderr)

    results: dict[str, dict] = {}
    tracker = sc.statusTracker()
    for name in names:
        spec = specs[name]
        df = spec.fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out_dir / f"{name}_{tag}.txt").write_text(plan)

        group = f"r13prof-{name}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        run(df)
        first = time.perf_counter() - t0
        sc.setJobGroup("", "")
        job_ids = tracker.getJobIdsForGroup(group)
        n_stages = 0
        n_tasks = 0
        for jid in job_ids:
            ji = tracker.getJobInfo(jid)
            if ji is None:
                continue
            for sid in ji.stageIds:
                si = tracker.getStageInfo(sid)
                if si is not None:
                    n_stages += 1
                    n_tasks += si.numTasks

        samples = [first]
        for _ in range(max(0, REPEATS - 1)):
            t0 = time.perf_counter()
            run(df)
            samples.append(time.perf_counter() - t0)
        med = statistics.median(samples)
        results[name] = {
            "median_sec": round(med, 3),
            "samples": [round(s, 3) for s in samples],
            "jobs": len(job_ids),
            "stages": n_stages,
            "tasks": n_tasks,
            **plan_counts(plan),
        }
        print(
            f"# {name}: {med:.3f}s jobs={len(job_ids)} stages={n_stages} "
            f"tasks={n_tasks} exch={results[name]['exchanges']} "
            f"bcast={results[name]['broadcast_exchanges']}",
            file=sys.stderr,
        )
        spark._jvm.System.gc()

    payload = {
        "metric": "r13_profile",
        "tag": tag,
        "sf": SF_DIR,
        "cpus": CPUS,
        "repeats": REPEATS,
        "queries": results,
        "provenance": provenance(),
    }
    out = out_dir / f"profile_{tag}.json"
    out.write_text(json.dumps(payload, indent=1))
    print(json.dumps({"written": str(out), "n": len(results)}))
    spark.stop()


if __name__ == "__main__":
    main()
