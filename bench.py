#!/usr/bin/env python3
"""Benchmark harness: runs the engine's headline queries and prints one JSON line.

Usage: python bench.py
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
       SPARK_GRAFT_CPUS   (default 32)

Prints {"metric": ..., "value": <spark total sec>, "unit": "sec",
        "queries": {name: sec, ...}, "sf": ...,
        "duckdb_total_sec": ..., "duckdb_queries": {...},
        "spark_oracled_sec": ..., "ratio_vs_duckdb": ...}.

The DuckDB baseline is measured IN-PROCESS, interleaved per query with the
Spark measurement, so sandbox contention (the dominant noise source on a
shared machine — rounds 2 and 3 recorded 2.7x swings on identical code)
hits both engines equally and the ratio stays meaningful even on a loaded
box. Spark times are the median of REPEATS runs; DuckDB times are the
median of DUCK_REPEATS runs of the same oracle SQL on the same parquet.
A frozen idle-machine snapshot lives in BASELINE_DUCKDB.json for
cross-checking.

Each query is materialized COMPLETELY on both engines, with no
driver/Python result conversion on either: Spark executes a noop-format
write (every column of every row computed — a count() action is NOT
used because Catalyst's join elimination + column pruning can strip
entire stages under count; pipe01's count plan at sf10 had 0 of the
full plan's 6 joins, timing the scan instead of the funnel), and DuckDB
executes CREATE TEMP TABLE AS (engine-side materialization, the
fetchall() Python-tuple tax removed — it dominated big-output oracles).

Known residual asymmetry (declared in the artifact's `methodology`
key): Spark's noop sink computes and DISCARDS rows while DuckDB's CTAS
also ALLOCATES AND STORES the result table — on big-output queries the
baseline pays a storage cost Spark doesn't, a mild pro-Spark bias. It
is accepted deliberately: every discard-style DuckDB alternative
measured something else entirely (an aggregate wrapper lets the
optimizer prune columns/joins — the exact count() bug this methodology
replaced), and the headline set's outputs are small relative to their
compute, so the skew is bounded by the result-write share of each
oracle's runtime.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent / "scripts"))

from _provenance import provenance  # noqa: E402

from product_data_pipelining_spark.io import TPCH_TABLES
from product_data_pipelining_spark.registry import all_queries
from product_data_pipelining_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# 1 = skip the in-process DuckDB baseline entirely (duckdb_total_sec = 0,
# ratio_vs_duckdb = null). Used by the CPU strong-scaling probe, which
# re-runs the Spark side at several core counts and has no use for four
# identical single-threaded baselines.
SKIP_DUCKDB = os.environ.get("SPARK_GRAFT_SKIP_DUCKDB", "0") == "1"
# Probe override for REPEATS below: multi-leg probes at big SFs trade
# median-of-5 for median-of-3 to fit several legs in one session.
_REPEATS_ENV = os.environ.get("SPARK_GRAFT_REPEATS")

# serving posture: hot base tables live in the in-memory columnar cache
# (repartitioned once at materialization) — see io.load_table — and each
# headline plan is prepared once and re-executed (registry plan cache).
# Static planning + data-sized shuffle partitions: AQE's stage-by-stage
# materialization (one scheduler job + driver replan per exchange) and
# 32-task micro-shuffles dominate sub-second queries at this SF —
# measured 11.1s -> ~3s total on this headline set. AQE remains the
# default for the batch/cluster paths (get_spark without these envs);
# at 100 TB each shuffle carries GBs per partition and AQE's runtime
# re-planning pays for itself.
os.environ.setdefault("SPARK_GRAFT_CACHE_TABLES", "1")
os.environ.setdefault("SPARK_GRAFT_PLAN_CACHE", "1")
os.environ.setdefault("SPARK_GRAFT_AQE", "0")


def _sized_shuffle_partitions(sf_dir: str) -> str:
    """Static-planning analog of AQE coalescing: shuffle partition count
    sized from the SF dir's bytes (~64 MB per partition, floor 8, cap at
    the core count) so the sf0.1 posture (8) doesn't serialize 50x data
    through 8-way exchanges when the probe reuses this harness."""
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

# headline set: one per operator family, weighted toward the shapes that
# dominate real workloads (scan-agg, star join, window, dedup, ANN, text)
HEADLINE = [
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_regional_revenue",
    "a03_percentile_summary",
    "a11_share_of_group_window",
    "s05_upsert_last_writer_wins",
    "ev02_sessionize",
    "dd01_exact_dedup",
    "dd04_minhash_lsh_pairs",
    # xxhash64 production twin of dd04: no SQL oracle (rows-only), so it
    # counts toward `value` but stays out of the DuckDB ratio; here to put
    # a wall-time number on the codegen'd-hash path (expected < dd04)
    "dd09_minhash_lsh_pairs_xxh",
    # Bloom-prefilter decontamination: dd07's exact answer in the
    # bench-set-too-big-to-broadcast regime (oracled — same SQL)
    "dd10_bloom_decontaminate",
    "tx02_quality_score",
    "tx11_corpus_filter_pipeline",
    "ev05_funnel_conversion",
    "sim01_ann_bruteforce_topk",
    # the bucketed ANN scale path beside its brute-force baseline, plus
    # its per-bucket-GEMM production twin (rows-only: no oracle, frame
    # equality with sim02 pinned in tests — at sf5: 2.7s vs 6.6s HOF)
    "sim02_ann_lsh_bucketed",
    "sim02x_ann_lsh_bucketed_np",
    "tp02_resample_gapfill",
    # PQ/ADC ANN (oracled — integer-grid distances, exact SQL twin):
    # the compressed-scan end of the ANN ladder
    "sim06_pq_adc",
    # distributed spherical k-means (3 Lloyd's rounds over the full
    # embedding table; rows-only — iterative, no single SQL statement)
    "sim05_kmeans_assign",
    # the composed IVF-PQ serving shape (oracled): coarse cells bound
    # candidates, PQ codes bound per-candidate cost — the flagship
    # 100 TB ANN plan, timed beside its two ingredients
    "sim07_ann_ivfpq",
    # + exact re-rank of the ADC top-50 (oracled): the recall-recovery
    # stage; full-vector reads stay bounded per query
    "sim08_ann_ivfpq_rerank",
    # self-kNN graph over IVF cells (oracled): the edge-list input to
    # SemDeDup-style clustering — pair set O(N^1.5) via occupancy gate
    "sim09_knn_graph",
    # semantic dedup, cluster-then-compare (oracled): the SemDeDup
    # scale path — pair count is cell occupancy, never corpus^2
    "dd13_semantic_dedup",
    # incremental ingest dedup (oracled): new batch LSH-probes the
    # existing corpus index without recomputing it — the scale claim is
    # cost ∝ batch, so it belongs in the per-SF probes
    "dd14_incremental_ingest_dedup",
    "mm02_decode_features",
    # the composed curation funnel (oracled): quality -> near-dup ->
    # decontaminate -> holdout in ONE attributed pass — the end-to-end
    # number a training-data pipeline actually ships. The BENCHMARKED
    # funnel is the banded-LSH production mode: pipe01's exact pair
    # stage is the ground-truth baseline whose corpus-scale pair
    # exchange (~2B pairs / 50+ GB shuffle at sf10) exceeds a single
    # box's scratch in EITHER engine — it stays value-verified at
    # sf<=1 via the driver gate, sweeps, and the sf1 probe
    "pipe02_curation_funnel_lsh",
    # MMR diversified retrieval (rows-only: greedy re-rank, bit-exact
    # Python-mirror tested): bounded-broadcast GEMM candidates + 40-row
    # applyInPandas groups — re-rank cost is corpus-size-independent
    "sim10_mmr_diverse_topk",
    # r8 additions (r7 verdict ask #6 — both were oracled at 3 SFs but
    # absent from the at-scale artifacts): hard-negative mining rides
    # sim04's IVF machinery with a label filter that prunes before the
    # per-query top-k window; the bigram-LM quality score is a
    # vocab^2-bounded broadcast model over one corpus scan
    "sim11_hard_negatives",
    "tx16_bigram_logprob",
]

# SPARK_GRAFT_ONLY="q1,q2" restricts the headline set — the unit the
# per-query-isolated wrapper (scripts/isolated_bench.py) runs one fresh
# JVM around, and handy for quick A/Bs of a single plan.
_ONLY = os.environ.get("SPARK_GRAFT_ONLY")
if _ONLY:
    only = [q.strip() for q in _ONLY.split(",") if q.strip()]
    unknown = [q for q in only if q not in HEADLINE]
    if unknown:
        sys.exit(f"SPARK_GRAFT_ONLY names non-headline queries: {unknown}")
    HEADLINE = only

REPEATS = int(_REPEATS_ENV) if _REPEATS_ENV else 5  # spark: median of N full (plan + execute) runs
DUCK_REPEATS = REPEATS  # duckdb: same sample count for the oracle SQL


def _duck_connect() -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # Bound the in-process baseline: DuckDB's default memory limit is
    # ~80% of RAM, and next to a live JVM + table caches a corpus-scale
    # oracle (the sf10 probe OOM-killed this process at 104 GB RSS on
    # dd14's banded self-join) takes the whole box down. A quarter of
    # available RAM (24 GB ceiling, mirroring session._default_heap_gb)
    # + /tmp spill keeps JVM + baseline within the host on any box; a
    # spilling baseline is a slow baseline, never a dead bench.
    from product_data_pipelining_spark.session import available_ram_gb

    duck_gb = min(24, max(2, available_ram_gb() // 4))
    con.execute(f"SET memory_limit='{duck_gb}GB'")
    con.execute("SET temp_directory='/tmp/duck_spill'")
    for t in TPCH_TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.isdir(p):  # generated SF dirs are multi-file parquet
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def main() -> None:
    specs = all_queries()
    spark = get_spark(app_name="pdp-bench", cpus=CPUS)
    con = _duck_connect()
    # Warm-up: run every headline plan once at the BENCH SF so JVM JIT,
    # whole-stage-codegen compilation, parquet reader setup, Python worker
    # spawn-up, and — critically — the one-time in-memory columnar cache
    # materialization of the base tables (SPARK_GRAFT_CACHE_TABLES) are
    # excluded from the measured steady-state times. (Warming at a smaller
    # SF leaves the bench-SF caches cold: the first timed run then pays a
    # ~10x cache-build penalty that has nothing to do with the plan.)
    # DuckDB gets one warm run per oracle at the bench SF (OS page cache,
    # catalog bind) for the same reason.
    def run_spark(df) -> None:
        # FULL materialization of every output column. Not count():
        # Catalyst's join elimination + column pruning can strip whole
        # stages from a count plan (pipe01's count plan has 0 of the
        # full plan's 6 joins), silently timing a different query.
        # The noop source computes and discards rows executor-side, so
        # no result transfer distorts big-output queries either.
        df.write.format("noop").mode("overwrite").save()

    def run_duck(sql: str) -> None:
        # engine-side materialization: the fetchall() Python-tuple
        # conversion was charging DuckDB a driver tax Spark's noop
        # write doesn't pay (23M-row ev02 spent most of its "query"
        # time building Python objects)
        con.execute(f"CREATE OR REPLACE TEMP TABLE __bench_out AS {sql}")

    for name in HEADLINE:
        try:
            run_spark(specs[name].fn(spark, SF_DIR))
        except Exception as exc:  # never let warm-up kill the bench
            print(f"# warmup {name} failed: {exc}", file=sys.stderr)
    for name in HEADLINE:
        if specs[name].oracle is not None and not SKIP_DUCKDB:
            try:
                run_duck(specs[name].oracle)
            except Exception as exc:
                print(f"# duck warmup {name} failed: {exc}", file=sys.stderr)

    # Steady-state timing, interleaved per query: spark median-of-N,
    # then duck median-of-N back-to-back, so any machine-wide
    # contention spike lands on both engines and cancels out of the
    # ratio. Between queries the JVM is GC-leveled so each query's
    # samples start from a comparable heap instead of its
    # predecessors' garbage — the round-6 artifact showed a broad
    # +20-60% heap-state "regression" on carryover queries that
    # isolated A/Bs disproved. Per-query relative spread is reported
    # in the artifact so a noisy sample is visible, not silently
    # absorbed; adjudicate any surprising per-query move with
    # scripts/isolated_bench.py (one fresh JVM per query) before
    # believing it. (A fully pass-interleaved loop was tried and
    # rejected: running 27 other queries between two samples of the
    # same query measures CPU-cache/JIT-cold re-entry — q1 3x slower
    # on identical plans — which is not the serving posture this
    # bench models.)
    timings: dict[str, float] = {}
    duck_timings: dict[str, float] = {}
    spread: dict[str, float] = {}
    for name in HEADLINE:
        spec = specs[name]
        samples = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            run_spark(spec.fn(spark, SF_DIR))
            samples.append(time.perf_counter() - t0)
        med = statistics.median(samples)
        timings[name] = round(med, 3)
        spread[name] = round(
            (max(samples) - min(samples)) / med, 2
        ) if med > 0 else 0.0
        print(
            f"# {name}: {timings[name]:.3f}s (spread {spread[name]:.2f})",
            file=sys.stderr,
        )
        if spec.oracle is not None and not SKIP_DUCKDB:
            try:
                dsamples = []
                for _ in range(DUCK_REPEATS):
                    t0 = time.perf_counter()
                    run_duck(spec.oracle)
                    dsamples.append(time.perf_counter() - t0)
                duck_timings[name] = round(statistics.median(dsamples), 3)
                print(f"#   duck: {duck_timings[name]:.3f}s", file=sys.stderr)
            except Exception as exc:  # a dead oracle must not kill the
                # bench; the query drops out of BOTH sides of the ratio
                print(f"# duck {name} failed: {exc}", file=sys.stderr)
        # level the heap before the next query's samples
        spark._jvm.System.gc()

    total = round(sum(timings.values()), 3)
    duck_total = round(sum(duck_timings.values()), 3)
    spark_oracled = round(sum(timings[n] for n in duck_timings), 3)
    ratio = round(spark_oracled / duck_total, 3) if duck_total > 0 else None
    line = json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_rel_spread": spread,
                "sf": SF_DIR,
                "duckdb_total_sec": duck_total,
                "duckdb_queries": duck_timings,
                "spark_oracled_sec": spark_oracled,
                "ratio_vs_duckdb": ratio,
                "methodology": (
                    "spark=noop-format write (compute+discard), "
                    "duckdb=CREATE TEMP TABLE AS (compute+store); "
                    "CTAS charges the baseline a result-storage cost "
                    "the noop sink does not pay on big-output queries"
                ),
                # which tree these numbers were measured on (r11
                # verdict: artifacts mixed timing/adjudication
                # provenances with only prose to reconcile them)
                "provenance": provenance(),
                # run-to-run spread bands for mechanically classifying
                # a per-query delta as jitter vs regression (r11 ask #5)
                "jitter_bands_artifact": "JITTER_SPREAD.json",
            }
    )
    print(line)
    # Mirror the same dict to a file (r12 verdict ask #3): the driver
    # captures only the last 2000 chars of stdout, and round 11's JSON
    # line outgrew that window — `BENCH_r11.json parsed: null` orphaned
    # the whole round-over-round comparison. The mirror is written from
    # the SAME string in the SAME run, so a truncated tail can always be
    # reconciled from the committed file. Probes that re-drive bench.py
    # at other SFs may point the mirror elsewhere (or at /dev/null-like
    # "0" to disable) so they don't clobber the headline mirror.
    mirror = os.environ.get(
        "SPARK_GRAFT_BENCH_MIRROR",
        str(Path(__file__).resolve().parent / "BENCH_LAST.json"),
    )
    if mirror not in ("", "0"):
        try:
            with open(mirror, "w") as f:
                f.write(line + "\n")
        except OSError as exc:  # a read-only checkout must not kill the bench
            print(f"# bench mirror write failed: {exc}", file=sys.stderr)
    con.close()
    spark.stop()


if __name__ == "__main__":
    main()
