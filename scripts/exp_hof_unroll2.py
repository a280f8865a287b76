#!/usr/bin/env python3
"""Adjudicate HOF vs unrolled vector math on the REAL registered
queries, with interleaved arms (A/B/A/B...) so box-contention drift
cannot favor either arm (the r8 note claims unrolled was 4x slower;
the r12 first A/B measured the opposite under decaying load).

Builds each query twice — once with emb_dim() -> dim (unrolled chain)
and once monkeypatched to None (HOF aggregate/zip_with) — and times
noop writes alternately.

Usage: python scripts/exp_hof_unroll2.py [rounds]
"""

from __future__ import annotations

import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("SPARK_GRAFT_CACHE_TABLES", "1")
os.environ.setdefault("SPARK_GRAFT_AQE", "0")
os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")
# plan cache OFF: each arm builds fresh plans

from product_data_pipelining_spark.registry import all_queries  # noqa: E402
from product_data_pipelining_spark.session import get_spark  # noqa: E402
import product_data_pipelining_spark.operators.similarity as S  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 6

QUERIES = [
    "sim03_embedding_neardup_pairs",  # all-pairs: ~2M pairs x 64-dim dot
    "sim02_ann_lsh_bucketed",         # bucketed candidates x 64-dim dot
    "sim04_ann_ivf",                  # N x cells assignment dots
]


def main() -> None:
    specs = all_queries()
    spark = get_spark(app_name="exp-hof-unroll2", cpus=32)

    def run(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    orig_emb_dim = S.emb_dim
    for name in QUERIES:
        spec = specs[name]
        df_unrolled = spec.fn(spark, SF_DIR)
        S.emb_dim = lambda s, d: None
        try:
            df_hof = spec.fn(spark, SF_DIR)
        finally:
            S.emb_dim = orig_emb_dim
        # warm both
        run(df_unrolled)
        run(df_hof)
        t_u, t_h = [], []
        for _ in range(ROUNDS):
            t0 = time.perf_counter()
            run(df_hof)
            t_h.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            run(df_unrolled)
            t_u.append(time.perf_counter() - t0)
        print(
            f"{name}: HOF med {statistics.median(t_h):.3f}s "
            f"{[round(x, 2) for x in t_h]} | UNROLLED med "
            f"{statistics.median(t_u):.3f}s {[round(x, 2) for x in t_u]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
