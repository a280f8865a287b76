#!/usr/bin/env python3
"""Process-level A/B of the norm() fixed-dim unroll on the FULL real
queries that consume _with_norm: the r12 after-profile showed
sim07/sim08 medians ~2x their before-profile with zero plan change, so
adjudicate on the real shapes. One arm per PROCESS (sim07/sim08 pin
their ranked frames via swap_live_persisted — building both arms in one
process would unpersist the first arm's frame and bias the comparison);
the caller alternates processes A,B,A,B,... to ride out box drift.

Usage: python scripts/exp_norm_real_ab.py {hof|unr} [rounds] [query ...]
Prints one JSON line with per-query medians.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("SPARK_GRAFT_CACHE_TABLES", "1")
os.environ.setdefault("SPARK_GRAFT_AQE", "0")
os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")

from product_data_pipelining_spark.operators import similarity  # noqa: E402
from product_data_pipelining_spark.registry import all_queries  # noqa: E402
from product_data_pipelining_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ARM = sys.argv[1] if len(sys.argv) > 1 else "unr"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 5
NAMES = sys.argv[3:] or [
    "sim02_ann_lsh_bucketed",
    "sim06_pq_adc",
    "sim07_ann_ivfpq",
    "sim08_ann_ivfpq_rerank",
]


def main() -> None:
    if ARM == "hof":
        similarity.emb_dim = lambda *a: None
    spark = get_spark(app_name=f"exp-norm-{ARM}", cpus=32)
    specs = all_queries()

    def run(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    out = {}
    for name in NAMES:
        df = specs[name].fn(spark, SF_DIR)
        run(df)  # warm: cache build, codegen, persisted frames
        t = []
        for _ in range(ROUNDS):
            t0 = time.perf_counter()
            run(df)
            t.append(time.perf_counter() - t0)
        out[name] = {
            "median": round(statistics.median(t), 3),
            "samples": [round(x, 3) for x in t],
        }
        spark._jvm.System.gc()
    print(json.dumps({"arm": ARM, "queries": out}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
