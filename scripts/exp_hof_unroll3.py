#!/usr/bin/env python3
"""Interleaved A/B for the two remaining unroll candidates:

1. norm over the corpus (64-term chain, evaluated once per row,
   single reference downstream) — sim family's _with_norm.
2. sim06's subspace L2 (4-term chain per (vec, subspace, codebook
   entry) candidate row) vs its HOF aggregate/zip_with form.

Usage: python scripts/exp_hof_unroll3.py [rounds]
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

from pyspark.sql import Column, functions as F  # noqa: E402

from product_data_pipelining_spark.io import load_table  # noqa: E402
from product_data_pipelining_spark.session import get_spark  # noqa: E402
from product_data_pipelining_spark.operators.similarity import (  # noqa: E402
    PQ_K,
    PQ_SUB,
    _dbl,
    _pq_seeds,
    _pq_subvectors,
    _with_norm,
    emb_dim,
    norm,
)
from product_data_pipelining_spark.functions.rounding import (  # noqa: E402
    _scaled_long,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 6


def main() -> None:
    spark = get_spark(app_name="exp-hof-unroll3", cpus=32)

    def run(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    def ab(label, df_a, df_b) -> None:
        run(df_a)
        run(df_b)
        t_a, t_b = [], []
        for _ in range(ROUNDS):
            t0 = time.perf_counter()
            run(df_a)
            t_a.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            run(df_b)
            t_b.append(time.perf_counter() - t0)
        print(
            f"{label}: HOF med {statistics.median(t_a):.3f}s "
            f"{[round(x, 2) for x in t_a]} | UNROLLED med "
            f"{statistics.median(t_b):.3f}s {[round(x, 2) for x in t_b]}",
            flush=True,
        )

    emb = load_table(spark, SF_DIR, "embeddings")
    rep = emb.crossJoin(
        F.broadcast(spark.range(50).select(F.col("id").alias("r")))
    )
    dim = emb_dim(spark, SF_DIR)
    ab(
        "norm x50",
        rep.select("vec_id", "r", norm(F.col("embedding")).alias("n")),
        rep.select("vec_id", "r", norm(F.col("embedding"), dim).alias("n")),
    )

    # ---- sim06 dist stage, both l2 forms ----
    v = _with_norm(spark, SF_DIR).select(
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
    l2_hof = F.aggregate(
        F.zip_with(
            _dbl(F.col("sv")), _dbl(F.col("cv")), lambda x, y: (x - y) * (x - y)
        ),
        F.lit(0.0),
        lambda acc, val: acc + val,
    )
    l2_unr: Column = F.lit(0.0)
    for i in range(PQ_SUB):
        d = (
            F.col("sv").getItem(i).cast("double")
            - F.col("cv").getItem(i).cast("double")
        )
        l2_unr = l2_unr + d * d

    def dist(l2) -> "F.DataFrame":
        return sub_tbl.join(F.broadcast(cent_sub), "m").select(
            "vec_id", "m", "c", _scaled_long(l2).cast("long").alias("d6")
        )

    # bit-identity of the two l2 forms over the full grid
    mism = (
        dist(l2_hof).alias("a")
        .join(
            dist(l2_unr).alias("b"),
            (F.col("a.vec_id") == F.col("b.vec_id"))
            & (F.col("a.m") == F.col("b.m"))
            & (F.col("a.c") == F.col("b.c"))
            & ~F.col("a.d6").eqNullSafe(F.col("b.d6")),
        )
        .count()
    )
    print(f"sim06 l2 grid mismatch rows: {mism}", flush=True)
    ab("sim06 dist", dist(l2_hof), dist(l2_unr))
    spark.stop()


if __name__ == "__main__":
    main()
