#!/usr/bin/env python3
"""A/B: interpreted higher-order-function vector math vs unrolled
codegen'd expression chains (guide §4.1 — prefer built-ins/codegen over
interpreted evaluation; HOFs like aggregate/zip_with/transform are
CodegenFallback in Spark).

Checks BIT-IDENTITY first (same left-fold add order, same per-element
double casts), then times both forms with the noop sink in bench
posture.

Usage: python scripts/exp_hof_unroll.py
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
from product_data_pipelining_spark.operators import similarity as S  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPEATS = int(os.environ.get("SPARK_GRAFT_REPEATS", "5"))

DIM = 64


def dot_unrolled(a: Column, b: Column, dim: int = DIM) -> Column:
    s: Column = F.lit(0.0)
    for i in range(dim):
        s = s + a.getItem(i).cast("double") * b.getItem(i).cast("double")
    return s


def norm_unrolled(a: Column, dim: int = DIM) -> Column:
    s: Column = F.lit(0.0)
    for i in range(dim):
        x = a.getItem(i).cast("double")
        s = s + x * x
    return F.sqrt(s)


def main() -> None:
    spark = get_spark(app_name="exp-hof-unroll", cpus=CPUS)
    emb = load_table(spark, SF_DIR, "embeddings")

    def run(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    def timeit(df, label: str) -> float:
        run(df)  # warm
        samples = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            run(df)
            samples.append(time.perf_counter() - t0)
        med = statistics.median(samples)
        print(f"{label}: {med:.3f}s  {[round(s,3) for s in samples]}")
        return med

    # ---- 1. bit-identity of norm ----
    both = emb.select(
        "vec_id",
        S.norm(F.col("embedding")).alias("n_hof"),
        F.sqrt(norm_unrolled(F.col("embedding"), DIM) - F.lit(0.0)).alias("_x"),
    ).drop("_x")
    # build unrolled norm exactly: sqrt of the chain
    unr = F.sqrt(
        sum(
            (F.col("embedding").getItem(i).cast("double")
             * F.col("embedding").getItem(i).cast("double")
             for i in range(DIM)),
            F.lit(0.0),
        )
    )
    diff = (
        emb.select(
            S.norm(F.col("embedding")).alias("h"), unr.alias("u")
        )
        .filter(
            ~(F.col("h").eqNullSafe(F.col("u")))
        )
        .count()
    )
    print(f"norm bit-mismatch rows: {diff}")

    # dot bit-identity on a self-pair sample
    a = emb.alias("a")
    b = emb.alias("b")
    pairs = a.join(b, F.col("a.vec_id") % 97 == F.col("b.vec_id") % 89).limit(200000)
    d_hof = S.dot(F.col("a.embedding"), F.col("b.embedding"))
    d_unr = sum(
        (F.col("a.embedding").getItem(i).cast("double")
         * F.col("b.embedding").getItem(i).cast("double")
         for i in range(DIM)),
        F.lit(0.0),
    )
    dd = pairs.select(d_hof.alias("h"), d_unr.alias("u")).filter(
        ~(F.col("h").eqNullSafe(F.col("u")))
    ).count()
    print(f"dot bit-mismatch rows: {dd}")

    # ---- 2. timing: norm over corpus (xN to make it visible) ----
    big = emb.crossJoin(F.broadcast(spark.range(50).select(F.col("id").alias("rep"))))
    timeit(big.select("vec_id", "rep", S.norm(F.col("embedding")).alias("n")), "norm HOF x50")
    timeit(
        big.select(
            "vec_id",
            "rep",
            F.sqrt(
                sum(
                    (F.col("embedding").getItem(i).cast("double")
                     * F.col("embedding").getItem(i).cast("double")
                     for i in range(DIM)),
                    F.lit(0.0),
                )
            ).alias("n"),
        ),
        "norm unrolled x50",
    )

    # ---- 3. timing: pairwise dot (the sim02/sim04 candidate shape) ----
    timeit(
        pairs.select(
            F.col("a.vec_id"), F.col("b.vec_id"), d_hof.alias("d")
        ),
        "pair dot HOF",
    )
    timeit(
        pairs.select(
            F.col("a.vec_id"), F.col("b.vec_id"), d_unr.alias("d")
        ),
        "pair dot unrolled",
    )
    spark.stop()


if __name__ == "__main__":
    main()
