"""Cogrouped applyInPandas: per-key custom logic over two aligned inputs.

The escape hatch for operators that genuinely need imperative per-key
logic over *two* tables at once (sequence alignment, per-entity
reconciliation, custom merge rules). Spark shuffles both sides on the
key, feeds each key's rows to the Python worker as a pair of Arrow
batches, and the UDF emits an arbitrary result frame — no driver
involvement, fully partition-parallel.

The demo operator reconciles order headers against their line items —
a shape that IS relational (see the oracle) and would normally be the
join+agg twin; it is registered through the pandas path precisely so
the correctness gate proves the cogroup plumbing computes the exact
same answer, down to the deterministic scaled-integer summation the
relational tier uses (functions/rounding.py).

Everything the UDF touches is defined inside the closure: the driver
may run from any cwd, so worker processes cannot import this module —
cloudpickle must carry the function by value (see
.claude/skills/verify round-1 gotchas).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import sql_det_sum
from ..io import load_table
from ..registry import register

_OUT_SCHEMA = (
    "o_orderkey bigint, n_lines bigint, line_total double, "
    "header_total double, delta double"
)


def cogroup_reconcile(
    orders: DataFrame, lineitem: DataFrame, parallelism: int | None = None
) -> DataFrame:
    """Per-order header-vs-lines reconciliation via cogrouped pandas.

    Both sides are repartitioned with an EXPLICIT partition count before
    the cogroup. Without it, AQE sees a few tens of MB of shuffle data
    and coalesces the exchange to one partition — correct economics for
    a JVM stage, catastrophic for a Python-UDF stage where cost is
    per-KEY invocation overhead, not bytes: at sf0.1 the coalesced plan
    pushed all 150k order keys through a single Python worker serially
    (~15 min) while 31 cores idled. An explicit count is user-specified
    repartitioning, which AQE leaves alone, so every core keeps a
    worker fed. The general rule this encodes: size Python stages by
    keys-per-task, never by shuffle bytes.
    """

    def reconcile(left, right):  # noqa: ANN001 — pandas-in, pandas-out
        import numpy as np
        import pandas as pd

        if left.empty:  # lines with no header: not this operator's output
            return pd.DataFrame(
                columns=[
                    "o_orderkey",
                    "n_lines",
                    "line_total",
                    "header_total",
                    "delta",
                ]
            )

        def scaled_sum(v):
            s = v * 1e6
            q = np.where(v >= 0, np.floor(s + 0.5), np.ceil(s - 0.5))
            return q.astype(np.int64).sum()

        def round2(x):
            s = x * 100.0
            r = np.floor(s + 0.5) if x >= 0 else np.ceil(s - 0.5)
            return float(r / 100.0)

        value = (
            right["l_extendedprice"].to_numpy()
            * (1.0 - right["l_discount"].to_numpy())
            if len(right)
            else np.array([], dtype=np.float64)
        )
        line_total = (
            round2(scaled_sum(value) / 1e6) if len(right) else 0.0
        )
        header_total = round2(float(left["o_totalprice"].iloc[0]))
        return pd.DataFrame(
            {
                "o_orderkey": [int(left["o_orderkey"].iloc[0])],
                "n_lines": [len(right)],
                "line_total": [line_total],
                "header_total": [header_total],
                "delta": [round2(header_total - line_total)],
            }
        )

    n = parallelism or orders.sparkSession.sparkContext.defaultParallelism
    return (
        orders.select("o_orderkey", "o_totalprice")
        .repartition(n, "o_orderkey")
        .groupBy("o_orderkey")
        .cogroup(
            lineitem.select(
                "l_orderkey", "l_extendedprice", "l_discount"
            ).repartition(n, "l_orderkey")
            .groupBy("l_orderkey")
        )
        .applyInPandas(reconcile, schema=_OUT_SCHEMA)
    )


@register(
    "cg01_cogroup_reconcile",
    oracle=f"""
    SELECT o.o_orderkey,
           COUNT(l.l_orderkey) AS n_lines,
           COALESCE({sql_det_sum("l.l_extendedprice * (1 - l.l_discount)")},
                    0.0) AS line_total,
           ROUND(o.o_totalprice, 2) AS header_total,
           ROUND(ROUND(o.o_totalprice, 2)
                 - COALESCE({sql_det_sum("l.l_extendedprice * (1 - l.l_discount)")},
                            0.0), 2) AS delta
    FROM orders o LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderkey, o.o_totalprice
    """,
)
def cg01_cogroup_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-header vs line-sum reconciliation through the cogroup path.

    Plan shape: one hash exchange per side on the order key, then a
    FlatMapCoGroupsInPandas — the same two-shuffle profile as a
    shuffle join, with Arrow moving each key's rows to Python and back
    in columnar batches. Per-key state is one header row plus that
    order's lines, so executor memory is bounded by the largest single
    key at any scale. For THIS relational shape the join+agg twin (the
    oracle) is the plan to ship — built-ins stay in whole-stage
    codegen; the cogroup tier exists for logic SQL cannot express, and
    this query pins its correctness against the relational answer.
    """
    return cogroup_reconcile(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
    )
