"""Physical-plan inspection helpers.

The 100 TB design claims in this repo (broadcasts, pushdown, partial
aggregation, codegen) are asserted, not assumed: tests/test_plans.py
uses these helpers to fail if a plan regresses — e.g. a dimension join
degrading to sort-merge, or a staging filter no longer reaching the
parquet scan.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The executed (post-AQE-prepared) physical plan as text."""
    return df._jdf.queryExecution().executedPlan().toString()


def scans(df: DataFrame) -> list[dict[str, str]]:
    """One dict per parquet FileScan: pushed filters + read schema."""
    out = []
    for line in physical_plan(df).splitlines():
        if "FileScan parquet" not in line:
            continue
        # Spark truncates long metadata lists at maxMetadataStringLength
        # with a trailing "..." and NO closing bracket — accept either
        pushed = re.search(r"PushedFilters: \[(.*?)(?:\]|\.\.\.)", line)
        schema = re.search(r"ReadSchema: (struct<[^>]*>)", line)
        part = re.search(r"PartitionFilters: \[(.*?)(?:\]|\.\.\.)", line)
        out.append(
            {
                "pushed_filters": pushed.group(1) if pushed else "",
                "read_schema": schema.group(1) if schema else "",
                "partition_filters": part.group(1) if part else "",
            }
        )
    return out


def join_kinds(df: DataFrame) -> list[str]:
    """Join operator names in the plan (e.g. BroadcastHashJoin)."""
    return re.findall(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)",
        physical_plan(df),
    )


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges (excludes broadcast exchanges).

    Matches the shuffle partitionings only — a case-insensitive
    ``Exchange hash`` would also swallow ``BroadcastExchange
    HashedRelationBroadcastMode`` and overcount every broadcast join.
    """
    return len(
        re.findall(
            r"Exchange (?:hashpartitioning|rangepartitioning|"
            r"RoundRobinPartitioning|SinglePartition)",
            physical_plan(df),
        )
    )


def has_partial_aggregation(df: DataFrame) -> bool:
    """True when the plan contains a map-side partial aggregate.

    (Whole-stage-codegen markers are not visible in AdaptiveSparkPlan
    text — AQE wraps stages at materialization — so partial aggregation
    + exchange counts are the plan properties asserted instead.)
    """
    return bool(re.search(r"partial_|merge_", physical_plan(df)))
