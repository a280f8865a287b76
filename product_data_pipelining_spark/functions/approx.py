"""Approximate aggregates — the sketch path for 100 TB interactive cuts.

Every oracle-checked query in the registry uses EXACT aggregation
(countDistinct, interpolated percentiles) because the reference does
(SURVEY.md §2.4: "no approximate aggregates"). At warehouse scale the
standard practice adds a sketch tier next to the exact one: HLL++
distinct counts and t-digest-style quantiles run in one pass with O(1)
state per group and no expand, trading bounded error for a large
constant-factor win on distinct-heavy cuts. These wrappers pin the
error contracts; tests assert the bounds against the exact answers so
a library upgrade that degrades sketch accuracy fails loudly.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# HLL++ relative standard deviation; 0.02 ≈ 4KB of state per group
HLL_RSD = 0.02

# approx_percentile accuracy knob: 1/accuracy = max rank error fraction
PERCENTILE_ACCURACY = 10_000


def approx_distinct(col: str | Column, rsd: float = HLL_RSD) -> Column:
    """HLL++ distinct count; relative error ~rsd with high probability."""
    return F.approx_count_distinct(col, rsd=rsd)


def approx_quantiles(
    col: str | Column, probs: Sequence[float], accuracy: int = PERCENTILE_ACCURACY
) -> Column:
    """One-pass mergeable quantiles; rank error ≤ 1/accuracy."""
    c = F.col(col) if isinstance(col, str) else col
    return F.percentile_approx(
        c, F.array(*[F.lit(p) for p in probs]), F.lit(accuracy)
    )


def distinct_both(df: DataFrame, keys: Sequence[str], col: str) -> DataFrame:
    """Exact + sketch distinct side by side (for validation/backfill)."""
    return df.groupBy(*keys).agg(
        F.countDistinct(col).alias("exact_distinct"),
        approx_distinct(col).alias("approx_distinct"),
    )


def heavy_hitters(
    df: DataFrame, cols: Sequence[str], support: float = 0.01
) -> dict[str, list]:
    """Single-pass approximate frequent items (heavy hitters) per column.

    Wraps ``DataFrame.freqItems`` (Karp/Shenker/Papadimitriou lossy
    counting as implemented by Spark): one scan, O(1/support) state per
    partition, merged map-side — no shuffle of the raw values. Contract
    (pinned by tests): every value with true frequency > ``support``
    appears in the result (NO false negatives); false positives are
    possible and expected — filter against exact counts of just the
    returned candidates (a tiny second pass) when exactness matters.
    That candidate-then-verify shape is the 100 TB pattern: the first
    pass touches everything once, the second only groups by a handful
    of candidate values.
    """
    row = df.freqItems(list(cols), support).collect()[0]
    return {c: sorted(row[f"{c}_freqItems"]) for c in cols}
