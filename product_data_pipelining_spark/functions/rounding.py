"""Cross-engine float rounding.

Spark's ``round`` on DOUBLE goes through ``BigDecimal(double)`` — the
*exact* binary expansion — while DuckDB scales by 10^n and applies
``std::round`` (half away from zero on the scaled double). The two
disagree whenever the scaled value sits on a representability boundary
(e.g. 53366.25 * 0.98 → 52298.92 vs 52298.93).

``duck_round`` reproduces DuckDB's semantics with pure IEEE ops —
``floor(x*10^n + 0.5) / 10^n`` (sign-mirrored) — which both engines
evaluate identically, so rounded outputs hash-match. Validated against
DuckDB on 200k random doubles at 2 and 4 decimals with zero mismatches.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def duck_round(col: Column | str, scale: int) -> Column:
    """Round half away from zero, DuckDB-float style. Returns DOUBLE."""
    c = F.col(col) if isinstance(col, str) else col
    c = c.cast("double")
    s = float(10**scale)
    scaled = c * F.lit(s)
    rounded = F.when(c >= 0, F.floor(scaled + F.lit(0.5))).otherwise(
        F.ceil(scaled - F.lit(0.5))
    )
    return (rounded / F.lit(s)).cast("double")


# Floating sums are order-dependent: Spark merges partition partials in
# arbitrary order, DuckDB sums in (its own) scan order, and a rounded
# output flips when the two sums straddle a boundary by one ulp. The
# deterministic aggregates below quantize each row to a 1e-6 grid
# (sign-mirrored half-away rounding — identical IEEE ops on both
# engines) and accumulate the scaled values as BIGINT: an exact,
# order-independent integer sum on the fast whole-stage-codegen path.
# Spark's >18-digit decimals fall off the compact-long representation
# onto per-row BigDecimal arithmetic (~2.5x slower measured), so the
# integer formulation is both faster and just as reproducible. The
# money/measure columns here carry at most 6 true decimal digits (and
# products of 2+2+2-digit factors), so the 1e-6 grid loses nothing.
#
# Range envelope: |x| must stay below ~9.2e12 per row and the scaled
# total below 2^63 (~9.2e18, i.e. ~9.2e12 in column units). Beyond
# that — extreme SF global totals — widen the accumulator back to
# DECIMAL or pre-aggregate per partition key before the global sum.

_SCALE6 = 1e6


def _scaled_long(c: Column) -> Column:
    """Row value on the 1e-6 grid as BIGINT (half away from zero)."""
    s = c.cast("double") * F.lit(_SCALE6)
    return F.when(c >= 0, F.floor(s + F.lit(0.5))).otherwise(
        F.ceil(s - F.lit(0.5))
    )


def _sql_scaled_long(expr: str) -> str:
    return (
        f"CAST(CASE WHEN {expr} >= 0"
        f" THEN FLOOR(CAST({expr} AS DOUBLE) * 1e6 + 0.5)"
        f" ELSE CEIL(CAST({expr} AS DOUBLE) * 1e6 - 0.5) END AS BIGINT)"
    )


def det_sum(col: Column | str, scale: int = 2) -> Column:
    """Order-independent rounded SUM of a double expression."""
    c = F.col(col) if isinstance(col, str) else col
    return duck_round(
        F.sum(_scaled_long(c)).cast("double") / F.lit(_SCALE6), scale
    )


def det_avg(col: Column | str, scale: int = 2) -> Column:
    """Order-independent rounded AVG (null-ignoring, like SQL AVG)."""
    c = F.col(col) if isinstance(col, str) else col
    return duck_round(
        F.sum(_scaled_long(c)).cast("double") / F.lit(_SCALE6) / F.count(c),
        scale,
    )


def det_avg_raw(col: Column | str) -> Column:
    """Order-independent unrounded AVG (for re-aggregation pipelines)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(_scaled_long(c)).cast("double") / F.lit(_SCALE6) / F.count(c)


def sql_det_sum(expr: str, scale: int = 2) -> str:
    """DuckDB twin of :func:`det_sum`."""
    return (
        f"ROUND(CAST(CAST(SUM({_sql_scaled_long(expr)}) AS BIGINT) AS DOUBLE)"
        f" / 1e6, {scale})"
    )


def sql_det_avg(expr: str, scale: int = 2) -> str:
    """DuckDB twin of :func:`det_avg`."""
    return (
        f"ROUND(CAST(CAST(SUM({_sql_scaled_long(expr)}) AS BIGINT) AS DOUBLE)"
        f" / 1e6 / COUNT({expr}), {scale})"
    )


def sql_det_avg_raw(expr: str) -> str:
    """DuckDB twin of :func:`det_avg_raw`."""
    return (
        f"(CAST(CAST(SUM({_sql_scaled_long(expr)}) AS BIGINT) AS DOUBLE)"
        f" / 1e6 / COUNT({expr}))"
    )
