"""Cross-engine deterministic numeric aggregation helpers.

Float sums are order-dependent in the last ulps; Spark's partial-aggregation
order is nondeterministic AND differs from the DuckDB oracle's accumulation
order, so ``ROUND(SUM(double), 2)`` is one summation-order flip away from a
hash mismatch whenever a group's sum lands near a ``x.xx5`` rounding boundary
(round-1 driver: 3/2000 groups off by $0.01 in ``revenue_per_product``).

The fix is to make the value exact rather than the comparison lenient: cast
each per-row term (bitwise-identical IEEE double in both engines) to decimal,
sum in decimal (exact, associative → order-independent), round the decimal
(HALF_UP away from zero in both engines for our positive money values), and
only then cast back to double. Oracle twin for every helper is documented
inline; both sides MUST use the same decimal precision/scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["dec_sum", "dec_sum2", "DEC_SUM2_SQL"]

# Oracle-side template (DuckDB dialect == ANSI here):
#   CAST(ROUND(SUM(CAST(<expr> AS DECIMAL(18,6))), 2) AS DOUBLE)
DEC_SUM2_SQL = "CAST(ROUND(SUM(CAST({expr} AS DECIMAL(18,6))), 2) AS DOUBLE)"


def dec_sum(c: Column, precision: int = 18, scale: int = 6) -> Column:
    """Exact decimal sum of a double column (NOT yet rounded/cast back).

    Spark widens sum(decimal(p,s)) to decimal(p+10,s), so per-term capacity
    is what bounds the cast: decimal(18,6) holds |term| < 10^12, ample for
    money columns. Partial aggregation still applies — decimal sums are
    mergeable, two-phase, and shuffle the same narrow state as double sums.
    """
    return F.sum(c.cast(f"decimal({precision},{scale})"))


def dec_sum2(c: Column) -> Column:
    """Money sum rounded to cents as double — order-independent on both
    engines. Oracle twin: ``DEC_SUM2_SQL.format(expr=...)``."""
    return F.round(dec_sum(c), 2).cast("double")
