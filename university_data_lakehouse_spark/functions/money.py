"""Decimal-exact money aggregation.

Double ``SUM`` is order-dependent (shuffle order differs run to run
and engine to engine), so every monetary aggregate is routed through
``DECIMAL(18,4)``: exact, associative, order-independent — then cast
back to DOUBLE for a stable output schema shared with the DuckDB
oracle (SURVEY §4). Parity with the reference's float aggregates
(e.g. SUM(credits) at defs/gold_analytics/defs.yaml:29).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,4)"

# For products: cast RAW columns (stored with few decimal places, so
# double→decimal rounding is unambiguous) to decimal BEFORE multiplying,
# and keep the whole product chain in exact decimal. Casting a computed
# double product to decimal is NOT cross-engine-stable (Spark rounds
# HALF_UP, DuckDB half-even — they disagree on boundary values).
DEC_PRICE = "decimal(24,4)"    # money columns (wide → DuckDB uses int128)
DEC_FACTOR = "decimal(12,6)"   # (1 ± rate) factors
DEC_FACTOR2 = "decimal(13,12)"  # product of two factors, narrowed so
#                                 price×factor2 stays ≤ precision 38 in Spark


def dsum(col: Column | str, alias: str | None = None) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(DEC)).cast("double")
    return out.alias(alias) if alias else out


def dsum_expr(col: Column | str) -> Column:
    """Decimal-exact sum kept as decimal (for further exact arithmetic)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC))


def davg(col: Column | str, alias: str | None = None) -> Column:
    """AVG as exact-decimal-sum / count, evaluated in double — the only
    cross-engine-stable way to average floats."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(DEC)).cast("double") / F.count(F.lit(1))
    return out.alias(alias) if alias else out
