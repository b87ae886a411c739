"""Deterministic surrogate keys.

The reference mints surrogate keys with ``CAST(UUID() AS VARCHAR)``
(defs/silver_transforms/defs.yaml:24 and every other transform).
UUIDs are untestable (non-deterministic), so we use
``md5(natural_key_parts joined by '-')`` — identical in Spark and
DuckDB, stable across runs, and still unique per natural key. This is
the one intentional semantic change vs the reference (SURVEY §4).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def surrogate_key(*parts: Column | str, sep: str = "-") -> Column:
    """md5 over the string-cast natural-key parts, '-'-joined.

    JVM-side expression (no UDF): stays inside whole-stage codegen.
    """
    cols = [F.col(p) if isinstance(p, str) else p for p in parts]
    casted = [c.cast("string") for c in cols]
    joined = casted[0] if len(casted) == 1 else F.concat_ws(sep, *casted)
    return F.md5(joined)
