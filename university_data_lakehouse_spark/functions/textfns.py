"""Text tokenization / shingling helpers.

All JVM-side expressions (regexp_extract_all / transform / sequence)
— no Python UDFs — so they vectorize inside whole-stage codegen and
match DuckDB's regexp_extract_all / list_transform semantics exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_RE = "[a-z0-9]+"


def tokens(col: Column | str) -> Column:
    """Lowercased alnum tokens, in document order (duplicates kept)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit(TOKEN_RE), F.lit(0))


def shingles(tok_col: Column, n: int = 3, sep: str = " ") -> Column:
    """Word n-gram shingles from a token array.

    Guards the empty case explicitly: Spark's ``sequence(1, 0)``
    counts DOWN, so short docs must map to an empty array.
    """
    size = F.size(tok_col)
    idx = F.sequence(F.lit(1), size - (n - 1))
    make = F.transform(
        idx,
        lambda i: F.concat_ws(
            sep, *[F.element_at(tok_col, i + j) for j in range(n)]
        ),
    )
    return F.when(size >= n, make).otherwise(
        F.array().cast("array<string>")
    )
