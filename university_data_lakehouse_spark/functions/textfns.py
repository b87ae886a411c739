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

    Built as a ZIP of the array with its own shifted slices (n-1
    zip_with folds), not index-transform + element_at: the indexed
    form re-evaluates the array expression per element and measured
    ~11x slower at sf0.1 (7.5s -> 0.65s for the 3-gram explode of
    260k shingles, r6) — on the shingle-heavy dedup/contamination
    operators that interpreted overhead was most of their runtime.
    Output strings are byte-identical to the old form (equivalence
    pinned in tests/test_properties_hypothesis.py).

    Guards the short case explicitly: a doc with fewer than n tokens
    maps to an empty array (slice length clamps to 0 and the
    ``when`` keeps the type)."""
    size = F.size(tok_col)
    cnt = F.greatest(size - (n - 1), F.lit(0))
    parts = [F.slice(tok_col, i + 1, cnt) for i in range(n)]
    out = parts[0]
    for p in parts[1:]:
        out = F.zip_with(out, p, lambda a, b: F.concat(a, F.lit(sep), b))
    return F.when(size >= n, out).otherwise(
        F.array().cast("array<string>")
    )
