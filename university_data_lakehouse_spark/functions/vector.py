"""Deterministic vector math over array<float> embedding columns.

Float summation order changes the result in the last ulp, so both
engines must fold in the SAME order for the oracle hash to match:
Spark ``F.aggregate`` is a strict left fold with init 0.0; DuckDB
``list_reduce`` left-folds from the first element. IEEE-754 guarantees
``0.0 + x == x``, so both produce bit-identical doubles (SURVEY §4).

Everything is a JVM-side expression — no Python in the loop — so ANN
scoring stays inside whole-stage codegen even at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double_vec(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Left-fold sum of elementwise products (deterministic)."""
    prods = F.zip_with(a, b, lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
