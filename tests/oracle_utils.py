"""Replica of the driver's correctness gate: run a Spark query and its
DuckDB oracle SQL on the same parquet tables, then compare row count +
order-insensitive canonical values (columns sorted by name)."""

from __future__ import annotations

import math
import os

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _cell(c):
    if c is None:
        return "~null"
    if isinstance(c, (np.ndarray, list, tuple)):
        return "[" + ",".join(_cell(x) for x in c) + "]"
    if isinstance(c, (bool, np.bool_)):
        return f"b:{bool(c)}"
    if isinstance(c, (float, np.floating)):
        f = float(c)
        if math.isnan(f):
            return "~null"
        if f == 0.0:
            f = 0.0  # normalize -0.0
        return f"i:{int(f)}" if f.is_integer() and abs(f) < 2**53 else f"f:{f.hex()}"
    if isinstance(c, (int, np.integer)):
        return f"i:{int(c)}"
    if isinstance(c, pd.Timestamp):
        return "t:" + c.isoformat()
    try:
        if pd.isna(c):
            return "~null"
    except (TypeError, ValueError):
        pass
    return "s:" + str(c)


def canon(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    return sorted(tuple(_cell(c) for c in row) for row in df.itertuples(index=False))


def compare(spark_df, sql: str, sf_dir: str, name: str = "?") -> None:
    mine = spark_df.toPandas()
    con = duck_con(sf_dir)
    try:
        oracle = con.execute(sql).fetch_df()
    finally:
        con.close()
    assert sorted(mine.columns) == sorted(oracle.columns), (
        f"{name}: column mismatch spark={sorted(mine.columns)} "
        f"oracle={sorted(oracle.columns)}"
    )
    assert len(mine) == len(oracle), (
        f"{name}: row count spark={len(mine)} oracle={len(oracle)}"
    )
    # a 0-row result passes every hash compare trivially — a filter
    # literal that matches nothing in the synthetic testdata (e.g. a
    # TPC-H nation name vs NATION_i) would hide here forever. Every
    # registered key must exercise real rows at the test SFs.
    assert len(oracle) > 0, (
        f"{name}: oracle returned 0 rows — trivially-true compare "
        "(check filter literals against the synthetic testdata)"
    )
    a, b = canon(mine), canon(oracle)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        raise AssertionError(f"{name}: value mismatch; first diffs: {diffs}")
