"""Driver-gate replica: every queries() key with an oracle must
hash-match DuckDB on the small SF (SURVEY §5.1)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tests.oracle_utils import compare

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.mark.parametrize("key", sorted(k for k in QUERIES if k in ORACLES))
def test_oracle_parity(spark, sf_dir, key):
    compare(QUERIES[key](spark, sf_dir), ORACLES[key], sf_dir, name=key)


def test_every_query_has_oracle_or_is_declared_rows_only():
    """Since r4 every key — including the approximate ANN paths,
    which are deterministic and replayed in SQL — has an oracle."""
    rows_only = {k for k in QUERIES if k not in ORACLES}
    assert rows_only == set(), f"missing oracles for: {rows_only}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
