"""tools/dtype_audit.py's dtype-kind classifier.

The audit's job is to catch cross-engine pandas dtype divergence the
bit-exact oracle canon deliberately hides (the driver's value hash is
dtype-sensitive: str(9) != str(9.0)). These unit tests pin the
classifier on the exact shapes the two engines produce — including
the one real incident, DuckDB widening SUM(BIGINT) to HUGEINT, which
pandas lands as float64 against Spark's int64.
"""

from __future__ import annotations

import decimal
import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.dtype_audit import _kind


def test_int_kinds_collapse_across_widths():
    assert _kind(pd.Series([1, 2], dtype="int32")) == "int"
    assert _kind(pd.Series([1, 2], dtype="int64")) == "int"
    assert _kind(pd.Series([1, 2], dtype="uint64")) == "int"


def test_the_hugeint_incident_shape_diverges():
    # Spark: int64 energy_fp; DuckDB HUGEINT -> pandas float64
    spark_side = pd.Series([9, 12], dtype="int64")
    oracle_side = pd.Series([9.0, 12.0], dtype="float64")
    assert _kind(spark_side) != _kind(oracle_side)


def test_object_columns_classify_by_payload_type():
    dec = pd.Series([decimal.Decimal("1.50")], dtype="object")
    strs = pd.Series(["a"], dtype="object")
    lists = pd.Series([[1.0, 2.0]], dtype="object")
    assert _kind(dec) == "object<Decimal>"
    assert _kind(strs) == "object<str>"
    assert _kind(lists) == "object<list>"
    assert _kind(dec) != _kind(strs)


def test_all_null_object_column_is_its_own_kind():
    assert _kind(pd.Series([None, None], dtype="object")) == "object<empty>"


def test_datetime_and_bool_kinds():
    ts = pd.Series(pd.to_datetime(["2026-01-01"]))
    assert _kind(ts) == "datetime"
    assert _kind(pd.Series([True], dtype="bool")) == "bool"


def test_numpy_payloads_in_object_columns():
    # Spark toPandas can yield object columns of numpy arrays
    arr = pd.Series([np.array([1.0, 2.0])], dtype="object")
    assert _kind(arr) == "object<ndarray>"
