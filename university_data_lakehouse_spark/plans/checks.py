"""Reusable asset checks for the asset graph.

Reference parity: the check factories in
``trino_iceberg_transform_component.py:192-206`` (not_null_pk,
no_duplicates, row_count, referential_integrity, value_range), the
bronze freshness checks (``s3_data_landing_component.py:165-196``)
and the gold completeness checks
(``gold_analytics_component.py:165-196``, non-null ratio per column).

Each factory returns ``fn(DataFrame) -> (passed, metadata)`` for
Asset.checks. All checks are single aggregates — counts, never
collects — so they run at any scale.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Check = Callable[[DataFrame], tuple[bool, dict]]


def not_null_pk(*pk_cols: str) -> Check:
    def run(df: DataFrame) -> tuple[bool, dict]:
        cond = None
        for c in pk_cols:
            expr = F.col(c).isNull()
            cond = expr if cond is None else (cond | expr)
        n = df.where(cond).count()
        return n == 0, {"null_pk_rows": n}
    return run


def no_duplicates(*key_cols: str) -> Check:
    def run(df: DataFrame) -> tuple[bool, dict]:
        key = F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])
        row = df.agg(
            (F.count(F.lit(1)) - F.countDistinct(key)).alias("dups")
        ).collect()[0]
        return row.dups == 0, {"duplicates": row.dups}
    return run


def accepted_values(col: str, values: list, allow_null: bool = False) -> Check:
    """Enum-domain gate: every value of ``col`` must be one of
    ``values`` (nulls violate unless ``allow_null``). One aggregate —
    the dbt-style accepted_values test the reference's value_range
    cannot express for categoricals."""
    def run(df: DataFrame) -> tuple[bool, dict]:
        ok = F.col(col).isin(values)
        if allow_null:
            ok = ok | F.col(col).isNull()
        n = df.where(~F.coalesce(ok, F.lit(False))).count()
        return n == 0, {"unaccepted_rows": n, "accepted": list(values)}
    return run


def row_count(min_rows: int = 1) -> Check:
    def run(df: DataFrame) -> tuple[bool, dict]:
        n = df.count()
        return n >= min_rows, {"rows": n, "min_rows": min_rows}
    return run


def referential_integrity(fk_col: str, parent: DataFrame, parent_col: str) -> Check:
    def run(df: DataFrame) -> tuple[bool, dict]:
        pcol = f"__parent_{parent_col}"
        orphans = (
            df.select(fk_col)
            .where(F.col(fk_col).isNotNull())
            .join(parent.select(F.col(parent_col).alias(pcol)),
                  F.col(fk_col) == F.col(pcol), "left_anti")
            .count()
        )
        return orphans == 0, {"orphans": orphans}
    return run


def value_range(col: str, lo: float, hi: float) -> Check:
    def run(df: DataFrame) -> tuple[bool, dict]:
        n = df.where(
            F.col(col).isNotNull() & ((F.col(col) < lo) | (F.col(col) > hi))
        ).count()
        return n == 0, {"out_of_range": n, "bounds": (lo, hi)}
    return run


def completeness(col: str, min_ratio: float = 0.95) -> Check:
    """Gold completeness (gold_analytics_component.py:165): non-null
    ratio per column must meet the threshold."""
    def run(df: DataFrame) -> tuple[bool, dict]:
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.count(col).alias("nn"),
        ).collect()[0]
        ratio = (row.nn / row.n) if row.n else 1.0
        return ratio >= min_ratio, {"non_null_ratio": ratio}
    return run


def freshness(ts_col: str, max_age_hours: float, now: dt.datetime | None = None) -> Check:
    """Bronze freshness (s3_data_landing_component.py:165): newest
    row must be younger than the SLA."""
    def run(df: DataFrame) -> tuple[bool, dict]:
        latest = df.agg(F.max(ts_col).alias("m")).collect()[0].m
        if latest is None:
            return False, {"reason": "empty"}
        ref = now or dt.datetime.now()
        age = (ref - latest).total_seconds() / 3600.0
        return age <= max_age_hours, {"age_hours": age}
    return run
