"""Partition-range backfill runner.

Reference parity: Dagster's partitioned backfills — the reference's
schedules re-materialize whole assets, and a real deployment backfills
date ranges slice by slice. Here a backfill materializes ONE slice at
a time through the managed-table MERGE path, so each slice costs
O(slice + overlapping files): the slice predicate pushes into the
source scan, and with the table partitioned on a column inside the
merge keys, the MERGE prunes every other partition from the manifest
before a single footer is read. A failed slice leaves previous
slices' commits intact (each slice is its own table version), so the
backfill resumes where it stopped — the same
commit-per-slice discipline Delta/Iceberg backfills use.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import TableCatalog


def backfill(
    spark: SparkSession,
    sf_dir: str,
    catalog: TableCatalog,
    *,
    table: str,
    fn: Callable[[SparkSession, str], DataFrame],
    slice_col: str,
    slices: list[tuple],
    keys: list[str],
    partition_by: list[str] | None = None,
) -> list[dict]:
    """Materialize ``fn``'s output into ``table`` one half-open
    ``[lo, hi)`` slice of ``slice_col`` at a time. The first slice
    bootstraps the table (with ``partition_by`` if given); later
    slices MERGE on ``keys``. Returns per-slice commit records.

    For partition-pruned backfills, include the partition transform's
    source column in ``keys`` (sound because key equality then pins
    the partition — the Delta rule)."""
    t = catalog.table(table)
    out: list[dict] = []
    for lo, hi in slices:
        sliced = fn(spark, sf_dir).where(
            (F.col(slice_col) >= lo) & (F.col(slice_col) < hi)
        )
        if not t.exists():
            version = t.write(sliced, operation=f"backfill[{lo},{hi})",
                              partition_by=partition_by)
        else:
            version = t.merge(sliced, keys=keys)
        out.append({"slice": (lo, hi), "version": version})
    return out
