"""Slowly-changing-dimension Type 2 over managed tables.

The Kimball SCD2 pattern as it is publicly expressed on Delta/Iceberg:
each business key carries a HISTORY of versions
(``effective_from`` / ``effective_to`` / ``is_current``); a source
tick closes the current version of any key whose tracked attributes
changed and appends a new open version, leaving unchanged keys
untouched. The reference's dims (``defs/silver_transforms``) are
Type 1 (overwrite); this adds the history-preserving tier on top of
the same MERGE machinery.

Scale notes: one tick = one keyed MERGE commit — the anti-join ∪
source shape of ``ManagedTable.merge`` — shuffling only
(source ⋈ current slice); closed history rows are never rewritten
again after their closing commit (footer-stats skipping carries their
files forward untouched on later ticks, since merge keys include
``effective_from``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .format import ManagedTable

_META = ("effective_from", "effective_to", "is_current")


def _stamp(df: DataFrame, ts: str) -> DataFrame:
    return df.select(
        "*",
        F.lit(ts).cast("timestamp").alias("effective_from"),
        F.lit(None).cast("timestamp").alias("effective_to"),
        F.lit(True).alias("is_current"),
    )


def scd2_apply(table: ManagedTable, source: DataFrame, keys: list[str],
               tracked: list[str], effective_ts: str) -> int:
    """Apply one SCD2 tick; returns the committed version.

    ``source`` is the latest full attribute row per business key
    (one row per key); ``tracked`` are the columns whose change opens
    a new version; ``effective_ts`` is the tick's effective timestamp
    (passed in, so replays are deterministic). First tick bootstraps
    every key as an open version."""
    spark = source.sparkSession
    if not table.exists():
        return table.write(_stamp(source, effective_ts),
                           operation="scd2_bootstrap")

    current = table.read(spark).where(F.col("is_current"))
    src = source.alias("s")
    cur = current.alias("c")
    on = [F.col(f"s.{k}") == F.col(f"c.{k}") for k in keys]
    joined = src.join(cur, on, "left")
    differs = F.lit(False)
    for t in tracked:
        differs = differs | ~F.col(f"s.{t}").eqNullSafe(F.col(f"c.{t}"))
    is_new = F.col(f"c.{keys[0]}").isNull()

    # keys opening a new version this tick: brand new, or changed
    opening = joined.where(is_new | differs)
    new_rows = _stamp(opening.select(*[F.col(f"s.{c}")
                                       for c in source.columns]),
                      effective_ts)
    closed_rows = (
        opening.where(~is_new)
        .select(
            *[F.col(f"c.{c}") for c in source.columns],
            F.col("c.effective_from").alias("effective_from"),
            F.lit(effective_ts).cast("timestamp").alias("effective_to"),
            F.lit(False).alias("is_current"),
        )
    )
    upsert = closed_rows.unionByName(new_rows)
    if upsert.isEmpty():
        return table.latest_version()   # nothing changed this tick
    # (keys, effective_from) uniquely identifies a VERSION: the close
    # replaces the old open row in place, the insert adds the new one
    return table.merge(upsert, keys=[*keys, "effective_from"])


def scd2_current(spark: SparkSession, table: ManagedTable) -> DataFrame:
    return table.read(spark).where(F.col("is_current"))


def scd2_as_of(spark: SparkSession, table: ManagedTable,
               ts: str) -> DataFrame:
    """The dimension as it stood at ``ts`` — the point-in-time join
    side for late-arriving facts."""
    t = F.lit(ts).cast("timestamp")
    return table.read(spark).where(
        (F.col("effective_from") <= t)
        & (F.col("effective_to").isNull() | (F.col("effective_to") > t))
    )
