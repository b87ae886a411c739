"""Join-side sizing policy.

At 100 TB an unconditional ``F.broadcast(dim)`` hint is the most
dangerous line in a pipeline: a table that is dim-sized at test scale
(customer at sf0.1: 15k rows) is fact-scale in production (~10^10
rows at sf1e5), and a forced broadcast OOMs the driver and every
executor. Two tiers:

- ``broadcast_bounded(df)`` — for relations whose cardinality is
  bounded by SCHEMA SEMANTICS rather than data volume (nation <= 25
  rows, region <= 5, one-row scalar aggregates, #years x #priorities
  budget grids). The always-hint is safe at any scale factor.
- ``maybe_broadcast(df)`` — for data-proportional tables (customer,
  part, supplier): hint broadcast only when the optimizer's own size
  estimate for the (filtered, pruned) plan fits under
  ``spark.sql.autoBroadcastJoinThreshold``; otherwise return the
  frame unhinted and let AQE pick the runtime join strategy from
  actual shuffle statistics.

``maybe_broadcast`` reads the estimate from the optimized logical
plan, so upstream filters/projections are accounted for — a
segment-filtered customer slice can still broadcast even when the
full table cannot.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_UNITS = {"b": 1, "k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}


def parse_bytes(conf_value: str) -> int:
    """Parse Spark byte-conf strings: '10485760', '10MB', '1g', '-1'."""
    m = re.fullmatch(r"\s*(-?\d+)\s*([a-zA-Z]*)\s*", str(conf_value))
    if not m:
        raise ValueError(f"unparseable byte conf {conf_value!r}")
    n = int(m.group(1))
    unit = m.group(2).lower().rstrip("b") or "b"
    return n * _UNITS.get(unit[:1], 1)


def plan_size_estimate(df: DataFrame) -> int:
    """Catalyst's sizeInBytes estimate for the optimized plan."""
    stats = df._jdf.queryExecution().optimizedPlan().stats()
    return int(stats.sizeInBytes())


def broadcast_bounded(df: DataFrame) -> DataFrame:
    """Broadcast hint for schema-bounded relations only (see module
    docstring). Use for nation/region/1-row aggregates — never for
    anything whose row count grows with data volume."""
    return F.broadcast(df)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-buster for shuffle joins on hot keys (SURVEY §6).

    The big side gets a deterministic pseudo-random salt in
    [0, n_salts); the small side is replicated once per salt value.
    A key that would land its entire partition on one reducer is
    split across n_salts reducers, at the cost of shuffling the
    small side n_salts times — use when AQE's skew-join (which
    splits oversized partitions post-hoc) isn't available or the
    skew is in an aggregation-feeding join. Result is identical to
    the unsalted join (pytest-pinned) for the supported join types
    only — inner/left/left_semi/left_anti. For right/full joins the
    small side's unmatched rows would appear once per salt (the
    explode replicates them), so those types are refused.

    The salt hashes the whole row (all of the big side's columns),
    so duplicate rows of one hot key still spread: two identical
    rows share a salt, but real skew comes from many distinct rows
    per key, which fan out uniformly.
    """
    safe = {"inner", "left", "leftouter", "semi", "leftsemi",
            "anti", "leftanti"}
    if how.lower().replace("_", "") not in safe:
        raise ValueError(
            f"salted_join(how={how!r}): only inner/left/left_semi/left_anti "
            "are result-identical to the unsalted join (unmatched small-side "
            "rows replicate once per salt under right/full)"
        )
    salts = F.array(*[F.lit(i) for i in range(n_salts)])
    big_s = big.withColumn(
        "__salt", F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    )
    small_s = small.withColumn("__salt", F.explode(salts))
    return big_s.join(small_s, [*on, "__salt"], how).drop("__salt")


def maybe_broadcast(df: DataFrame, max_bytes: int | None = None) -> DataFrame:
    """Size-gated broadcast hint for data-proportional tables.

    Hints broadcast iff the optimizer's size estimate for ``df`` is
    within ``max_bytes`` (default: the session's
    autoBroadcastJoinThreshold). Above the gate the frame is returned
    unhinted so AQE can choose from runtime shuffle stats.
    """
    if max_bytes is None:
        conf = df.sparkSession.conf.get(
            "spark.sql.autoBroadcastJoinThreshold", "10485760"
        )
        max_bytes = parse_bytes(conf or "10485760")
    if max_bytes <= 0:  # threshold disabled => never hint
        return df
    if plan_size_estimate(df) <= max_bytes:
        return F.broadcast(df)
    return df
