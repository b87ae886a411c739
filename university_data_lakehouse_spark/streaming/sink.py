"""Streaming MERGE sink: micro-batch upserts into a managed table.

The standard public Delta pattern for streaming upserts: each
micro-batch runs a keyed MERGE inside ``foreachBatch``, so the sink
gets update semantics a plain file sink cannot express (file sinks
are append-only). Effective exactly-once comes from the combination
the pattern relies on publicly: the streaming checkpoint replays a
failed batch, and re-merging the same keys is idempotent (same rows
upserted again), while the table layer's OCC commit keeps concurrent
writers from interleaving half-applied snapshots.

Reference parity: this is the sensor-driven re-materialization of
``s3_data_landing_component.py`` fused with the Iceberg table write
of ``trino_iceberg_transform_component.py:116-129`` into one
incremental path — no full re-CTAS per tick.

Scale notes: each micro-batch MERGE shuffles only (batch ⋈ touched
files) thanks to footer-stats/partition pruning in the table layer;
``availableNow`` bounds a tick; ``maxFilesPerTrigger`` on the source
bounds a batch.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..tables.format import ManagedTable


def merge_into_table(
    stream_df: DataFrame,
    table: ManagedTable,
    keys: list[str],
    checkpoint_dir: str,
    prepare: Callable[[DataFrame], DataFrame] | None = None,
    available_now: bool = True,
    expectations: tuple[tuple[str, str, str], ...] = (),
    quarantine: ManagedTable | None = None,
) -> StreamingQuery:
    """Upsert every micro-batch into ``table`` on ``keys``.

    ``prepare`` runs on each batch BEFORE the merge — the place to
    collapse intra-batch duplicates to the latest row per key (a
    landing replay can put the same key in one batch twice; MERGE
    semantics insert one row per source duplicate, so the caller
    chooses the collapse rule, e.g. max-by-timestamp). First batch
    against a never-materialized table bootstraps with a full write
    (same rule as plans/medallion.py).

    ``expectations`` are the same (name, predicate, action) row-level
    policies the asset graph runs (DLT parity), applied per
    micro-batch: "drop" rows never reach the MERGE — with a
    ``quarantine`` table they append there (tagged with the violated
    expectation) instead of vanishing; "fail" raises inside the batch,
    which fails the streaming query and leaves the checkpoint ready
    to replay the batch after the upstream fix; "warn" is a no-op in
    the streaming path (no result object to carry counts).

    Quarantined rows additionally carry ``_quarantine_seq`` — the
    quarantine table's commit version at append time (monotone over
    the table's lifetime, unlike foreachBatch's batch_id which
    restarts with a new checkpoint) — so "the latest quarantine row
    per doc" is a TEMPORAL fact downstream
    (``plans.corpus.release_from_quarantine`` maxes on this stamp),
    not a lexicographic accident of the payload columns."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    def handle(batch_df: DataFrame, _batch_id: int) -> None:
        if prepare is not None:
            batch_df = prepare(batch_df)
        for name, pred, action in expectations:
            ok = F.coalesce(F.expr(pred), F.lit(True))
            if action == "fail":
                n_bad = batch_df.where(~ok).limit(1).count()
                if n_bad:
                    raise ValueError(
                        f"expectation {name!r} ({pred}) violated in batch")
            elif action == "drop":
                if quarantine is not None:
                    bad = batch_df.where(~ok).withColumn(
                        "_violated", F.lit(name))
                    if not bad.isEmpty():
                        if quarantine.exists():
                            seq = quarantine.latest_version() + 1
                            bad = bad.withColumn(
                                "_quarantine_seq",
                                F.lit(seq).cast("long"))
                            quarantine.write(bad, mode="append")
                        else:
                            bad = bad.withColumn(
                                "_quarantine_seq",
                                F.lit(1).cast("long"))
                            quarantine.write(bad, operation="quarantine")
                batch_df = batch_df.where(ok)
        if batch_df.isEmpty():
            return
        if not table.exists():
            table.write(batch_df, operation="bootstrap")
        else:
            table.merge(batch_df, keys=keys)

    writer = (
        stream_df.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
